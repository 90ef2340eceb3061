package graft.search

/** A parsed subset of the reference's `SimpleQueryParser` syntax
  * (`BatchSearch.java:189-190,252`): `+` AND, `|` OR, `-` NOT, `"…"` phrase.
  *
  * Supported flat interpretation (documented deviation from Lucene's full
  * recursive grammar):
  *   - whitespace / `|` between tokens → SHOULD (bag-of-words OR), the
  *     reference default operator;
  *   - any `+` between tokens → the whole query becomes conjunctive (every
  *     positive clause required) — Lucene's AND for the flat
  *     no-parentheses queries the reference's batch driver actually sees;
  *   - a leading `-` negates its token: documents containing the term are
  *     excluded BEFORE ranking (MUST_NOT — they never enter the collector);
  *   - `"…"` / `"…"~N` phrases are kept as phrase clauses with slop N
  *     (0 when absent): positional matching against a positions-enabled
  *     index (`IndexConfig.indexPositions`), degrading to required
  *     co-occurrence when the index stores no positions
  *     (Searcher.searchQuery documents the fallback);
  *   - `tok*` prefix and `tok~N` fuzzy become term-EXPANSION clauses:
  *     matching vocabulary terms come from a vocabulary-projection scan;
  *     prefix uses Lucene's CONSTANT_SCORE rewrite, fuzzy the top-terms
  *     blended-frequency rewrite (see Searcher).
  */
final case class SimpleQuery(
    positive: Seq[String],  // raw positive loose tokens, in query order
    negative: Seq[String],  // raw negated tokens (without the '-')
    phrases: Seq[(String, Int)], // raw quoted phrase texts with slop, in query order
    prefixes: Seq[String],  // raw prefix tokens (without the '*')
    fuzzies: Seq[(String, Int)], // raw fuzzy tokens with max edit distance
    conjunctive: Boolean)   // true if any '+' operator appeared

object SimpleQuery {

  /** Parse query text into the flat clause model. Raw tokens still need
    * analysis (lowercase/stop/stem) — callers run them through the index's
    * analyzer, exactly like `SimpleQueryParser(analyzer, field)` analyzes
    * each token before building TermQuerys.
    */
  def parse(text: String): SimpleQuery = {
    val pos = Seq.newBuilder[String]
    val neg = Seq.newBuilder[String]
    val phr = Seq.newBuilder[(String, Int)]
    val pre = Seq.newBuilder[String]
    val fuz = Seq.newBuilder[(String, Int)]
    var conj = false
    // split out quoted phrases (with optional `~N` slop suffix —
    // SimpleQueryParser's NEAR operator, available to the reference at
    // `BatchSearch.java:252`) first
    val phrase = """"([^"]*)"(~(\d+))?""".r
    var rest = text
    phrase.findAllMatchIn(text).foreach { m =>
      val p = m.group(1).trim
      // n.take(9) keeps absurd digit runs from overflowing toInt
      val slop = Option(m.group(3)).map(_.take(9).toInt).getOrElse(0)
      if (p.nonEmpty) phr += ((p, slop))
    }
    rest = phrase.replaceAllIn(rest, " ")
    val fuzzy = """^(.+?)~(\d*)$""".r
    rest.split("\\s+").filter(_.nonEmpty).foreach { tok0 =>
      // infix operators without spaces: a+b, a|b, a|b+c (split on BOTH
      // operator chars at once; any '+' makes the query conjunctive)
      val parts: Seq[String] =
        if (tok0.length > 1 && (tok0.contains('+') || tok0.contains('|'))) {
          if (tok0.contains('+')) conj = true
          tok0.split("[+|]").toSeq
        } else Seq(tok0)
      parts.filter(_.nonEmpty).foreach { tok =>
        if (tok == "+") conj = true
        else if (tok == "|" || tok == "-") () // bare operators
        else {
          val negFlag = tok.startsWith("-") && tok.length > 1
          val t = if (negFlag) tok.substring(1) else tok
          if (t.endsWith("*") && t.length > 1) {
            require(!negFlag, s"negated prefix is not supported: $tok")
            pre += t.dropRight(1)
          } else t match {
            case fuzzy(base, n) if base.nonEmpty =>
              require(!negFlag, s"negated fuzzy is not supported: $tok")
              // SimpleQueryParser: bare ~ means maxEdits = 2; clamp to 2
              // (n.take(9) keeps absurd digit runs from overflowing toInt)
              fuz += ((base, if (n.isEmpty) 2 else math.min(n.take(9).toInt, 2)))
            case _ =>
              if (negFlag) neg += t else pos += t
          }
        }
      }
    }
    SimpleQuery(pos.result(), neg.result(), phr.result(), pre.result(),
      fuz.result(), conj)
  }
}
