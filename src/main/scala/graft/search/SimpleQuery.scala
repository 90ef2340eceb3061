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
  *   - `"…"` phrases are kept as phrase clauses: exact adjacency matching
  *     against a positions-enabled index (`IndexConfig.indexPositions`),
  *     degrading to required co-occurrence when the index stores no
  *     positions (Searcher.searchQuery documents the fallback);
  *   - `*` prefix and `~N` fuzzy are rejected as unsupported.
  */
final case class SimpleQuery(
    positive: Seq[String],  // raw positive loose tokens, in query order
    negative: Seq[String],  // raw negated tokens (without the '-')
    phrases: Seq[String],   // raw quoted phrase texts, in query order
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
    val phr = Seq.newBuilder[String]
    var conj = false
    // split out quoted phrases first
    val phrase = """"([^"]*)"""".r
    var rest = text
    phrase.findAllMatchIn(text).foreach { m =>
      val p = m.group(1).trim
      if (p.nonEmpty) phr += p
    }
    rest = phrase.replaceAllIn(rest, " ")
    rest.split("\\s+").filter(_.nonEmpty).foreach { tok0 =>
      // infix operators without spaces: a+b, a|b
      val parts: Seq[String] =
        if (tok0.contains('+') && tok0.length > 1) { conj = true; tok0.split("\\+").toSeq }
        else if (tok0.contains('|') && tok0.length > 1) tok0.split("\\|").toSeq
        else Seq(tok0)
      parts.filter(_.nonEmpty).foreach { tok =>
        if (tok == "+") conj = true
        else if (tok == "|" || tok == "-") () // bare operators
        else if (tok.endsWith("*") || tok.matches(".*~\\d*$"))
          throw new IllegalArgumentException(
            s"unsupported SimpleQueryParser operator in '$tok' (prefix/fuzzy need index automata)")
        else if (tok.startsWith("-")) neg += tok.substring(1)
        else pos += tok
      }
    }
    SimpleQuery(pos.result(), neg.result(), phr.result(), conj)
  }
}
