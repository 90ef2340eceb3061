package graft.analysis

import java.util.regex.Pattern

/** Splits field text into raw tokens. The reference plugs tokenizers in by
  * class name (`TrecAnalyzer.java:55-70`), defaulting to whitespace
  * (`LTRSettings.java:20`); we mirror that as a small serializable strategy
  * used inside Dataset transformations.
  */
trait Tokenizer extends Serializable {
  def name: String
  def tokenize(text: String): Iterator[String]
}

/** Whitespace tokenization: maximal runs of non-whitespace characters
  * (Unicode `Character.isWhitespace`), with over-long tokens split at
  * `maxTokenLen` chars — the observable behavior of Lucene's
  * `WhitespaceTokenizer` the reference defaults to.
  */
final class WhitespaceTokenizer(maxTokenLen: Int = 255) extends Tokenizer {
  val name = "whitespace"
  def tokenize(text: String): Iterator[String] = new Iterator[String] {
    private var i = 0
    private val n = text.length
    private def skipWs(): Unit = { while (i < n && Character.isWhitespace(text.charAt(i))) i += 1 }
    skipWs()
    def hasNext: Boolean = i < n
    def next(): String = {
      val start = i
      var len = 0
      while (i < n && len < maxTokenLen && !Character.isWhitespace(text.charAt(i))) { i += 1; len += 1 }
      val tok = text.substring(start, i)
      skipWs()
      tok
    }
  }
}

/** Re-implementation of Lucene's `ClassicTokenizer` (the JFlex grammar in
  * `ClassicTokenizerImpl.jflex` behind the reference's
  * `tokenizer: ClassicTokenizer` option, `TrecAnalyzer.java:57-59`): words,
  * NUM forms (numbers with internal `,./-_` punctuation — "1,000",
  * serials), apostrophe forms, acronyms, emails, hosts and company names
  * survive as single tokens; CJ codepoints tokenize one char at a time
  * (the grammar's CJ rule); letters are full Unicode `\p{L}` minus the CJ
  * ranges (so accented/Cyrillic/Hangul words stay whole); tokens longer
  * than `maxTokenLen` chars are DISCARDED, not split (ClassicTokenizer's
  * `yylength() <= maxTokenLength` skip — unlike WhitespaceTokenizer's
  * chunking). Behavior is fixture-locked in AnalyzerSpec and fuzz-locked
  * against a brute-force grammar scanner in ClassicFuzzSpec.
  *
  * Two documented deviations from the JFlex scanner, both load-bearing for
  * the RE2 oracle replay (q_classic_tok runs the same ordered alternation
  * in DuckDB, whose RE2 has no leftmost-longest mode — see
  * SparkEntry.ClassicSqlPattern):
  *  1. Leftmost-FIRST alternation instead of JFlex leftmost-longest: a
  *     digit-bearing host with 2+ trailing digit-free labels splits
  *     ("a.b2.c.d" → "a.b2.c" + "d"; JFlex keeps the whole host). The
  *     corpus + enrichment gate entry locks this exact behavior.
  *  2. The deprecated ACRONYM_DEP rule (alnum dotted runs with a trailing
  *     dot, kept in Lucene only for pre-3.1 backcompat) is omitted:
  *     "a1.b2." tokenizes as the NUM/HOST prefix without the final dot.
  *  3. NUM is the factored closed form `[A P] H ((P A)? P H)* [P A]`, a
  *     SUPERSET of the grammar's six alternatives: it also joins segment
  *     runs whose digit parity does not alternate ("a.b1-0.cd" stays one
  *     token; JFlex's union stops at "a.b1-0"). Exact within-NUM longest
  *     match is not expressible as an ordered RE2 alternation, and the
  *     factored form agrees with JFlex on every alternating form ("1,000",
  *     "2-3-4", "12/25/2021", serials — the locked fixtures).
  * A fourth, minor: a discarded over-long token leaves no position gap
  * (the Iterator[String] seam carries no positionIncrement signal).
  */
final class ClassicLikeTokenizer(maxTokenLen: Int) extends Tokenizer {
  def this() = this(255) // no-arg ctor: the FQCN reflective seam needs it
  val name = "classic"
  import ClassicLikeTokenizer.{AsciiTOKEN, TOKEN, isAscii}
  def tokenize(text: String): Iterator[String] = new Iterator[String] {
    // two-tier dispatch: on pure-ASCII text the ASCII-specialized
    // compilation of the SAME grammar is ~5× faster than the Unicode
    // property classes (measured; Java's \p{L}&&[^…] intersection costs
    // per char) and provably match-identical there — ASCII letters/digits
    // are inside \p{L}/\p{Nd} and outside the CJ ranges, and ASCII text
    // can't touch the non-ASCII parts of either alternation
    private val m = (if (isAscii(text)) AsciiTOKEN else TOKEN).matcher(text)
    private var tok: String = null
    private def advance(): Unit = {
      tok = null
      while (tok == null && m.find()) {
        val g = m.group()
        if (g.length <= maxTokenLen) tok = g // over-long: skip, keep going
      }
    }
    advance()
    def hasNext: Boolean = tok != null
    def next(): String = { val t = tok; advance(); t }
  }
}

object ClassicLikeTokenizer {
  // The grammar's CJ ranges (ClassicTokenizerImpl.jflex): CJK ideographs,
  // kana, bopomofo, CJK-compat and halfwidth forms — one token per char
  private[analysis] val CJRanges =
    "\\u3100-\\u312f\\u3040-\\u309f\\u30a0-\\u30ff\\u31f0-\\u31ff" +
    "\\u3300-\\u337f\\u3400-\\u4dbf\\u4e00-\\u9fff\\uf900-\\ufaff\\uff65-\\uff9f"
  /** The ordered alternation (leftmost-FIRST; see class scaladoc,
    * deviation 1) — email | acronym | num | host | company | apostrophe |
    * alphanum | cj — parameterized over the LETTER / DIGIT / ALPHANUM
    * character classes (and an optional CJ class) so ONE grammar builder
    * serves the Unicode compilation, the ASCII fast-path compilation, AND
    * the DuckDB oracle's RE2 replay (SparkEntry.ClassicSqlPattern — RE2
    * has no \uXXXX class syntax, so the oracle passes cj = None; the
    * corpus is verified pure ASCII). COMPANY takes exactly ONE joint, like
    * the grammar's `{ALPHA} ("&"|"@") {ALPHA}` — "at&t&x" is "at&t" +
    * "x". NUM is the factored closed form `[A P] H ((P A)? P H)* [P A]`
    * of the grammar's number forms ("1,000", "2-3-4", "a-1-b"; H =
    * digit-bearing segment, P = [_\-/.,]) — a documented SUPERSET of the
    * six grammar alternatives (class scaladoc, deviation 3).
    */
  private[graft] def grammar(l: String, d: String, an: String,
                             cj: Option[String]): String = {
    val email = s"$an+(?:[._\\-]$an+)*@$an+(?:[.\\-]$an+)+"
    val host = s"$an+(?:\\.$an+)+"
    val acronym = s"$l\\.(?:$l\\.)+"
    val company = s"$l+[&@]$l+"
    val apostrophe = s"$l+(?:'$l+)+"
    val alphanum = s"$an+"
    val hasdigit = s"$an*$d$an*"
    val p = """[_\-/.,]"""
    val num =
      s"(?:$alphanum$p)?$hasdigit(?:(?:$p$alphanum)?$p$hasdigit)*(?:$p$alphanum)?"
    (Seq(email, acronym, num, host, company, apostrophe, alphanum) ++ cj)
      .mkString("|")
  }

  // LETTER = [:letter:] minus CJ; DIGIT = [:digit:] (Unicode Nd)
  private val L = s"[\\p{L}&&[^$CJRanges]]"
  private[analysis] val TOKEN: Pattern =
    Pattern.compile(
      grammar(L, """\p{Nd}""", s"(?:$L|\\p{Nd})", Some(s"[$CJRanges]")))
  // the ASCII compilation omits the CJ branch: ASCII text can't match it
  private[analysis] val AsciiTOKEN: Pattern =
    Pattern.compile(grammar("[a-zA-Z]", "[0-9]", "[a-zA-Z0-9]", None))

  private[analysis] def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) >= 0x80) return false; i += 1 }
    true
  }
}

object Tokenizer {
  /** Registry mirroring the reference's by-name tokenizer selection, with a
    * reflective FQCN fallback (≙ `TrecAnalyzer.java:63-70` Class.forName):
    * any class on the classpath implementing [[Tokenizer]] with a no-arg
    * constructor loads by its fully-qualified name.
    */
  def byName(name: String): Tokenizer = name.toLowerCase match {
    case "whitespace" | "whitespacetokenizer" => new WhitespaceTokenizer()
    case "classic" | "classictokenizer"       => new ClassicLikeTokenizer()
    case _ => Reflective.instance[Tokenizer](name, "tokenizer")
  }
}

/** Shared Class.forName loader for the three extension seams — the engine
  * analog of the reference's reflective plugin loading
  * (`TrecAnalyzer.java:63-70,78-103`, `BatchSearch.java:155-158`).
  */
private[graft] object Reflective {
  def instance[T](name: String, kind: String)(implicit ct: scala.reflect.ClassTag[T]): T =
    try {
      val cls = Class.forName(name)
      val obj =
        try cls.getField("MODULE$").get(null) // Scala object
        catch { case _: NoSuchFieldException =>
          cls.getDeclaredConstructor().newInstance()
        }
      ct.runtimeClass.cast(obj).asInstanceOf[T]
    } catch {
      case e: ClassNotFoundException =>
        throw new IllegalArgumentException(s"unknown $kind: $name", e)
      case e: ClassCastException =>
        throw new IllegalArgumentException(
          s"$kind class $name does not implement ${ct.runtimeClass.getName}", e)
    }
}
