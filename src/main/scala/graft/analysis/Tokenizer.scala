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

/** Approximation of Lucene's `ClassicTokenizer` (the JFlex grammar behind
  * the reference's `tokenizer: ClassicTokenizer` option,
  * `TrecAnalyzer.java:57-59`): words, NUM forms (numbers with internal
  * `,./-_` punctuation — "1,000", serials), apostrophe forms, acronyms,
  * emails, hosts and company names survive as single tokens; other
  * punctuation splits. Behavior is fixture-locked in AnalyzerSpec; the one
  * known remaining JFlex deviation is documented on the NUM pattern below.
  */
final class ClassicLikeTokenizer extends Tokenizer {
  val name = "classic"
  import ClassicLikeTokenizer.TOKEN
  def tokenize(text: String): Iterator[String] = new Iterator[String] {
    private val m = TOKEN.matcher(text)
    private var found = m.find()
    def hasNext: Boolean = found
    def next(): String = {
      val tok = m.group()
      found = m.find()
      tok
    }
  }
}

object ClassicLikeTokenizer {
  // Ordered alternation (Java regex is leftmost-first):
  //   email | acronym | num | host | company | apostrophe | alphanum
  private val EMAIL = """[A-Za-z0-9]+(?:[._\-][A-Za-z0-9]+)*@[A-Za-z0-9]+(?:[.\-][A-Za-z0-9]+)+"""
  private val HOST = """\p{Alnum}+(?:\.\p{Alnum}+)+"""
  private val ACRONYM = """\p{Alpha}\.(?:\p{Alpha}\.)+"""
  private val COMPANY = """\p{Alpha}+(?:[&@]\p{Alpha}+)+"""
  private val APOSTROPHE = """\p{Alpha}+(?:'\p{Alpha}+)+"""
  private val ALPHANUM = """\p{Alnum}+"""
  // JFlex NUM (the Classic grammar's number forms, e.g. "1,000", "2-3-4",
  // "a-1-b"): alphanumeric segments joined by single P = [_\-/.,] chars
  // where every other segment contains a digit — expressed here as
  // [A P] H ([A P] P H)* [P A] with H = digit-bearing segment, which
  // generates exactly the grammar's six alternatives. Remaining known
  // deviation (Java regex picks the FIRST matching alternative, JFlex the
  // LONGEST rule): a digit-bearing host with 2+ trailing digit-free labels
  // ("a.b2.c.d" → "a.b2.c" + "d" here; JFlex keeps the whole host).
  private val HASDIGIT = """\p{Alnum}*[0-9]\p{Alnum}*"""
  private val P = """[_\-/.,]"""
  private val NUM =
    s"(?:$ALPHANUM$P)?$HASDIGIT(?:(?:$P$ALPHANUM)?$P$HASDIGIT)*(?:$P$ALPHANUM)?"
  private[analysis] val TOKEN: Pattern =
    Pattern.compile(Seq(EMAIL, ACRONYM, NUM, HOST, COMPANY, APOSTROPHE, ALPHANUM).mkString("|"))
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
