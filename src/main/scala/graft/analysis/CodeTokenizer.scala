package graft.analysis

/** Source-code identifier tokenizer — the analysis shape a code corpus
  * (the north rule's (repo, path, commit, lang, content) table) wants:
  * ASCII identifier runs split at word-delimiter boundaries, modeled on
  * the published defaults of Lucene's WordDelimiterGraphFilter
  * (generateWordParts + splitOnCaseChange + splitOnNumerics, no
  * catenation):
  *
  *  - anything outside `[A-Za-z0-9]` (including `_`) separates;
  *  - camelCase: a lower→Upper transition splits (`fooBar` → foo, Bar);
  *  - an UPPER run followed by Upper+lower splits before its last
  *    capital (`HTTPServer` → HTTP, Server; `XMLHttpRequest` → XML,
  *    Http, Request);
  *  - letter↔digit transitions split both ways (`utf8` → utf, 8;
  *    `2fast` → 2, fast).
  *
  * The scanner is a single forward pass with a 3-char boundary window —
  * no regex, no allocation beyond the emitted substrings. The DuckDB
  * oracle replays it as a chain of four global `regexp_replace` boundary
  * insertions plus a separator collapse (see SparkEntry's CodeSplitSql);
  * CodeTokSpec fuzz-proves this scanner ≡ that regex chain, which is
  * what makes the SQL replay faithful (the four boundary rules are
  * pairwise non-overlapping, so global non-overlapping replacement
  * cannot miss a split point).
  *
  * Case is preserved here — the Analyzer's LowerCaseFilter stage runs
  * downstream, exactly like the reference's chain order.
  */
final class CodeTokenizer extends Tokenizer {
  val name = "code"
  private def isLo(c: Char) = c >= 'a' && c <= 'z'
  private def isUp(c: Char) = c >= 'A' && c <= 'Z'
  private def isDg(c: Char) = c >= '0' && c <= '9'
  private def isId(c: Char) = isLo(c) || isUp(c) || isDg(c)

  def tokenize(text: String): Iterator[String] = new Iterator[String] {
    private var i = 0
    private val n = text.length
    private var tok: String = null
    private def boundary(prev: Char, cur: Char, hasNext: Boolean, nxt: Char): Boolean =
      (isLo(prev) && isUp(cur)) ||
        (isUp(prev) && isUp(cur) && hasNext && isLo(nxt)) ||
        ((isLo(prev) || isUp(prev)) && isDg(cur)) ||
        (isDg(prev) && (isLo(cur) || isUp(cur)))
    private def advance(): Unit = {
      tok = null
      while (i < n && !isId(text.charAt(i))) i += 1
      if (i >= n) return
      val start = i
      i += 1
      while (i < n && isId(text.charAt(i)) &&
             !boundary(text.charAt(i - 1), text.charAt(i),
               i + 1 < n && isId(text.charAt(i + 1)),
               if (i + 1 < n) text.charAt(i + 1) else ' ')) i += 1
      tok = text.substring(start, i)
    }
    advance()
    def hasNext: Boolean = tok != null
    def next(): String = { val t = tok; advance(); t }
  }
}
