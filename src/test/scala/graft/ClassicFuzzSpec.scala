package graft

import graft.analysis.ClassicLikeTokenizer
import org.scalatest.funsuite.AnyFunSuite

import java.util.regex.Pattern
import scala.util.Random

/** Fuzz-lock of ClassicLikeTokenizer against a brute-force scanner built
  * straight from the published ClassicTokenizerImpl.jflex grammar rules:
  * per rule, the longest matching PREFIX at each position is found by
  * trying every end offset (O(n²), no reliance on Java regex alternation
  * semantics). Two scan disciplines are compared:
  *
  *  - `scanFirst`: first rule (grammar order) with any match wins, taking
  *    its longest prefix — the engine's documented contract (leftmost-
  *    first, required by the RE2 oracle replay).
  *  - `scanLongest`: longest match over ALL rules wins (ties → earlier
  *    rule) — the JFlex scanner's actual discipline.
  *
  * The battery asserts the engine ≡ scanFirst everywhere, and ≡ scanLongest
  * (true JFlex parity) on the digit/dot-free sub-alphabet where the two
  * disciplines provably coincide. The remaining first-vs-longest
  * divergence (NUM/HOST/ACRONYM overlaps) is locked on known examples —
  * the deviation documented on the tokenizer.
  */
class ClassicFuzzSpec extends AnyFunSuite {

  // grammar transcription (rule order = JFlex spec order adjusted to the
  // engine's documented first-match alternation order)
  private val cjR =
    "\\u3100-\\u312f\\u3040-\\u309f\\u30a0-\\u30ff\\u31f0-\\u31ff" +
      "\\u3300-\\u337f\\u3400-\\u4dbf\\u4e00-\\u9fff\\uf900-\\ufaff\\uff65-\\uff9f"
  private val L = s"[\\p{L}&&[^$cjR]]"
  private val D = "\\p{Nd}"
  private val AN = s"(?:$L|$D)"
  private val HASDIGIT = s"$AN*$D$AN*"
  private val P = "[_\\-/.,]"
  // the engine's documented NUM contract: the factored closed form (a
  // superset of the grammar union — deviation 3 on the tokenizer)
  private val NumFactored =
    s"(?:$AN+$P)?$HASDIGIT(?:(?:$P$AN+)?$P$HASDIGIT)*(?:$P$AN+)?"
  // the grammar's SIX explicit NUM alternatives, for the superset lock
  private val NumUnion: Pattern = Pattern.compile(Seq(
    s"$AN+$P$HASDIGIT",
    s"$HASDIGIT$P$AN+",
    s"$AN+(?:$P$HASDIGIT$P$AN+)+",
    s"$HASDIGIT(?:$P$AN+$P$HASDIGIT)+",
    s"$AN+$P$HASDIGIT(?:$P$AN+$P$HASDIGIT)+",
    s"$HASDIGIT$P$AN+(?:$P$HASDIGIT$P$AN+)+"
  ).mkString("(?:", "|", ")"))
  private val rules: Seq[Pattern] = Seq(
    s"$AN+(?:[._\\-]$AN+)*@$AN+(?:[.\\-]$AN+)+", // EMAIL
    s"$L\\.(?:$L\\.)+", // ACRONYM
    NumFactored,
    s"$AN+(?:\\.$AN+)+", // HOST
    s"$L+[&@]$L+", // COMPANY
    s"$L+(?:'$L+)+", // APOSTROPHE
    s"$AN+", // ALPHANUM
    s"[$cjR]" // CJ (one char per token)
  ).map(Pattern.compile)

  private def longestPrefix(p: Pattern, s: String, i: Int): Int = {
    var j = s.length
    while (j > i) {
      if (p.matcher(s.substring(i, j)).matches()) return j
      j -= 1
    }
    -1
  }

  private def scan(s: String, longest: Boolean): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < s.length) {
      var bestEnd = -1
      var done = false
      for (p <- rules if !done) {
        val e = longestPrefix(p, s, i)
        if (e > bestEnd) bestEnd = e
        if (!longest && bestEnd > 0) done = true // first rule that matches
      }
      if (bestEnd < 0) i += 1
      else { out += s.substring(i, bestEnd); i = bestEnd }
    }
    out.result()
  }

  private def engine(s: String): Seq[String] =
    new ClassicLikeTokenizer().tokenize(s).toSeq

  private val FullAlphabet: IndexedSeq[Char] =
    ("abcz".toSeq ++ "012".toSeq ++ ".,-_/'&@ ".toSeq ++
      "éñЯ한국어".toSeq ++ "漢字の本ヵ".toSeq).toIndexedSeq

  test("fuzz: engine ≡ brute-force first-match grammar scan (mixed scripts)") {
    val rnd = new Random(11)
    for (trial <- 0 until 1500) {
      val n = rnd.nextInt(40)
      val s = (0 until n).map(_ => FullAlphabet(rnd.nextInt(FullAlphabet.size))).mkString
      assert(engine(s) == scan(s, longest = false), s"trial $trial input=$s")
    }
  }

  test("fuzz: true JFlex longest-match parity on the digit/dot-free alphabet") {
    // without digits and dots, NUM/HOST/ACRONYM/EMAIL can't fire and
    // first-match ≡ longest-match: the engine IS the JFlex scanner there
    val alpha = ("abcz".toSeq ++ "'&@ ".toSeq ++ "éñЯ한국어漢字の".toSeq).toIndexedSeq
    val rnd = new Random(13)
    for (trial <- 0 until 1500) {
      val n = rnd.nextInt(40)
      val s = (0 until n).map(_ => alpha(rnd.nextInt(alpha.size))).mkString
      val e = engine(s)
      assert(e == scan(s, longest = true), s"trial $trial input=$s")
      assert(e == scan(s, longest = false), s"trial $trial input=$s")
    }
  }

  test("locked deviation: first-match splits what JFlex longest-match keeps") {
    assert(engine("a.b2.c.d") == Seq("a.b2.c", "d"))
    assert(scan("a.b2.c.d", longest = true) == Seq("a.b2.c.d"))
    // and the oracle-locked enrichment fixture depends on exactly that
  }

  test("locked deviation: factored NUM is a strict superset of the grammar union") {
    // non-alternating digit parity [a, b1, 0, cd]: no phase assignment of
    // the six alternatives covers all four segments, the factored form does
    assert(engine("a.b1-0.cd") == Seq("a.b1-0.cd"))
    assert(longestPrefix(NumUnion, "a.b1-0.cd", 0) == "a.b1-0".length)
    // superset direction holds everywhere: the union never out-matches the
    // factored form at any position of any input
    val rnd = new Random(17)
    val alphabet = "ab01.,-_/ ".toIndexedSeq
    for (_ <- 0 until 400) {
      val s = (0 until rnd.nextInt(24))
        .map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
      val factored = rules(2)
      for (i <- 0 until s.length)
        assert(longestPrefix(NumUnion, s, i) <= longestPrefix(factored, s, i)
          || longestPrefix(factored, s, i) < 0,
          s"input=$s i=$i")
    }
  }

  test("CJ codepoints tokenize one per char; other scripts stay whole") {
    assert(engine("漢字の本") == Seq("漢", "字", "の", "本"))
    assert(engine("한국어 café naïve Яб") ==
      Seq("한국어", "café", "naïve", "Яб")) // Hangul/Latin-1/Cyrillic words
    assert(engine("abc漢def") == Seq("abc", "漢", "def")) // CJ breaks words
  }

  test("tokens over 255 chars are discarded, not split (ClassicTokenizer skip)") {
    val long256 = "a" * 256
    val ok255 = "b" * 255
    assert(engine(s"$long256 $ok255 tail") == Seq(ok255, "tail"))
  }
}
