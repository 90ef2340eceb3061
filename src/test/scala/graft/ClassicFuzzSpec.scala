package graft

import graft.analysis.ClassicLikeTokenizer
import org.scalatest.funsuite.AnyFunSuite

import java.util.regex.Pattern
import scala.util.Random

/** Fuzz-PROOF of ClassicLikeTokenizer against a brute-force scanner built
  * straight from the published ClassicTokenizerImpl.jflex grammar: per
  * rule, the longest matching PREFIX at each position is found by trying
  * every end offset with `matches()` (O(n²), no reliance on Java regex
  * alternation or greediness), the longest across ALL rules wins with
  * ties broken by rule listing order, ACRONYM_DEP sheds its trailing dot
  * (Lucene's post-match trim), and raw matches over the length cap are
  * discarded — the JFlex scanner's exact discipline, including the
  * LETTER-excludes-KOREAN class split (Hangul is ALPHANUM-only, so it
  * never joins apostrophe/acronym/company forms).
  *
  * The battery asserts the engine ≡ this brute scanner everywhere: the
  * three deviations previous rounds documented (leftmost-first
  * alternation, no ACRONYM_DEP, factored-superset NUM) are gone.
  *
  * A second battery validates the DuckDB oracle's construction
  * (SparkEntry.classicWalkCte): anchored GREEDY matching of each
  * individual oracle rule pattern equals that rule's brute longest
  * prefix, and max(numOdd, numEven) equals the brute longest over the
  * grammar's six-alternative NUM union — together these make the
  * oracle's per-rule-max recursive CTE a faithful longest-match scanner
  * (RE2 and java.util.regex share leftmost-greedy semantics on these
  * backreference-free patterns).
  */
class ClassicFuzzSpec extends AnyFunSuite {

  // --- brute JFlex-semantics scanner, transcribed from the grammar -------
  private val cjR =
    "\\u3040-\\u312f\\u31f0-\\u31ff\\u3300-\\u337f\\u3400-\\u4dbf" +
      "\\u4e00-\\u9fff\\uf900-\\ufaff\\uff65-\\uff9f"
  private val koR = "\\uac00-\\ud7af\\u1100-\\u11ff"
  private val L = s"[\\p{L}&&[^$cjR$koR]]"
  private val K = s"[$koR]"
  private val D = "\\p{Nd}"
  private val AN = s"(?:$L|$D|$K)"
  private val HD = s"$AN*$D$AN*"
  private val P = "[_\\-/.,]"
  // the grammar's SIX explicit NUM alternatives (alternation order is
  // irrelevant to the brute scan, which tests full `matches()` per length)
  private val NumUnion =
    Seq(
      s"$AN+$P$HD",
      s"$HD$P$AN+",
      s"$AN+(?:$P$HD$P$AN+)+",
      s"$HD(?:$P$AN+$P$HD)+",
      s"$AN+$P$HD(?:$P$AN+$P$HD)+",
      s"$HD$P$AN+(?:$P$HD$P$AN+)+"
    ).mkString("(?:", "|", ")")

  private val DepIdx = 7 // ACRONYM_DEP's index in `rules` below
  private val rules: IndexedSeq[Pattern] = IndexedSeq(
    s"$AN+", // ALPHANUM
    s"$L+(?:'$L+)+", // APOSTROPHE
    s"$L\\.(?:$L\\.)+", // ACRONYM
    s"$L+[&@]$L+", // COMPANY
    s"$AN+(?:[._\\-]$AN+)*@$AN+(?:[.\\-]$AN+)+", // EMAIL
    s"$AN+(?:\\.$AN+)+", // HOST
    NumUnion, // NUM
    s"$AN+\\.(?:$AN+\\.)+" // ACRONYM_DEP (trailing dot, trimmed on win)
  ).map(Pattern.compile)
  private val CjChar = Pattern.compile(s"[$cjR]")

  private def longestPrefix(p: Pattern, s: String, i: Int): Int = {
    var j = s.length
    while (j > i) {
      if (p.matcher(s.substring(i, j)).matches()) return j
      j -= 1
    }
    -1
  }

  /** Brute JFlex scan: longest across rules, ties to the earlier rule,
    * ACRONYM_DEP trims its final dot, raw matches > maxLen discarded with
    * a skippedPositions gap carried into the next emission's increment
    * (ClassicTokenizer.incrementToken's `skippedPositions + 1`).
    */
  private def scanJflexInc(s: String, maxLen: Int = 255): Seq[(String, Int)] = {
    val out = Seq.newBuilder[(String, Int)]
    var skipped = 0
    var i = 0
    while (i < s.length) {
      if (CjChar.matcher(s.substring(i, i + 1)).matches()) {
        out += ((s.substring(i, i + 1), skipped + 1)); skipped = 0
        i += 1
      } else {
        var bestEnd = -1
        var bestRule = -1
        for (r <- rules.indices) {
          val e = longestPrefix(rules(r), s, i)
          if (e > bestEnd) { bestEnd = e; bestRule = r } // ties: earlier rule
        }
        if (bestEnd < 0) i += 1
        else {
          val raw = bestEnd - i
          val tok =
            if (bestRule == DepIdx) s.substring(i, bestEnd - 1)
            else s.substring(i, bestEnd)
          if (raw <= maxLen) { out += ((tok, skipped + 1)); skipped = 0 }
          else skipped += 1
          i = bestEnd
        }
      }
    }
    out.result()
  }
  private def scanJflex(s: String, maxLen: Int = 255): Seq[String] =
    scanJflexInc(s, maxLen).map(_._1)

  private def engine(s: String): Seq[String] =
    new ClassicLikeTokenizer().tokenize(s).toSeq
  private def engineInc(s: String): Seq[(String, Int)] =
    new ClassicLikeTokenizer().tokenizeWithIncrements(s).toSeq

  test("fuzz: engine ≡ brute JFlex longest-match scan (mixed scripts)") {
    val alphabet = ("abcz".toSeq ++ "012".toSeq ++ ".,-_/'&@ ".toSeq ++
      "éñЯ한국어".toSeq ++ "漢字の本ヵ".toSeq).toIndexedSeq
    val rnd = new Random(11)
    for (trial <- 0 until 2000) {
      val n = rnd.nextInt(40)
      val s = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
      assert(engine(s) == scanJflex(s), s"trial $trial input=$s")
    }
  }

  test("fuzz: engine ≡ brute on the divergence-rich punctuation sub-language") {
    // digits + all five P joiners + '&@ — where NUM/HOST/ACRONYM/EMAIL
    // overlaps live; this is the alphabet that killed leftmost-first
    val alphabet = "ab012.,-_/'&@ ".toIndexedSeq
    val rnd = new Random(13)
    for (trial <- 0 until 4000) {
      val n = rnd.nextInt(28)
      val s = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
      assert(engine(s) == scanJflex(s), s"trial $trial input=$s")
    }
  }

  test("fuzz: position increments ≡ brute skippedPositions under a tiny cap") {
    // maxTokenLen=3 makes over-long discards COMMON, so the gap path is
    // exercised densely, not just at the 255 boundary
    val alphabet = "ab012.,-_/'&@ ".toIndexedSeq
    val rnd = new Random(19)
    for (trial <- 0 until 3000) {
      val n = rnd.nextInt(28)
      val s = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
      assert(new ClassicLikeTokenizer(3).tokenizeWithIncrements(s).toSeq ==
        scanJflexInc(s, 3), s"trial $trial input=$s")
    }
  }

  // --- oracle-construction validation -----------------------------------
  private val oracleRules =
    ClassicLikeTokenizer.rules("[a-z]", "[0-9]", "[a-z0-9]")
  private val asciiNumUnion = {
    val an = "[a-z0-9]"; val hd = s"$an*[0-9]$an*"; val p = "[_\\-/.,]"
    Pattern.compile(Seq(
      s"$an+$p$hd",
      s"$hd$p$an+",
      s"$an+(?:$p$hd$p$an+)+",
      s"$hd(?:$p$an+$p$hd)+",
      s"$an+$p$hd(?:$p$an+$p$hd)+",
      s"$hd$p$an+(?:$p$hd$p$an+)+"
    ).mkString("(?:", "|", ")"))
  }

  private def greedyAt(p: Pattern, s: String, i: Int): Int = {
    val m = p.matcher(s)
    m.region(i, s.length)
    if (m.lookingAt()) m.end() else -1
  }

  test("oracle rules: anchored greedy ≡ brute longest, and the two " +
    "strict-phase NUM forms max to the six-way union") {
    val pats = oracleRules.ordered.map(Pattern.compile)
    val numOdd = Pattern.compile(oracleRules.numOdd)
    val numEven = Pattern.compile(oracleRules.numEven)
    val alphabet = "ab012.,-_/'&@ ".toIndexedSeq
    val rnd = new Random(17)
    for (trial <- 0 until 3000) {
      val n = rnd.nextInt(24)
      val s = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
      for (i <- 0 until s.length) {
        for (p <- pats)
          assert(greedyAt(p, s, i) == longestPrefix(p, s, i),
            s"trial $trial rule=$p input=$s i=$i")
        val unionBest = longestPrefix(asciiNumUnion, s, i)
        val phaseBest = math.max(greedyAt(numOdd, s, i), greedyAt(numEven, s, i))
        assert(phaseBest == unionBest, s"trial $trial input=$s i=$i")
      }
    }
  }

  // --- locked exemplars of the formerly-deviant forms --------------------
  test("leftmost-longest: digit-bearing multi-label hosts stay whole") {
    assert(engine("a.b2.c.d") == Seq("a.b2.c.d")) // was "a.b2.c" + "d"
    assert(engine("1.2-3") == Seq("1.2-3")) // NUM out-matches HOST's "1.2"
  }

  test("NUM is the exact six-alternative union (strict digit parity)") {
    // [a, b1, 0, cd]: no parity class covers all segments; union longest
    // is the 3-segment prefix — the factored superset kept all four
    assert(engine("a.b1-0.cd") == Seq("a.b1-0", "cd"))
    // [1, a, 2, 4, b]: even parity holds through "1-a-2-4" and dies at b
    assert(engine("1-a-2-4-b") == Seq("1-a-2-4", "b"))
    // alternating forms unchanged
    assert(engine("1,000 2-3-4 12/25/2021 app2.v1,beta x_9") ==
      Seq("1,000", "2-3-4", "12/25/2021", "app2.v1,beta", "x_9"))
  }

  test("ACRONYM_DEP: trailing-dot alnum runs consume the dot, emit without it") {
    assert(engine("wow.com.") == Seq("wow.com"))
    assert(engine("a1.b2. x") == Seq("a1.b2", "x"))
    // the ACRONYM tie goes to ACRONYM: dots kept, including the last
    assert(engine("a.b.c.") == Seq("a.b.c."))
    assert(engine("i.b.m. ok") == Seq("i.b.m.", "ok"))
  }

  test("KOREAN is ALPHANUM-only: whole words, but no ALPHA forms") {
    assert(engine("한국어") == Seq("한국어"))
    assert(engine("a한b") == Seq("a한b")) // mixed ALPHANUM run stays whole
    assert(engine("한'국") == Seq("한", "국")) // no Hangul apostrophe form
    assert(engine("한.국.") == Seq("한.국")) // ACRONYM_DEP (AN-based) fires,
    // ACRONYM (ALPHA-based) cannot
  }

  test("CJ codepoints tokenize one per char; other scripts stay whole") {
    assert(engine("漢字の本") == Seq("漢", "字", "の", "本"))
    assert(engine("café naïve Яб") == Seq("café", "naïve", "Яб"))
    assert(engine("abc漢def") == Seq("abc", "漢", "def"))
  }

  test("tokens over 255 chars are discarded, not split (ClassicTokenizer skip)") {
    val long256 = "a" * 256
    val ok255 = "b" * 255
    assert(engine(s"$long256 $ok255 tail") == Seq(ok255, "tail"))
    // each discard leaves a position gap: increment = skippedPositions + 1
    assert(engineInc(s"$long256 $long256 $ok255 tail $long256 z") ==
      Seq((ok255, 3), ("tail", 1), ("z", 2)))
  }
}
