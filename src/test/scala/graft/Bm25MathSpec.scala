package graft

import graft.search._
import org.scalatest.funsuite.AnyFunSuite

/** Formula-level goldens for the scoring math (reference `BM25.java`):
  * Float arithmetic, base-2 idf, N = maxDoc, adl = float division.
  */
class Bm25MathSpec extends AnyFunSuite {
  private val stats = CollStats(maxDoc = 3, sumTotalTermFreq = 8)

  test("collection stats: N float, adl = sumTtf / N in float") {
    assert(stats.N == 3.0f)
    assert(stats.adl == 8.0f / 3.0f) // exactly the float quotient
  }

  test("bm25 idf is base-2: log2(1 + (N - n + 0.5)/(n + 0.5))") {
    val idf = Bm25Scorer.termWeight(2, 0, stats)
    val want = math.log(1.0 + (3.0 - 2.0 + 0.5) / 2.5) / math.log(2.0) // = log2(1.6)
    assert(math.abs(idf - want) < 1e-6, s"idf=$idf want=$want")
    // a term in every doc still gets a positive idf under this formulation
    assert(Bm25Scorer.termWeight(3, 0, stats) > 0.0f)
    // rarer terms score higher
    assert(Bm25Scorer.termWeight(1, 0, stats) > idf)
  }

  test("bm25 score: K = k1(1 - b + b dl/adl); w = (k1+1)tf/(K+tf) idf") {
    val idf = Bm25Scorer.termWeight(2, 0, stats)
    val s = Bm25Scorer.score(tf = 1, dl = 2, idf, stats)
    // hand derivation: dl/adl = 2/(8/3) = 0.75; K = 1.2*(0.25+0.75*0.75)=0.975
    // w = 2.2/(0.975+1) * idf
    val want = 2.2 / 1.975 * (math.log(1.6) / math.log(2.0))
    assert(math.abs(s - want) < 1e-6, s"score=$s want=$want")
    // higher tf → higher score; longer doc → lower score
    assert(Bm25Scorer.score(2, 2, idf, stats) > s)
    assert(Bm25Scorer.score(1, 3, idf, stats) < s)
    // tf saturation: bounded by (k1+1)·idf
    assert(Bm25Scorer.score(1000000, 2, idf, stats) < 2.2f * idf)
  }

  test("bm25 arithmetic is Float (not Double) — rank-identity hazard §7.5") {
    // adl for a case where float and double quotients differ
    val s2 = CollStats(3, 10)
    assert(s2.adl == 10.0f / 3.0f)
    assert(s2.adl.toDouble != 10.0 / 3.0)
    // score type is Float
    val v: Float = Bm25Scorer.score(1, 2, 1.5f, s2)
    assert(v == Bm25Scorer.score(1, 2, 1.5f, s2)) // deterministic
  }

  test("bm25e scores through the lossy byte-encoded doc length") {
    val idf = 1.0f
    // dl=100 packs to the 3-mantissa-bit value 96
    val lossy = Bm25eScorer.score(1, 100, idf, stats)
    val exactAt96 = Bm25Scorer.score(1, 96, idf, stats)
    assert(lossy == exactAt96)
    // small dls are exactly representable → identical to exact BM25
    assert(Bm25eScorer.score(3, 4, idf, stats) == Bm25Scorer.score(3, 4, idf, stats))
  }

  test("tmpl/tmple: constant 1.0 scores, idf = log2(N/n)") {
    assert(TmplScorer.score(7, 100, 2.3f, stats) == 1.0f)
    assert(TmpleScorer.score(7, 100, 2.3f, stats) == 1.0f)
    val w = TmplScorer.termWeight(2, 0, stats)
    assert(math.abs(w - math.log(3.0 / 2.0) / math.log(2.0)) < 1e-6)
  }

  test("scorer registry mirrors the models map") {
    assert(Scorer.byName("bm25") eq Bm25Scorer)
    assert(Scorer.byName("BM25e") eq Bm25eScorer)
    assert(Scorer.byName("tmpl") eq TmplScorer)
    intercept[IllegalArgumentException](Scorer.byName("nope"))
  }
}
