package graft

import graft.analysis.AnalyzerConfig
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.Searcher
import org.scalatest.funsuite.AnyFunSuite

/** Phrase suggester ([[graft.search.Searcher.phraseSuggest]], ≙ ES phrase
  * suggester): the bigram LM — not per-slot term frequency — picks the
  * correction, and the stupid-backoff discount path scores unseen pairs.
  */
class PhraseSuggestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("collocation beats raw frequency; backoff scores unseen pairs") {
    import spark.implicits._
    // cable is the FREQUENT term (cf 7 > table's 2), but "table scan" is
    // the collocation; T = 12 tokens
    val docs = Seq(
      ("p-1", "table scan"), ("p-2", "table scan"),
      ("p-3", "cable cable cable cable cable cable"),
      ("p-4", "cable run"))
    val corpus = docs.toDF("docno", "content")
    val uni = IndexBuilder.build(corpus, TestSpark.tmpDir("psg_uni"),
      IndexConfig(analyzer = AnalyzerConfig()))
    val sh = IndexBuilder.build(corpus, TestSpark.tmpDir("psg_sh"),
      IndexConfig(analyzer = AnalyzerConfig(shingleSize = 2)))
    val got = new Searcher(uni)
      .phraseSuggest(Seq(("s", "tible scan")), sh)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    // brute: score(table scan) = log2(2/12) + log2(2/2) ≈ −2.585
    //        score(cable scan) = log2(7/12) + log2(0.4·2/12) ≈ −4.685
    assert(got.toSeq == Seq(("table scan", 0L), ("cable scan", 1L)))
    // guard rails: one-word input is rejected, non-2-shingle index too
    intercept[IllegalArgumentException] {
      new Searcher(uni).phraseSuggest(Seq(("x", "table")), sh)
    }
    intercept[IllegalArgumentException] {
      new Searcher(uni).phraseSuggest(Seq(("x", "table scan")), uni)
    }
  }
}
