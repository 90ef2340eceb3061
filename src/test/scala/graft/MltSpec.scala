package graft

import graft.analysis.AnalyzerConfig
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{MoreLikeThis, Searcher}
import org.scalatest.funsuite.AnyFunSuite

class MltSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val docs = Seq(
    ("m-01", "rare rare shared alpha"),
    ("m-02", "rare shared beta"),
    ("m-03", "shared common common beta"),
    ("m-04", "common alpha beta"),
    ("m-05", "unrelated tokens only"))

  private lazy val (searcher, corpusDf) = {
    import spark.implicits._
    val df = docs.toDF("docno", "content")
    val idx = IndexBuilder.build(df, TestSpark.tmpDir("mlt"),
      IndexConfig(analyzer = AnalyzerConfig(), groupShift = 4, mergeShift = 1))
    (new Searcher(idx), df)
  }

  test("interesting terms rank by tf*(1+ln(N/(df+1))), ties by term asc") {
    val got = MoreLikeThis.interestingTerms(searcher, corpusDf, "m-01", 10)
    val n = docs.size.toDouble
    val dfMap = docs.flatMap(_._2.split(" ").distinct)
      .groupBy(identity).view.mapValues(_.size).toMap
    val want = docs.find(_._1 == "m-01").get._2.split(" ")
      .groupBy(identity).toSeq
      .map { case (t, occ) => t -> occ.length * (1.0 + math.log(n / (dfMap(t) + 1.0))) }
      .sortBy { case (t, s) => (-s, t) }
    assert(got == want)
    // tf=2 rare beats tf=1 rarities; shared(df=3) beats nothing rarer
    assert(got.head._1 == "rare")
    // truncation keeps the prefix
    assert(MoreLikeThis.interestingTerms(searcher, corpusDf, "m-01", 2) ==
      want.take(2))
  }

  test("search excludes the source doc and ranks sharers first") {
    val hits = MoreLikeThis.search(searcher, corpusDf, "q", "m-01", 3, 10)
      .collect().sortBy(_.rank)
    assert(hits.nonEmpty)
    assert(!hits.exists(_.docno == "m-01"), "source doc must be excluded")
    // m-02 shares rare+shared — the strongest overlap
    assert(hits.head.docno == "m-02")
    // m-05 shares no term with m-01's query
    assert(!hits.exists(_.docno == "m-05"))
    // a docno absent from the corpus yields an empty result, not a crash
    assert(MoreLikeThis.search(searcher, corpusDf, "q", "nope", 3, 10)
      .collect().isEmpty)
  }
}
