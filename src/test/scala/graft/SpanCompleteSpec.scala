package graft

import graft.analysis.AnalyzerConfig
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.Searcher
import org.scalatest.funsuite.AnyFunSuite

/** SpanFirstQuery (term confined to the first N positions, stop gaps
  * preserved) and the completion suggester (prefix → top terms by
  * collection frequency).
  */
class SpanCompleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val corpus = Seq(
    "c-1" -> "alpha beta gamma delta epsilon", // alpha@0
    "c-2" -> "the beta alpha gamma",           // alpha@2 (stop gap at 0)
    "c-3" -> "beta gamma delta epsilon alpha", // alpha@4
    "c-4" -> "beta beta gamma",                // no alpha
    "c-5" -> "alpha alpha beta")               // alpha@0,1

  private lazy val searcher: Searcher = {
    import spark.implicits._
    val dir = TestSpark.tmpDir("spanfirst")
    new Searcher(IndexBuilder.build(corpus.toDF("docno", "content"), dir,
      IndexConfig(analyzer = AnalyzerConfig(stopWords = Set("the", "a")),
        indexPositions = true)))
  }

  test("span-first matches only in-bound occurrences, freq = in-bound count") {
    // end=2: alpha@0 (c-1), alpha@0,1 (c-5, freq 2); c-2's alpha sits at
    // RAW position 2 (the stop gap counts), c-3's at 4 — both out of bound
    val got = searcher.searchSpanFirst(Seq(("f", "alpha", 2)), 10)
      .collect().sortBy(_.rank)
    assert(got.map(_.docno).toSet == Set("c-1", "c-5"))
    // c-5 has freq 2 and the shorter doc: it must outrank c-1
    assert(got.head.docno == "c-5")
  }

  test("span-first honors the stop-gap position convention") {
    // end=3 brings c-2's alpha@2 into bound
    val got = searcher.searchSpanFirst(Seq(("f", "alpha", 3)), 10)
      .collect().map(_.docno).toSet
    assert(got == Set("c-1", "c-2", "c-5"))
  }

  test("span-first batch: independent bounds per qid; unindexed term empty") {
    val got = searcher.searchSpanFirst(
      Seq(("f1", "alpha", 1), ("f2", "beta", 1), ("f3", "zzz", 5)), 10)
      .collect().groupBy(_.qid)
    assert(got("f1").map(_.docno).toSet == Set("c-1", "c-5"))
    assert(got("f2").map(_.docno).toSet == Set("c-3", "c-4"))
    assert(!got.contains("f3"))
  }

  test("complete: prefix candidates ranked by cf desc, term asc") {
    // cfs: beta 6, alpha 5, gamma 4, delta 2, epsilon 2
    val rows = searcher.complete(
        Seq(("q1", "b"), ("q2", "de"), ("q3", "nope")), topN = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ("q1").map(x => (x._2, x._3)).toSeq == Seq(("beta", 6L)))
    assert(byQ("q2").map(x => (x._2, x._3)).toSeq == Seq(("delta", 2L)))
    assert(!byQ.contains("q3"))
    // tie broken by term asc: delta and epsilon tie at cf 2
    val de = searcher.complete(Seq(("q", "d")), 5).collect()
    assert(de.map(_.getString(1)).toSeq == Seq("delta"))
    val all = searcher.complete(Seq(("q", "a")), 2).collect()
    assert(all.map(_.getString(1)).toSeq == Seq("alpha"))
  }
}
