package graft

import graft.analysis.AnalyzerConfig
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Searcher, Topic}
import org.scalatest.funsuite.AnyFunSuite

/** minimumNumberShouldMatch: the msm gate drops docs matching fewer than
  * m distinct clauses, scores stay the plain sum over matches, and ranks
  * close up — verified against the unfiltered run restricted by a brute
  * matched-term count.
  */
class MsmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val corpus = Seq(
    "m-1" -> "alpha beta gamma delta",
    "m-2" -> "alpha beta other words",
    "m-3" -> "alpha only here today",
    "m-4" -> "beta gamma paired tokens",
    "m-5" -> "gamma gamma gamma solo",
    "m-6" -> "nothing relevant at all")

  private lazy val searcher: Searcher = {
    import spark.implicits._
    val dir = TestSpark.tmpDir("msm")
    new Searcher(IndexBuilder.build(corpus.toDF("docno", "content"), dir,
      IndexConfig(analyzer = AnalyzerConfig())))
  }

  private val topic = Topic("t1", "alpha beta gamma")

  test("msm=2 ≡ unfiltered run restricted to docs matching ≥2 terms") {
    val full = searcher.search(Seq(topic), 100).collect()
      .sortBy(_.rank)
    val matched: Map[String, Int] = corpus.map { case (d, c) =>
      d -> c.split(" ").toSet.intersect(Set("alpha", "beta", "gamma")).size
    }.toMap
    val expected = full.filter(l => matched(l.docno) >= 2)
      .zipWithIndex.map { case (l, r) => (l.docno, r, l.score) }
    val got = searcher.search(Seq(topic), 100, minShouldMatch = 2).collect()
      .sortBy(_.rank).map(l => (l.docno, l.rank, l.score))
    assert(got.toSeq == expected.toSeq)
    // the single-term docs really were dropped, not merely outranked
    assert(!got.exists(t => t._1 == "m-3" || t._1 == "m-5"))
  }

  test("msm above the clause count matches nothing; msm=0 is a no-op") {
    assert(searcher.search(Seq(topic), 100, minShouldMatch = 4).collect().isEmpty)
    val a = searcher.search(Seq(topic), 100).collect().map(_.docno).toSeq
    val b = searcher.search(Seq(topic), 100, minShouldMatch = 0)
      .collect().map(_.docno).toSeq
    assert(a == b)
  }

  test("msm composes per-batch: other topics in the batch share the gate") {
    val t2 = Topic("t2", "alpha delta")
    val got = searcher.search(Seq(topic, t2), 100, minShouldMatch = 2)
      .collect().groupBy(_.qid)
    // t2: only m-1 has both alpha and delta
    assert(got("t2").map(_.docno).toSeq == Seq("m-1"))
  }

  test("msm rejects incompatible modes loudly") {
    intercept[IllegalArgumentException] {
      searcher.search(Seq(topic), 10, pruning = true, minShouldMatch = 2)
        .collect()
    }
  }
}
