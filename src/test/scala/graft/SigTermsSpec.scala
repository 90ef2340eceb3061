package graft

import graft.analysis.AnalyzerConfig
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Searcher, SignificantTerms, Topic}
import org.scalatest.funsuite.AnyFunSuite

/** Significant-terms aggregation: integer cross-multiplied score over
  * hit-set vs corpus document frequencies, verified against a brute
  * recomputation from the raw corpus.
  */
class SigTermsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // "disk" pairs with "failure" in the disk docs only; "common" is
  // everywhere, so it must score at the bottom despite full fg coverage
  private val corpus = Seq(
    "s-1" -> "disk failure logged common",
    "s-2" -> "disk failure repeated common",
    "s-3" -> "disk error common",
    "s-4" -> "network okay common",
    "s-5" -> "network fine common",
    "s-6" -> "cpu idle common")

  private lazy val (searcher, corpusDf) = {
    import spark.implicits._
    val df = corpus.toDF("docno", "content")
    val dir = TestSpark.tmpDir("sigterms")
    (new Searcher(IndexBuilder.build(df, dir,
      IndexConfig(analyzer = AnalyzerConfig()))), df)
  }

  test("sig terms ≡ brute fg/bg recomputation, score desc / term asc") {
    val topics = Seq(Topic("t1", "disk"))
    val got = SignificantTerms.topTerms(searcher, corpusDf, topics,
        kHits = 10, nTerms = 20)
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._5)

    val hitDocs = corpus.filter(_._2.split(" ").contains("disk")).map(_._1)
    val nHits = hitDocs.size.toLong
    val n = corpus.size.toLong
    val fgTerms = corpus.filter(t => hitDocs.contains(t._1))
      .flatMap(_._2.split(" ").distinct)
    val brute = fgTerms.groupBy(identity).map { case (t, xs) =>
      val fg = xs.size.toLong
      val bg = corpus.count(_._2.split(" ").contains(t)).toLong
      (t, fg, bg, fg * n - bg * nHits)
    }.toSeq.sortBy { case (t, _, _, s) => (-s, t) }
      .zipWithIndex.map { case ((t, f, b, s), r) => (t, f, b, s, r.toLong) }
    assert(got.toSeq == brute)
    // the discriminative pair tops the list; the ubiquitous term is last
    assert(got.head._1 == "disk")
    assert(got.take(2).map(_._1).contains("failure"))
    assert(got.last._1 == "common" && got.last._4 == 0L) // fg==hits, bg==N
  }

  test("multiple topics stay independent") {
    val topics = Seq(Topic("t1", "disk"), Topic("t2", "network"))
    val rows = SignificantTerms.topTerms(searcher, corpusDf, topics, 10, 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(5)))
    val byQ = rows.groupBy(_._1)
    assert(byQ("t1").map(_._2).contains("disk"))
    assert(byQ("t2").map(_._2).contains("network"))
    assert(byQ.values.forall(_.length == 3))
  }
}
