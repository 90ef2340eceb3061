package graft

import graft.analysis.{Analyzer, AnalyzerConfig}
import graft.search.{Percolator, Topic}
import org.scalatest.funsuite.AnyFunSuite

/** Percolator: documents matched against registered queries by distinct
  * analyzed-term overlap, minMatch-gated.
  */
class PercolatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val an = new Analyzer(AnalyzerConfig(stopWords = Set("the", "a")))

  private val registered = Seq(
    Topic("alert1", "disk failure"),
    Topic("alert2", "network slow timeout"),
    Topic("alert3", "the disk")) // 'the' stops out: single-clause query

  test("docs trigger exactly the queries whose clause floor they reach") {
    import spark.implicits._
    val docs = Seq(
      ("d-1", "disk failure on node"),       // alert1 both terms, alert3 one
      ("d-2", "network timeout again"),       // alert2 two of three
      ("d-3", "the disk looks fine"),         // one term each of alert1/3
      ("d-4", "nothing relevant")).toDF("docno", "content")
    val got2 = Percolator.percolate(docs, registered, an, minMatch = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got2 == Set(("d-1", "alert1", 2L), ("d-2", "alert2", 2L)))
    // minMatch=1: OR percolation — single-term overlaps surface
    val got1 = Percolator.percolate(docs, registered, an, minMatch = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got1.contains(("d-3", "alert3")) && got1.contains(("d-3", "alert1")))
    assert(!got1.exists(_._1 == "d-4"))
    // repeated terms in a doc count once (DISTINCT overlap)
    val rep = Seq(("r-1", "disk disk disk")).toDF("docno", "content")
    val gotRep = Percolator.percolate(rep, registered, an, minMatch = 1)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(gotRep == Set(("alert1", 1L), ("alert3", 1L)))
  }
}
