package graft.index

import graft.TestSpark
import graft.analysis.AnalyzerConfig
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Deterministic docid packing: docid = (g << 40 | idx) where g is the
  * exact ntile group of the docno's global rank (floor(rank*parts/N)) and
  * idx the rank within the group — a pure function of (docno order, parts)
  * with no dependence on Spark's sampled range boundaries, replayed by the
  * q_postings_meta DuckDB oracle with a row_number() window.
  */
class DocidSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Closed form the engine must match. */
  private def expectedDocids(docnos: Seq[String], parts: Int): Map[String, Long] = {
    val n = docnos.size.toLong
    docnos.sorted.zipWithIndex.map { case (d, r) =>
      val g = r.toLong * parts / n
      val gStart = (g * n + parts - 1) / parts // ceil(g*N/parts)
      d -> ((g << 40) | (r - gStart))
    }.toMap
  }

  test("ntileBoundaries + grpOf reproduce floor(rank*parts/N) for random key sets") {
    import spark.implicits._
    val rnd = new Random(42)
    for ((n, parts) <- Seq((1, 4), (3, 8), (7, 3), (40, 4), (100, 7), (64, 64))) {
      val keys = Seq.fill(n)(rnd.alphanumeric.take(6).mkString).distinct
      val bounds = IndexBuilder.ntileBoundaries(keys.toDS(), parts)
      val byRank = keys.sorted.zipWithIndex
      byRank.foreach { case (k, r) =>
        val want = r.toLong * parts / keys.size
        assert(IndexBuilder.grpOf(bounds, k) === want,
          s"n=${keys.size} parts=$parts key=$k rank=$r")
      }
    }
  }

  test("ntileBoundaries of an empty key set is empty") {
    import spark.implicits._
    assert(IndexBuilder.ntileBoundaries(Seq.empty[String].toDS(), 8).isEmpty)
    assert(IndexBuilder.ntileBoundaries(Seq("x").toDS(), 1).isEmpty)
  }

  test("built index docids equal the closed ntile form and rebuild byte-identically") {
    import spark.implicits._
    val docs = (0 until 23).map(i => (f"d$i%03d", s"token$i common"))
    val cfg = IndexConfig(analyzer = AnalyzerConfig(), rangePartitions = 3,
      groupShift = 2, mergeShift = 1, buckets = 4)
    val want = expectedDocids(docs.map(_._1), 3)

    def built(dir: String): Map[String, Long] =
      IndexBuilder.build(docs.toDF("docno", "content"), dir, cfg)
        .docs.select("docno", "docid").as[(String, Long)].collect().toMap

    val a = built(TestSpark.tmpDir("docid-a"))
    val b = built(TestSpark.tmpDir("docid-b"))
    assert(a === want)
    assert(b === want) // second build (fresh dir, same input): identical ids
  }

  test("duplicate docnos fail the build loudly (rank packing would be ambiguous)") {
    import spark.implicits._
    val docs = Seq(("dup", "x"), ("dup", "y"), ("other", "z"))
    val cfg = IndexConfig(analyzer = AnalyzerConfig(), rangePartitions = 2,
      groupShift = 1, mergeShift = 1, buckets = 4)
    val e = intercept[org.apache.spark.SparkException] {
      IndexBuilder.build(docs.toDF("docno", "content"),
        TestSpark.tmpDir("docid-dup"), cfg)
    }
    assert(e.getMessage.contains("duplicate docno")
      || Option(e.getCause).exists(_.getMessage.contains("duplicate docno")))
  }

  test("epoch-namespaced docids keep the closed form in the low bits") {
    import spark.implicits._
    val docs = (0 until 9).map(i => (s"e$i", s"tok$i"))
    val cfg = IndexConfig(analyzer = AnalyzerConfig(), rangePartitions = 2,
      groupShift = 1, mergeShift = 1, buckets = 4, docidEpoch = 3)
    val got = IndexBuilder.build(docs.toDF("docno", "content"),
        TestSpark.tmpDir("docid-epoch"), cfg)
      .docs.select("docno", "docid").as[(String, Long)].collect().toMap
    val base = expectedDocids(docs.map(_._1), 2)
    assert(got === base.map { case (d, id) => d -> ((3L << 52) | id) })
  }

  test("more groups than docs: trailing groups stay empty, ids still closed-form") {
    import spark.implicits._
    val docs = Seq(("a", "x"), ("b", "y"), ("c", "z"))
    val cfg = IndexConfig(analyzer = AnalyzerConfig(), rangePartitions = 8,
      groupShift = 1, mergeShift = 1, buckets = 4)
    val got = IndexBuilder.build(docs.toDF("docno", "content"),
        TestSpark.tmpDir("docid-c"), cfg)
      .docs.select("docno", "docid").as[(String, Long)].collect().toMap
    assert(got === expectedDocids(docs.map(_._1), 8))
  }
}
