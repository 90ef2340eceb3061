package graft

import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{MultiField, Searcher, Topic}
import org.scalatest.funsuite.AnyFunSuite

/** Multi-field "most_fields" retrieval (MultiField.mostFields): per-field
  * BM25 over separate field indexes combined as a boost-weighted sum, with
  * path-only matches ranking and the docid-packing invariant that makes
  * the docid equi-join combine legal.
  */
class MultiFieldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // body field and a "title" field over the same 5 docs; m-4 matches ONLY
  // the title field for "zebra", m-5 matches only the body for "quartz"
  private val docs = Seq(
    ("m-1", "quartz mineral sample notes", "geology survey"),
    ("m-2", "granite and quartz comparison study", "rock comparison"),
    ("m-3", "field notes on rivers", "hydrology zebra"),
    ("m-4", "unrelated body text entirely", "zebra crossing report"),
    ("m-5", "quartz quartz quartz everywhere", "dense mineral core"))

  private lazy val fixture = {
    import spark.implicits._
    val body = docs.map(d => (d._1, d._2)).toDF("docno", "content")
    val title = docs.map(d => (d._1, d._3)).toDF("docno", "content")
    val cfg = IndexConfig(rangePartitions = 4)
    val bIdx = IndexBuilder.build(body, TestSpark.tmpDir("mf_body"), cfg)
    val tIdx = IndexBuilder.build(title, TestSpark.tmpDir("mf_title"), cfg)
    (new Searcher(bIdx), new Searcher(tIdx))
  }

  test("docid packing coincides across field indexes of the same corpus") {
    val (b, t) = fixture
    val bm = b.index.docs.select("docno", "docid").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tm = t.index.docs.select("docno", "docid").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bm == tm && bm.size == docs.size)
  }

  test("a doc matching only one field still ranks; boosts weight the sum") {
    val (b, t) = fixture
    val topic = Seq(Topic("1", "zebra quartz"))
    val got = MultiField.mostFields(Seq(b -> 1.0f, t -> 1.0f), topic, 10)
      .collect().sortBy(_.rank)
    // every doc matching either field is present
    assert(got.map(_.docno).toSet == Set("m-1", "m-2", "m-3", "m-4", "m-5"))
    // m-4 (title-only zebra) scores exactly its title-field score
    val tOnly = t.search(topic, 10).collect().find(_.docno == "m-4").get
    val m4 = got.find(_.docno == "m-4").get
    assert(m4.score == tOnly.score)
    // raising the title boost lifts title-only docs above body-only ones
    val boosted = MultiField.mostFields(Seq(b -> 1.0f, t -> 10.0f), topic, 10)
      .collect().sortBy(_.rank).map(_.docno).toSeq
    assert(boosted.indexOf("m-4") < boosted.indexOf("m-5"))
  }

  test("degenerate single-field most_fields reproduces plain search ranks") {
    val (b, _) = fixture
    val topic = Seq(Topic("1", "quartz mineral"))
    val plain = b.search(topic, 10).collect().sortBy(_.rank)
      .map(l => (l.docno, l.score)).toSeq
    val multi = MultiField.mostFields(Seq(b -> 1.0f), topic, 10)
      .collect().sortBy(_.rank).map(l => (l.docno, l.score)).toSeq
    assert(multi == plain)
  }

  test("mismatched docid packing is rejected loudly") {
    import spark.implicits._
    val (b, _) = fixture
    val other = IndexBuilder.build(
      docs.map(d => (d._1, d._3)).toDF("docno", "content"),
      TestSpark.tmpDir("mf_mismatch"), IndexConfig(rangePartitions = 2))
    val e = intercept[IllegalArgumentException] {
      MultiField.mostFields(Seq(b -> 1.0f, new Searcher(other) -> 1.0f),
        Seq(Topic("1", "zebra")), 10)
    }
    assert(e.getMessage.contains("docid packing"))
  }
}
