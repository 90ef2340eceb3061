package graft

import graft.analysis.AnalyzerConfig
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Searcher, Topic}
import org.scalatest.funsuite.AnyFunSuite

/** Facet counts: distinct matching docs per attribute value, verified
  * against brute force, plus the scan-width contract — the facet job must
  * read only the docid runs (tf/dl blobs and block metadata stay in
  * parquet).
  */
class FacetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val docs = Seq(
    ("f-01", "alpha beta", "scala"),
    ("f-02", "alpha alpha gamma", "java"),
    ("f-03", "beta delta", "java"),
    ("f-04", "gamma delta", "scala"),
    ("f-05", "epsilon", "go"),
    ("f-06", "alpha epsilon", "go"))

  private lazy val (searcher, keys) = {
    import spark.implicits._
    val corpus = docs.map(d => (d._1, d._2)).toDF("docno", "content")
    val idx = IndexBuilder.build(corpus, TestSpark.tmpDir("facets"),
      IndexConfig(analyzer = AnalyzerConfig(), groupShift = 4, mergeShift = 1))
    val sr = new Searcher(idx)
    val attrs = docs.map(d => (d._1, d._2, d._3)).toDF("docno", "content", "lang")
    (sr, sr.collapseKeyTable(attrs, "lang"))
  }

  test("counts distinct matching docs per (qid, key), brute-force identical") {
    val topics = Seq(Topic("1", "alpha delta"), Topic("2", "epsilon"))
    val got = searcher.facetCounts(topics, keys)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val want = (for {
      t <- topics
      terms = t.text.split(" ").toSet
      (docno, content, lang) <- docs
      if content.split(" ").toSet.intersect(terms).nonEmpty
    } yield (t.qid, docno, lang))
      .groupBy(x => (x._1, x._3)).map { case ((q, l), xs) =>
        (q, l, xs.map(_._2).distinct.size.toLong)
      }.toSet
    assert(got == want)
    // multi-term matches count once: f-01/f-02 match both alpha-ish terms
    assert(got.contains(("1", "java", 2L))) // f-02 (alpha), f-03 (delta)
    assert(got.contains(("2", "go", 2L)))
  }

  test("facet plan reads only docid runs; empty topics yield empty output") {
    val plan = searcher.facetCounts(Seq(Topic("1", "alpha")), keys)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val scans = plan.linesIterator
      .filter(_.trim.startsWith("ReadSchema")).map(_.trim).toSeq
    val postingsScans = scans.filter(_.contains("doc_blob"))
    assert(postingsScans.nonEmpty)
    postingsScans.foreach { f =>
      Seq("tf_blob", "dl_blob", "pos_blob", "block_last_docid").foreach(b =>
        assert(!f.contains(b), s"$b leaked into the facet scan: $f"))
    }
    // a stop-word-only topic analyzes to nothing
    val empty = searcher.facetCounts(
      Seq(Topic("1", "")), keys).collect()
    assert(empty.isEmpty)
  }

  test("adjacency matrix: singles + upper-triangle intersections, brute-force identical") {
    val got = searcher.adjacencyMatrix(
        Seq(("a", "alpha"), ("b", "gamma"), ("c", "epsilon")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // alpha: f-01 f-02 f-06; gamma: f-02 f-04; epsilon: f-05 f-06
    assert(got == Map(
      "a" -> 3L, "b" -> 2L, "c" -> 2L,
      "a&b" -> 1L, // f-02
      "a&c" -> 1L  // f-06; gamma∩epsilon empty → no "b&c" bucket, like ES
    ))
    intercept[IllegalArgumentException] {
      searcher.adjacencyMatrix(Seq(("x&y", "alpha")))
    }
    intercept[IllegalArgumentException] {
      searcher.adjacencyMatrix(Seq(("a", "alpha beta")))
    }
  }
}
