package graft.search

import graft.analysis.Analyzer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Percolator (≙ Elasticsearch percolate queries) — search INVERTED:
  * queries are registered up front, and each incoming document is matched
  * against them ("which alerts does this doc trigger"). The classic
  * implementation indexes the queries' terms and pre-selects candidate
  * queries per document through that index — exactly mirrored here: the
  * registered (qid, term) table joins against each document's analyzed
  * distinct-term stream, and a per-(doc, query) count gives the matched
  * clause count, gated on `minMatch` (1 = the OR percolation Lucene's
  * MemoryIndex path answers; higher = minimum_should_match percolation).
  *
  * Scale shape: documents stream through one narrow analyze pass (no
  * shuffle); the query-term table is the small side (broadcast — millions
  * of registered queries still fit: terms, not postings); the only
  * exchange is the (docno, qid) count aggregation. Nothing touches the
  * corpus index — percolation is index-free on the document side by
  * design, like MemoryIndex.
  */
object Percolator {

  /** Match `docs` (docno, content) against `registered` topics; returns
    * (docno, qid, n_matched ≥ minMatch) — the matched-clause count is the
    * DISTINCT analyzed query-term overlap, integer-exact.
    */
  def percolate(docs: DataFrame, registered: Seq[Topic], an: Analyzer,
                minMatch: Int = 1): DataFrame = {
    require(registered.nonEmpty, "no registered queries")
    require(registered.map(_.qid).distinct.size == registered.size,
      "duplicate qids among registered queries")
    require(minMatch >= 1, s"minMatch must be ≥ 1: $minMatch")
    val spark = docs.sparkSession
    import spark.implicits._
    val qterms = registered.flatMap { t =>
      an.analyze(t.text).distinct.map(term => (t.qid, term))
    }.distinct.toDF("qid", "term")
    val anB = an
    val docTerms = docs.select("docno", "content").as[(String, String)]
      .flatMap { case (docno, content) =>
        anB.termFreqs(content)._1.iterator.map { case (term, _) => (docno, term) }
      }
      .toDF("docno", "term")
    docTerms
      .join(broadcast(qterms), Seq("term"))
      .groupBy("docno", "qid")
      .agg(count(lit(1)).cast("long").as("n_matched"))
      .where(col("n_matched") >= minMatch)
  }
}
