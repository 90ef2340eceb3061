package graft.search

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Multi-field retrieval — the "most_fields" combination (≙ Elasticsearch
  * `multi_match type: most_fields`, the grouped form of Lucene's
  * MultiFieldQueryParser with per-field boosts): the query is analyzed per
  * field by that field's own index analyzer, each field scores
  * independently against its own statistics (df, doclen, avgdl, N), and a
  * document's final score is the boost-weighted sum of its per-field
  * scores. A document matching only ONE field still ranks — the combine is
  * a full outer join, missing fields contribute 0.
  *
  * The reference seam: LTR indexes a single TREC `TEXT` field
  * (`IndexTREC.java`), but real code search needs path/content fields
  * scored together; this composes the existing single-field engine into
  * that shape without touching the index format — one index per field.
  *
  * Scale shape: per-field scored streams are the same bucket-pruned
  * postings scans every single-field query runs; the combine is ONE
  * (qid, docid) full-outer join between candidate streams (each bounded by
  * the fields' posting sizes for the query terms, never corpus-sized), and
  * the collector is the shared bounded-heap top-k. All field indexes must
  * be built from the same corpus with the same range fan-out:
  * IndexBuilder's docid packing is a deterministic function of the docno
  * set alone (ntile of global docno rank), so equal corpora ⇒ identical
  * docid↔docno maps and the combine can equi-join on docid without ever
  * shuffling docno strings (MultiFieldSpec asserts the invariant; a
  * `require` checks the config here).
  */
object MultiField {

  /** Boost-weighted sum of per-field scores over `fields` =
    * (field searcher, boost), collected to top-k. Float per-field
    * subtotals sum in field order — the grouped BooleanQuery nesting
    * ((f1:a f1:b)^b1 (f2:a f2:b)^b2).
    */
  def mostFields(fields: Seq[(Searcher, Float)], topics: Seq[Topic],
                 k: Int = 1000, scorerName: String = "bm25")
      : Dataset[RunLine] = {
    require(fields.nonEmpty, "at least one field required")
    val cfg0 = fields.head._1.index.cfg
    fields.tail.foreach { case (sr, _) =>
      val c = sr.index.cfg
      require(c.rangePartitions == cfg0.rangePartitions &&
          c.groupShift == cfg0.groupShift && c.mergeShift == cfg0.mergeShift,
        "field indexes must share the docid packing (same rangePartitions/" +
          "groupShift/mergeShift over the same corpus)")
    }
    val spark = fields.head._1.index.spark
    import spark.implicits._
    val perField = fields.zipWithIndex.map { case ((sr, _), i) =>
      sr.scoredTopics(topics, scorerName).toDF("qid", "docid", s"s$i")
    }
    val joined = perField.reduce((l, r) =>
      l.join(r, Seq("qid", "docid"), "full_outer"))
    val score = fields.zipWithIndex.map { case ((_, boost), i) =>
      coalesce(col(s"s$i"), lit(0.0f)) * lit(boost)
    }.reduce(_ + _)
    val combined = joined
      .select(col("qid"), col("docid"), score.cast("float").as("score"))
      .as[(String, Long, Float)]
    fields.head._1.collectTopK(combined, k, s"multi_$scorerName")
  }
}
