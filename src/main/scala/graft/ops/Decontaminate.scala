package graft.ops

import graft.analysis.Analyzer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene op that keeps
  * evaluation material out of a pretraining corpus. The published method
  * (n-gram overlap, as in the GPT-2/GPT-3 appendix decontamination and
  * most open-data pipelines since): a document is CONTAMINATED when it
  * shares at least `minShared` distinct analyzed word n-grams with any
  * single benchmark item.
  *
  * Scale design (100 TB corpus; benchmark sets are small by nature,
  * 10^3–10^6 items): the corpus side is one narrow shingling pass reusing
  * [[Dedup.shingles]]; the benchmark side BROADCASTS, so the only shuffle
  * is the per-(doc, item) overlap count over the matching-shingle stream
  * — tiny relative to the corpus at any plausible n ≥ 3. No all-pairs
  * join, no driver-side state beyond the broadcast benchmark shingles.
  */
object Decontaminate {

  /** Per-document contamination verdict over `bench(bench_id, text)`:
    * `(docno, contaminated, n_shared, bench_id)` where `n_shared` is the
    * max distinct shared n-grams with any SINGLE benchmark item and
    * `bench_id` the argmax (lowest id on ties; docs with no overlap
    * report 0 and an empty id). Both sides shingle through the same
    * analyzer, so stop/stem config applies identically.
    */
  def contaminationFlags(corpus: DataFrame, bench: DataFrame,
                         analyzer: Analyzer, n: Int,
                         minShared: Int): DataFrame = {
    val cs = Dedup.shingles(corpus, analyzer, n)
    val bs = Dedup.shingles(
        bench.select(col("bench_id").cast("string").as("docno"),
          col("text").cast("string").as("content")),
        analyzer, n)
      .withColumnRenamed("docno", "bench_id")
    val matches = cs.join(broadcast(bs), "shingle")
      .groupBy("docno", "bench_id").agg(count(lit(1)).as("shared"))
    // argmax per doc: shared desc, bench_id asc — min over the inverted
    // struct keeps it one aggregation, no window over the match stream
    val best = matches
      .select(col("docno"),
        struct((-col("shared")).as("neg"), col("bench_id")).as("sb"))
      .groupBy("docno").agg(min("sb").as("sb"))
      .select(col("docno"), (-col("sb.neg")).as("n_shared"),
        col("sb.bench_id").as("bench_id"))
    corpus.select(col("docno").cast("string"))
      .join(best, Seq("docno"), "left")
      .select(col("docno"),
        (coalesce(col("n_shared"), lit(0L)) >= minShared).as("contaminated"),
        coalesce(col("n_shared"), lit(0L)).cast("long").as("n_shared"),
        coalesce(col("bench_id"), lit("")).as("bench_id"))
  }
}
