package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index-time sorting (≙ Lucene `IndexWriterConfig.setIndexSort` +
  * `TopFieldCollector` early termination / Elasticsearch
  * `index.sort.field`): a sorted sibling projection of the document
  * table, range-partitioned on the sort key so that a query sorted the
  * same way reads only a PARTITION PREFIX and stops — "first k documents
  * by key" at 10^12 docs touches one partition, not the corpus, exactly
  * the trade Lucene makes by sorting segments at flush/merge time.
  *
  * The reference's Lucene 5.4 stack predates index sorting (it landed in
  * Lucene 6.2), so like the trigram index this is a published-design
  * extension, not a reference seam.
  *
  * Scale shape:
  *  - rows are (skey, docno), `repartitionByRange`-cut on (skey, docno)
  *    into [[Parts]] partitions and sorted within files; the partition
  *    ordinal `sp` IS the global key order, so a prefix/suffix scan
  *    needs no boundary manifest to order partitions;
  *  - per-partition (min, max, count) bounds are still written alongside
  *    (one tiny parquet) so key-range lookups can prune by value and the
  *    query planner can skip empty partitions without opening them;
  *  - the top-k scan is the same doubling partition-prefix loop as the
  *    match-all complement ([[graft.search.Searcher]]): driver state is
  *    ≤ k rows, each batch is a closed-range `sp` predicate the parquet
  *    source prunes on, and a filtered query semi-joins the candidate
  *    docnos INSIDE each batch so a selective filter just widens the
  *    prefix instead of forcing a full scan;
  *  - correctness never depends on WHERE the range cuts fall (sampling
  *    in `repartitionByRange` is not reproducible across Spark versions)
  *    — only on the written `sp` ordering, which the bounds rows assert.
  */
object SortedDocs {

  /** Range fan-out; one partition per executor-ish at gate scale. At
    * 10^12 docs this would be thousands — the prefix property and the
    * closed-range pruning predicate are invariant in the count.
    */
  val Parts = 32

  private val Stage = "sorted_docs"

  final case class Table(data: DataFrame, bounds: DataFrame) {
    /** Partitions ATTEMPTED (included in issued slices) by the last
      * [[topByKey]] call — the early-termination observable specs assert
      * on. An upper bound on partitions actually needed: the final slice
      * may satisfy `k` before its last partition. Guarded by [[topByKey]]
      * being synchronized — Engine caches one Table per corpus, so
      * unsynchronized concurrent calls would clobber each other's value.
      */
    @volatile var lastPartsScanned: Int = 0

    /** Top-`k` (skey, docno) rows in (skey, docno) order — ascending or
      * descending — optionally restricted to `filterDocnos` (a `docno`
      * column; semi-joined inside each batch). The doubling prefix scan
      * stops as soon as `k` rows survive, so an unfiltered query reads
      * one partition and a filtered one reads prefix partitions until
      * the filter yields `k` survivors.
      */
    def topByKey(k: Int, asc: Boolean = true,
                 filterDocnos: Option[DataFrame] = None): Seq[(String, String)] =
      synchronized {
      require(k > 0, "k must be positive")
      // materialize the filter ONCE — the doubling loop re-joins it every
      // batch, and an expensive filter plan (a postings decode + doc
      // attach) must not re-execute per iteration
      val filt = filterDocnos.map(_.select("docno").persist())
      try {
        // non-empty partitions in scan order, from the tiny bounds table
        val sps = bounds.where(col("cnt") > 0).select("sp")
          .collect().map(_.getInt(0)).sorted
        val order = if (asc) sps else sps.reverse
        val acc = Vector.newBuilder[(String, String)]
        var have = 0
        var idx = 0
        var batch = 1
        while (idx < order.length && have < k) {
          val slice = order.slice(idx, idx + batch)
          idx += slice.length
          batch *= 2
          // slice is contiguous in scan order; a closed range prunes the
          // same partitions as isin() with O(1) predicate literals
          val lo = slice.min
          val hi = slice.max
          val rows0 = data.where(col("sp") >= lo && col("sp") <= hi)
            .select(col("skey"), col("docno"))
          val rows = filt match {
            case None => rows0
            case Some(f) => rows0.join(f, Seq("docno"), "left_semi")
              .select(col("skey"), col("docno"))
          }
          val got = rows
            .orderBy(if (asc) col("skey").asc else col("skey").desc,
              if (asc) col("docno").asc else col("docno").desc)
            .limit(k - have)
            .collect()
          // every row in this slice precedes every row in later slices
          // (range-disjoint cuts on the full (skey, docno) tuple), so
          // appending keeps the global order
          got.foreach(r => acc += ((r.getString(0), r.getString(1))))
          have += got.length
        }
        lastPartsScanned = idx
        acc.result()
      } finally filt.foreach(_.unpersist(blocking = false))
    }
  }

  /** Build (or resume from) the sorted projection at `dir` over a corpus
    * exposing `docno` and the sort field. Resumable + atomically
    * published like every index stage, keyed on the corpus fingerprint
    * and the field name.
    */
  def build(corpus: DataFrame, field: String, dir: String): Table = {
    val spark = corpus.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val row = corpus
      .agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("docno"))), lit(0L)))
      .head()
    val fp = s"f=$field;n=${row.getLong(0)};h=${java.lang.Long.toHexString(row.getLong(1))}"
    if (!Checkpoint.isComplete(dir, fp, Stage, conf)) {
      val t0 = System.nanoTime()
      Checkpoint.atomically(dir, conf) { tmp =>
        val sorted = corpus
          .select(col(field).cast("string").as("skey"), col("docno"))
          .repartitionByRange(Parts, col("skey"), col("docno"))
          .sortWithinPartitions("skey", "docno")
          .withColumn("sp", spark_partition_id())
        sorted.write.partitionBy("sp").parquet(s"$tmp/data")
        // bounds computed from the WRITTEN rows (not the plan), so they
        // are true whatever boundaries the range sampler chose
        spark.read.parquet(s"$tmp/data")
          .groupBy(col("sp").cast("int").as("sp"))
          .agg(min("skey").as("min_key"), max("skey").as("max_key"),
            count(lit(1)).as("cnt"))
          .coalesce(1)
          .write.parquet(s"$tmp/bounds")
      }
      val n = spark.read.parquet(s"$dir/data").count()
      Checkpoint.writeManifest(dir,
        Checkpoint.Manifest(Stage, fp, Stage, n,
          (System.nanoTime() - t0) / 1000000L, Nil), conf)
    }
    read(spark, dir)
  }

  def read(spark: SparkSession, dir: String): Table =
    Table(spark.read.parquet(s"$dir/data"),
      spark.read.parquet(s"$dir/bounds"))
}
