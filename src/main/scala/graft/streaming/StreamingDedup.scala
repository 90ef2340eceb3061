package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Stateful exact deduplication over a document stream: the FIRST document
  * seen for each content sha256 passes, every later arrival is dropped —
  * the streaming analog of the batch exact-dedup op
  * ([[graft.ops.Dedup]]/q_exact_dup) and the step a continuous
  * training-data ingest runs before indexing or packing. Beyond the
  * batch-only reference (`IndexTREC.java:94-101`).
  *
  * Semantics: across micro-batches the earlier batch wins (one boolean of
  * [[GroupState]] per sha, sharded by Spark's state store across executors
  * and persisted in the streaming checkpoint — driver memory holds
  * nothing); within one batch the smallest docno wins, so the kept set is
  * deterministic and engine-independent: exactly `min(docno) per sha` in
  * batch-arrival order. At 100 TB the state size is one entry per UNIQUE
  * content, the state store scales horizontally with executors (RocksDB
  * provider in production configs), and a restarted query resumes both
  * source offsets and state from the checkpoint.
  */
object StreamingDedup {

  /** The dedup transformation: (docno, content) → kept (docno, sha).
    * Works on a streaming Dataset (cross-batch state) and, degenerately,
    * on a batch Dataset (single "batch": min docno per sha).
    */
  def dedupBatches(docs: Dataset[(String, String)]): Dataset[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.toDF("docno", "content")
      .select(col("docno"), sha2(col("content"), 256).as("sha"))
      .as[(String, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Boolean, (String, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (sha: String, it: Iterator[(String, String)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            it.map(_._1).reduceOption((a, b) => if (a <= b) a else b)
              .map(d => (d, sha)).iterator
          }
      }
  }

  /** Start the stream: parquet files of (docno, content) under `sourceDir`
    * arrive as micro-batches; kept (docno, sha) rows append to `outDir` as
    * parquet. Offsets AND dedup state live under `checkpointDir`.
    */
  def start(spark: SparkSession, sourceDir: String, outDir: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Int = 1): StreamingQuery = {
    import spark.implicits._
    val in = spark.readStream
      .schema(StreamingIngest.corpusSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .select(col("docno").cast("string"), col("content"))
      .as[(String, String)]
    dedupBatches(in).toDF("docno", "sha")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
  }
}
