package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Watermarked event-time windowed aggregation over a continuous event
  * stream — the Structured-Streaming shape (event-time windows + late-data
  * bound + append-mode finalized results) a training-data pipeline uses
  * for telemetry/usage rollups. Beyond the batch-only reference.
  *
  * Append mode emits a window only once the WATERMARK (max observed event
  * time minus `watermarkDelay`) passes its end, so emitted rows are FINAL:
  * late events inside the delay still aggregate, later ones are dropped by
  * contract. State is one row per open (window × type) group in the
  * sharded state store, bounded by the watermark (closed windows are
  * evicted) — safe on an unbounded 100-TB stream where an unwatermarked
  * aggregation would grow state forever.
  *
  * Counts are exact longs and the value sum is tracked in integer cents
  * (`round(value*100)`), so finalized rows replay exactly in an oracle.
  */
object StreamingEvents {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Per (hour window, event_type): exact event count and value sum in
    * cents. `cutoff` excludes the watermark-advancing sentinel the caller
    * streams last (the standard trick to finalize ALL real windows of a
    * bounded replay — on a truly unbounded stream no cutoff is needed);
    * the sentinel still advances the watermark because the filter sits
    * AFTER the watermark operator.
    */
  def windowedCounts(events: DataFrame, cutoff: String,
                     watermarkDelay: String = "10 minutes",
                     windowDur: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .where(col("ts") < lit(cutoff).cast("timestamp"))
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .select(unix_timestamp(col("window").getField("start")).as("win_start"),
        col("event_type"), col("n_events"), col("sum_cents"))

  /** Stream event parquet files under `sourceDir` into finalized hourly
    * rollups appended to `outDir`; offsets + window state checkpoint under
    * `checkpointDir`.
    */
  def start(spark: SparkSession, sourceDir: String, outDir: String,
            checkpointDir: String, cutoff: String,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Int = 1): StreamingQuery =
    windowedCounts(
      spark.readStream
        .schema(eventsSchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(sourceDir), cutoff)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
}
