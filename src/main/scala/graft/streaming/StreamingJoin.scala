package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Watermarked stream-stream inner join: correlate each user's click with
  * the errors that follow it within `withinMinutes` — the sessionization/
  * attribution shape (join two live event streams on key + time range)
  * that rounds out the streaming surface next to ingest, stateful dedup
  * and windowed rollups. Beyond the batch-only reference.
  *
  * Inner-join matches emit as soon as both rows have arrived; the
  * watermarks plus the time-range predicate bound the join STATE — a
  * click is evicted once the error-side watermark passes
  * `click_ts + withinMinutes`, so state cannot grow with an unbounded
  * 100-TB stream. Because eviction only drops rows that can no longer
  * match, the streamed result over a bounded replay equals the batch
  * join exactly — which is what the oracle runs — PROVIDED each source's
  * out-of-orderness stays within the watermark delay (= the join window
  * here, so there is zero extra slack): a row arriving later than that is
  * evicted from state before its match and silently dropped, where the
  * batch join would keep it. The gate fixture replays ts-ordered batches,
  * which trivially satisfies the precondition; with genuinely disordered
  * sources, widen `withWatermark` beyond `withinMinutes` by the expected
  * lateness.
  */
object StreamingJoin {

  /** (user_id, click_id, error_id) for error events within
    * [click_ts, click_ts + withinMinutes] of the same user's click.
    * `clicks`/`errors` are streaming frames of the events schema (they
    * may come from two sources over the same files).
    */
  def clickErrorPairs(clicks: DataFrame, errors: DataFrame,
                      withinMinutes: Int = 10): DataFrame = {
    val delay = s"$withinMinutes minutes"
    val c = clicks.withWatermark("ts", delay)
      .where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val e = errors.withWatermark("ts", delay)
      .where(col("event_type") === "error")
      .select(col("user_id").as("err_user"), col("event_id").as("error_id"),
        col("ts").as("error_ts"))
    c.join(e, expr(
        s"""user_id = err_user AND error_ts >= click_ts
           |AND error_ts <= click_ts + interval $withinMinutes minutes"""
          .stripMargin.replace("\n", " ")))
      .select(col("user_id"), col("click_id"), col("error_id"))
  }

  /** Stream event parquet files under `sourceDir` (read by BOTH join
    * sides as independent sources) into matched pairs appended to
    * `outDir`; offsets + join state checkpoint under `checkpointDir`.
    */
  def start(spark: SparkSession, sourceDir: String, outDir: String,
            checkpointDir: String, withinMinutes: Int = 10,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Int = 1): StreamingQuery = {
    def src = spark.readStream
      .schema(StreamingEvents.eventsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    clickErrorPairs(src, src, withinMinutes)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
  }
}
