package graft

import graft.streaming.StreamingEvents
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Watermarked hourly windows in append mode: a window emits exactly once
  * (final), late events inside the delay aggregate, later ones drop.
  */
class StreamingEventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("append-mode windows finalize at the watermark; late data honored within the delay, dropped past it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val in = ms.toDS()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = StreamingEvents.windowedCounts(in, cutoff = "2029-01-01 00:00:00")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      // hour 0: two clicks; hour 1: one view; max ts 01:15 → watermark 01:05
      ms.addData(
        (0L, ts("2024-01-01 00:05:00"), 1L, "click", 1.25, "{}"),
        (1L, ts("2024-01-01 00:40:00"), 2L, "click", 2.50, "{}"),
        (2L, ts("2024-01-01 01:15:00"), 3L, "view", 10.00, "{}"))
      q.processAllAvailable()
      val afterB1 = spark.table("win_out")
        .as[(Long, String, Long, Long)].collect().toSet
      val h0 = ts("2024-01-01 00:00:00").getTime / 1000
      val h1 = ts("2024-01-01 01:00:00").getTime / 1000
      assert(afterB1 == Set((h0, "click", 2L, 375L))) // hour 1 still open
      // batch 2: late-but-inside-delay view lands in hour 1; an hour-0
      // straggler is PAST the watermark and must drop; the sentinel closes
      // everything real and is itself excluded by the cutoff
      ms.addData(
        (3L, ts("2024-01-01 01:06:00"), 4L, "view", 0.75, "{}"),
        (4L, ts("2024-01-01 00:30:00"), 5L, "click", 99.99, "{}"),
        (5L, ts("2030-01-01 00:00:00"), 0L, "sentinel", 0.0, "{}"))
      q.processAllAvailable()
      val all = spark.table("win_out").as[(Long, String, Long, Long)].collect().toSeq
      assert(all.count(r => r._1 == h0 && r._2 == "click") == 1) // no re-emit
      assert(all.toSet == Set(
        (h0, "click", 2L, 375L),
        (h1, "view", 2L, 1075L))) // 10.00 + 0.75, straggler dropped
    } finally q.stop()
  }
}
