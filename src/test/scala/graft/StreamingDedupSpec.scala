package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Stateful streaming exact dedup: first-seen sha wins across batches
  * (checkpointed state), smallest docno wins within a batch.
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cross-batch state drops later duplicates; within-batch min docno wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val q = StreamingDedup.dedupBatches(ms.toDS()).toDF("docno", "sha")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: b/a share content (a wins by docno), c unique
      ms.addData(("doc-b", "same text"), ("doc-a", "same text"),
        ("doc-c", "other text"))
      q.processAllAvailable()
      // batch 2: duplicate of batch-1 content dropped by STATE even from a
      // smaller docno; one genuinely new doc passes
      ms.addData(("doc-0", "same text"), ("doc-d", "third text"))
      q.processAllAvailable()
      val kept = spark.table("dedup_out").as[(String, String)].collect()
        .map(_._1).sorted.toSeq
      assert(kept == Seq("doc-a", "doc-c", "doc-d"))
    } finally q.stop()
  }

  test("restarted query resumes dedup state from the checkpoint") {
    import spark.implicits._
    val root = TestSpark.tmpDir("dedupstream")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/src"))
    def writeFile(name: String, rows: Seq[(String, String)]): Unit = {
      val tmp = TestSpark.tmpDir("dedupfile")
      rows.toDF("docno", "content").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.globStatus(new org.apache.hadoop.fs.Path(s"$tmp/part-*.parquet")).head.getPath
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$root/src/$name"))
    }
    writeFile("f0.parquet", Seq("d-1" -> "alpha text", "d-2" -> "beta text"))
    StreamingDedup.start(spark, s"$root/src", s"$root/out", s"$root/ckpt")
      .awaitTermination()
    // second run: one dup (dropped via RESTORED state) + one new doc
    writeFile("f1.parquet", Seq("d-3" -> "alpha text", "d-4" -> "gamma text"))
    StreamingDedup.start(spark, s"$root/src", s"$root/out", s"$root/ckpt")
      .awaitTermination()
    val kept = spark.read.parquet(s"$root/out").as[(String, String)].collect()
      .map(_._1).sorted.toSeq
    assert(kept == Seq("d-1", "d-2", "d-4"))
  }
}
