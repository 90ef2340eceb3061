package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Round-6 measurement harness (spark_optimization_guide §1): per-entry
  * wall time plus scheduler-level attribution — jobs, stages, tasks,
  * summed task time, shuffle read/write bytes — captured by a listener
  * between entry marks. Replicates [[Bench]]'s session config exactly so
  * numbers are comparable, but is NOT part of the driver contract:
  * [[Bench]] stays the frozen harness; this main exists so optimization
  * claims in OPTIMIZATION_r06.md cite isolated evidence.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     scripts/run_main graft.BenchExtra [entryRegex] [reps]
  *
  * Prints one line per (entry, rep):
  *   EXTRA name rep=K wall=S jobs=J stages=St tasks=T taskTime=S
  *     shufR=bytes shufW=bytes input=bytes
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val pattern = args.headOption.getOrElse(".*")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val shufR = new AtomicLong
    val shufW = new AtomicLong
    val input = new AtomicLong
    val detail = sys.env.get("GRAFT_EXTRA_DETAIL").contains("1")
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (detail) {
          val cs = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
          val site = j.stageInfos.lastOption.map(_.details.linesIterator
            .filter(l => l.contains("graft.") && !l.contains("BenchExtra"))
            .take(1).mkString).getOrElse("")
          jobStarts.put(j.jobId, (System.nanoTime(), s"$cs | $site"))
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = if (detail) {
        val st = jobStarts.remove(j.jobId)
        if (st != null)
          println(f"  JOB ${j.jobId}%4d ${(System.nanoTime() - st._1) / 1e9}%6.2fs ${st._2}")
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          input.addAndGet(m.inputMetrics.bytesRead)
        }
      }
    })
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0)
      shufR.set(0); shufW.set(0); input.set(0)
    }

    val names = SparkEntry.queries.keys.toSeq.sorted.filter(_.matches(pattern))
    for (name <- names; rep <- 1 to reps) {
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"$name#$rep")
      reset()
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[extra] $name FAILED: $e"); false
      }
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; give the bus a moment
      // (diagnostic-grade counters — heavy entries may still undercount
      // a tail of events; cross-check vs stage manifests for any number
      // that matters)
      Thread.sleep(500)
      println(f"EXTRA $name rep=$rep ok=$ok wall=$wall%.3f jobs=${jobs.get}" +
        f" stages=${stages.get} tasks=${tasks.get}" +
        f" taskTime=${taskTimeMs.get / 1000.0}%.2f shufR=${shufR.get}" +
        f" shufW=${shufW.get} input=${input.get}")
    }
    spark.stop()
  }
}
