package graft.tools

import graft.Engine
import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Searcher, Topic}
import org.apache.spark.sql.SparkSession

/** Strong-scaling measurement in the PER-EXECUTOR-JVM regime: the same
  * index build + query batch on `local-cluster[1,8,m]` (N = 1 executor × 8
  * cores) vs `local-cluster[4,8,m]` (4N), i.e. real separate executor JVM
  * processes with netty shuffle between them — the closest this sandbox
  * gets to the north rule's "N and 4N executor clusters" (a single-JVM
  * `local[n]` master shares one heap/GC/allocator across all task threads
  * and under-reports scaling; BENCH.md r1 measured the ladder
  * 0.81 separate-process / 0.69 one-JVM-threads / 0.47 full-Spark-local).
  *
  * Levels run interleaved, best-of-`rounds` per level (VM CPU delivery
  * fluctuates up to 3.5× — see BENCH.md "Methodology").
  *
  * Run: SPARK_HOME=/opt/spark sbt "runMain graft.tools.ScalingCluster [sfDir] [mult] [rounds]"
  */
object ScalingCluster {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(8)
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)
    val levels = Seq(1, 4) // executors × 8 cores each
    val classesDir = "/root/repo/target/scala-2.13/classes"
    val results = scala.collection.mutable.Map[Int, List[Double]]()
      .withDefaultValue(Nil)

    for (r <- 1 to rounds; workers <- levels) {
      val cores = workers * 8
      // NOTE: in standalone/local-cluster mode spark.local.dir is overridden
      // by the cluster manager — executor shuffle dirs come from the
      // SPARK_LOCAL_DIRS env var of the worker process (inherited from this
      // JVM), so the launcher must export SPARK_LOCAL_DIRS=/dev/shm/... for
      // tmpfs shuffle (the single virtual disk serializes I/O otherwise).
      val spark = SparkSession.builder()
        .master(s"local-cluster[$workers,8,16384]")
        .appName(s"graft-cluster-w$workers-r$r")
        .config("spark.executor.memory", "12g")
        .config("spark.executor.extraClassPath", classesDir)
        .config("spark.sql.shuffle.partitions", (cores * 4).toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.locality.wait", "0s")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val dir = s"${Engine.workDir}/cluster_w${workers}_r$r"
      deleteRecursively(spark, dir)
      val corpus = Corpus.replicated(Corpus.fromLineitem(spark, sfDir), mult)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val n = corpus.count()
      val t0 = System.nanoTime()
      val idx = IndexBuilder.build(corpus, dir,
        IndexConfig(analyzer = Engine.OracleAnalyzer, fingerprint = "none"),
        verifySha = false)
      val buildSec = (System.nanoTime() - t0) / 1e9
      corpus.unpersist()
      val searcher = new Searcher(idx)
      val topics = Corpus.LineitemTopics.map { case (q, t) => Topic(q, t) }
      searcher.search(topics, 1000).count() // warm
      val tq0 = System.nanoTime()
      searcher.search(topics, 1000).count()
      val batchSec = (System.nanoTime() - tq0) / 1e9
      val tput = n / buildSec
      results(workers) = tput :: results(workers)
      println(f"SCALING-CLUSTER round=$r workers=$workers cores=$cores n=$n " +
        f"build=${buildSec}%.1fs docs_per_sec=${tput}%.0f query_batch=${batchSec}%.2fs")
      deleteRecursively(spark, dir)
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    val best1 = results(1).max
    val best4 = results(4).max
    val eff = best4 / (4.0 * best1)
    println(f"""{"scaling_cluster":{"docs_per_sec_1x8":$best1%.0f,"docs_per_sec_4x8":$best4%.0f,"efficiency_Nx_to_4Nx":$eff%.3f,"rounds":$rounds,"mult":$mult}}""")
  }

  private def deleteRecursively(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
