package graft.tools

import graft.Engine
import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Searcher, Topic}
import org.apache.spark.sql.SparkSession

/** Strong-scaling measurement: the SAME index build + query batch at two
  * parallelism levels (the sandbox stand-in for N vs 4N executor clusters,
  * per BASELINE.md). Levels are run INTERLEAVED within one process and the
  * best of `rounds` per level is reported — the sandbox VM's available CPU
  * fluctuates heavily run-to-run (hypervisor noise), and best-of-N pairs
  * taken minutes apart is the least-contaminated estimator.
  *
  * Run: sbt "runMain graft.tools.Scaling [sfDir] [mult] [rounds]"
  */
object Scaling {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(8)
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)
    val levels = Seq(8, 32)
    val results = scala.collection.mutable.Map[Int, List[(Double, Double)]]()
      .withDefaultValue(Nil)

    for (r <- 1 to rounds; cpus <- levels) {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(s"graft-scaling-c$cpus-r$r")
        .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
        .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val dir = s"${Engine.workDir}/scaling_c${cpus}_r$r"
      deleteRecursively(spark, dir)
      val corpus = Corpus.replicated(Corpus.fromLineitem(spark, sfDir), mult)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val n = corpus.count()
      val t0 = System.nanoTime()
      val idx = IndexBuilder.build(corpus, dir,
        IndexConfig(analyzer = Engine.OracleAnalyzer, fingerprint = "none"), verifySha = false)
      val buildSec = (System.nanoTime() - t0) / 1e9
      corpus.unpersist()
      val searcher = new Searcher(idx)
      val topics = Corpus.LineitemTopics.map { case (q, t) => Topic(q, t) }
      searcher.search(topics, 1000).count() // warm
      val tq0 = System.nanoTime()
      searcher.search(topics, 1000).count()
      val batchSec = (System.nanoTime() - tq0) / 1e9
      val tput = n / buildSec
      results(cpus) = (tput, batchSec) :: results(cpus)
      println(f"SCALING round=$r cpus=$cpus n=$n build=${buildSec}%.1fs " +
        f"docs_per_sec=${tput}%.0f query_batch=${batchSec}%.2fs")
      // per-stage breakdown from the checkpoint manifests
      for (st <- Seq(graft.index.IndexLayout.TokenizedDir, graft.index.IndexLayout.DocsDir,
          graft.index.IndexLayout.StatsDir, graft.index.IndexLayout.RunsDir,
          graft.index.IndexLayout.PostingsDir, graft.index.IndexLayout.TermStatsDir)) {
        val mf = java.nio.file.Paths.get(dir, st, "_graft_manifest.json")
        if (java.nio.file.Files.exists(mf)) {
          val txt = java.nio.file.Files.readString(mf)
          val wall = "\"wallMs\":(\\d+)".r.findFirstMatchIn(txt).map(_.group(1)).getOrElse("?")
          println(s"SCALING-STAGE cpus=$cpus round=$r $st ${wall}ms")
        }
      }
      deleteRecursively(spark, dir)
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    val best8 = results(8).map(_._1).max
    val best32 = results(32).map(_._1).max
    val eff = best32 / (4.0 * best8)
    println(f"""{"scaling":{"docs_per_sec_8c":$best8%.0f,"docs_per_sec_32c":$best32%.0f,"efficiency_8_to_32":$eff%.3f,"rounds":$rounds,"mult":$mult}}""")
  }

  private def deleteRecursively(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
