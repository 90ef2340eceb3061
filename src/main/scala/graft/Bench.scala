package graft

import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.Searcher
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): prints ONE JSON line with total
  * seconds plus per-query seconds, and the scale-relevant extras —
  * index-build throughput (docs/sec) and BM25 query latency p50/p95 —
  * the metrics BASELINE.md targets. Run at two parallelism levels
  * (SPARK_GRAFT_CPUS=8 vs 32) on the same input to evidence the north
  * rule's N-vs-4N scaling efficiency (see BENCH.md).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toString.toInt * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    // ---- index-build throughput (fresh build, no checkpoint reuse) -------
    // Corpus: lineitem-derived (scales with sf — the documents table is the
    // small correctness fixture, see TESTDATA.md row counts).
    val safeSf = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    val benchIdxDir = s"${Engine.workDir}/bench_${safeSf}_c$cpus"
    deleteRecursively(spark, benchIdxDir)
    val mult = sys.env.getOrElse("SPARK_GRAFT_BENCH_MULT", "4").toInt
    // persist: the derived corpus feeds both the fingerprint scan and the
    // tokenize stage — at bench scale recomputing the lineitem aggregation
    // twice would just measure Spark twice. Repartition first: the explode
    // replication otherwise leaves ~6 AQE-coalesced fat blocks that cap
    // input-stage parallelism (see ScalingCluster).
    val corpus = Corpus.replicated(Corpus.fromLineitem(spark, sfDir), mult)
      .repartition(cpus.toInt * 4)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val nDocs = corpus.count()
    val tBuild0 = System.nanoTime()
    val idx = IndexBuilder.build(corpus, benchIdxDir,
      IndexConfig(analyzer = Engine.OracleAnalyzer, fingerprint = "none"), verifySha = false)
    val buildSec = secs(tBuild0)
    val docsPerSec = nDocs / buildSec
    corpus.unpersist()

    // ---- BM25 query latency over the fixed topic batch -------------------
    val benchTopics = Corpus.LineitemTopics.map { case (q, t) => graft.search.Topic(q, t) }
    val searcher = new Searcher(idx)
    // warm-up (JIT + parquet footer caches)
    searcher.search(benchTopics, SparkEntry.TopK).count()
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val lat = (1 to reps).flatMap { _ =>
      benchTopics.map { t =>
        val t0 = System.nanoTime()
        searcher.search(Seq(t), 1000).count()
        secs(t0)
      }
    }.sorted
    def pct(p: Double): Double = lat((p * (lat.size - 1)).round.toInt)
    val p50 = pct(0.50)
    val p95 = pct(0.95)

    // ---- per-SparkEntry-query timings -------------------------------------
    // Two passes: the FIRST pays one-time engine-cache effects (oracle/
    // porter/stream index builds and JIT) on whichever entries trigger
    // them; "queries" reports the per-entry BEST of the two (steady-state
    // query cost, robust to the measured 8× VM noise — BENCH.md §method),
    // "queries_cold" keeps pass 1 so build attribution stays visible.
    def pass(): Seq[(String, Double, Boolean)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        // a failed entry must not kill the leg, but it must be VISIBLE in
        // the JSON the driver reads, not just on stderr — its fail-fast
        // elapsed time is published as -1, never as a legitimate (and
        // flattering) measurement
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            false
        }
        (name, secs(t0), ok)
      }
    val cold = pass()
    val warm = pass()
    val failed = (cold ++ warm).filterNot(_._3).map(_._1).distinct.sorted
    val coldPub = cold.map { case (n, s, ok) => n -> (if (ok) s else -1.0) }
    // an entry that failed in EITHER pass is suspect: its surviving pass
    // may have skipped the failed work, so best is marked -1 too
    val best = cold.zip(warm).map { case ((n, a, okA), (_, b, okB)) =>
      n -> (if (okA && okB) math.min(a, b) else -1.0)
    }
    def fmt(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = buildSec + lat.sum + cold.collect { case (_, s, true) => s }.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${fmt(best)},""" +
      s""""queries_cold":${fmt(coldPub)},"sf":"$sfDir",""" +
      failed.map("\"" + _ + "\"").mkString("\"failed\":[", ",", "],") +
      s""""cpus":$cpus,"n_docs":$nDocs,"build_sec":$buildSec,""" +
      s""""docs_per_sec":$docsPerSec,"search_p50_sec":$p50,"search_p95_sec":$p95}"""
    // the metrics file survives even if a log line swallows stdout
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench_last.json"), json)
    spark.stop()
    // LAST stdout line, after spark.stop() so no executor log can trail it
    println(json)
    System.out.flush()
  }

  private def deleteRecursively(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
