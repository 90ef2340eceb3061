package graft.tools

import graft.analysis.{Analyzer, AnalyzerConfig}
import java.security.MessageDigest
import java.util.concurrent.{Callable, Executors, TimeUnit}

/** JVM-thread scalability probe: the engine's per-row work (analyze +
  * sha256 + tf map) run on 8 vs 32 threads in one JVM — separates
  * allocator/GC contention from Spark-framework and VM effects.
  * Run: sbt "runMain graft.tools.CpuProbe"
  */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val doc = (1 to 40).map(i => s"word${i % 17} token$i flagR part${i % 7}").mkString(" ")
    val docsPerTask = 20000
    for (threads <- Seq(8, 32, 8, 32)) {
      val pool = Executors.newFixedThreadPool(threads)
      val nTasks = threads * 4
      val t0 = System.nanoTime()
      val tasks = (1 to nTasks).map { _ =>
        new Callable[Long] {
          def call(): Long = {
            val an = new Analyzer(AnalyzerConfig(stopWords = Set("a", "the")))
            val md = MessageDigest.getInstance("SHA-256")
            var acc = 0L
            var i = 0
            while (i < docsPerTask) {
              val (tfs, dl) = an.termFreqs(doc)
              md.reset()
              acc += md.digest(doc.getBytes("UTF-8"))(0) + tfs.length + dl
              i += 1
            }
            acc
          }
        }
      }
      import scala.jdk.CollectionConverters._
      pool.invokeAll(tasks.asJava).asScala.foreach(_.get())
      pool.shutdown()
      pool.awaitTermination(10, TimeUnit.MINUTES)
      val secs = (System.nanoTime() - t0) / 1e9
      val docsPerSec = nTasks.toLong * docsPerTask / secs
      println(f"CPUPROBE threads=$threads wall=$secs%.2fs docs_per_sec=$docsPerSec%.0f")
    }
  }
}
