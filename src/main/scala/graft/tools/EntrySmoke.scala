package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's smoke check: default-config session →
  * `SparkEntry.entry` → rows > 0. Run: sbt "runMain graft.tools.EntrySmoke"
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY rows=$n cols=${df.columns.mkString(",")}")
    require(n > 0, "entry() returned no rows")
    spark.stop()
  }
}
