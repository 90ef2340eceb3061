package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus table constructors. The engine's input contract is the north-rule
  * shape — (repo, path, commit, lang, content) plus the derived unique key
  * `docno` (≙ the reference's stored `docno` StringField,
  * `FileParser.java:158,203,279`).
  */
object Corpus {

  /** Derive the north-rule corpus deterministically from the driver's
    * synthetic `documents` table (TESTDATA.md): one document row = one
    * corpus file. Every expression here is mirrored 1:1 by the DuckDB
    * oracle SQL in [[graft.SparkEntry.oracleSql]].
    */
  // memoized per (session, dir) — r6: fixture dirs are immutable per JVM
  // (see Engine's caching contract), and ~60 entries re-derived this
  // projection, each paying a fresh file listing + footer schema read
  private val docsCache =
    new scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()

  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    docsCache.getOrElseUpdate((spark, sfDir), {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val docno = concat(lit("doc-"), lpad(col("doc_id").cast("string"), 8, "0"))
      docs.select(
        docno.as("docno"),
        col("source").as("repo"),
        concat(col("lang"), lit("/"), col("doc_id").cast("string"), lit(".txt")).as("path"),
        md5(docno).as("commit"),
        col("lang"),
        col("text").as("content"))
    })

  /** The same docno/commit derivation as SQL text, for oracle queries. */
  val DocnoSql = "concat('doc-', lpad(cast(doc_id as varchar), 8, '0'))"

  /** Benchmark-scale corpus derived deterministically from the seeded TPC-H
    * lineitem table (FIXTURES.md §1): one order = one document, content =
    * per-line pseudo-words in linenumber order. The word construction gives
    * a naturally skewed df distribution — `flag*`/`status*` are hot
    * (stop-like, df ≈ N, exercising the skew path), `part*`/`supp*` are
    * mid-frequency, `qty*`/`price*`/month combinations are rare — while the
    * `documents`-based corpus stays the (small) correctness fixture.
    * No randomness: every value is a pure function of the input rows.
    */
  def fromLineitem(spark: SparkSession, sfDir: String): DataFrame = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val line = concat_ws(" ",
      concat(lit("flag"), col("l_returnflag")),
      concat(lit("status"), col("l_linestatus")),
      concat(lit("part"), pmod(col("l_partkey"), lit(2000))),
      concat(lit("supp"), pmod(col("l_suppkey"), lit(500))),
      concat(lit("qty"), col("l_quantity").cast("int")),
      concat(lit("price"), (col("l_extendedprice") / 100).cast("int")),
      date_format(col("l_shipdate"), "'m'yyyyMM"))
    val docno = concat(lit("o"), lpad(col("l_orderkey").cast("string"), 10, "0"))
    li.select(col("l_orderkey"), col("l_linenumber"), line.as("line"))
      .groupBy(col("l_orderkey"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("l_linenumber"), col("line")))),
          x => x.getField("line")), " ").as("content"))
      .select(
        docno.as("docno"),
        concat(lit("tpch/"), pmod(col("l_orderkey"), lit(100))).as("repo"),
        concat(lit("orders/"), col("l_orderkey"), lit(".txt")).as("path"),
        md5(docno).as("commit"),
        lit("txt").as("lang"),
        col("content"))
  }

  /** Deterministically replicate a corpus `copies` times (docnos prefixed
    * per copy) — bench-scale amplification so strong-scaling measurements
    * aren't dominated by fixed job overhead. Content distribution (and thus
    * df skew, posting sizes) is preserved.
    */
  def replicated(corpus: DataFrame, copies: Int): DataFrame =
    if (copies <= 1) corpus
    else corpus
      .withColumn("cp", explode(sequence(lit(0), lit(copies - 1))))
      .withColumn("docno", concat(col("cp"), lit("-"), col("docno")))
      .drop("cp")

  /** Fixed topic set over the lineitem-corpus vocabulary: hot, mid and
    * rare terms mixed, for latency benchmarking.
    */
  val LineitemTopics: Seq[(String, String)] = Seq(
    "b1" -> "flagR statusF",
    "b2" -> "part100 supp42",
    "b3" -> "qty30 price250 m199603",
    "b4" -> "flagN part7 part8 part9",
    "b5" -> "supp499 qty1 m199801",
    "b6" -> "price110 price111 part1999")
}
