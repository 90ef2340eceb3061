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
  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val docno = concat(lit("doc-"), lpad(col("doc_id").cast("string"), 8, "0"))
    docs.select(
      docno.as("docno"),
      col("source").as("repo"),
      concat(col("lang"), lit("/"), col("doc_id").cast("string"), lit(".txt")).as("path"),
      md5(docno).as("commit"),
      col("lang"),
      col("text").as("content"))
  }

  /** The same docno/commit derivation as SQL text, for oracle queries. */
  val DocnoSql = "concat('doc-', lpad(cast(doc_id as varchar), 8, '0'))"
}
