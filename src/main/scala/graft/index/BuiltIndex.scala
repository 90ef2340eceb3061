package graft.index

import graft.analysis.AnalyzerConfig
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.Properties

/** Handle on a persisted index directory — the engine-side analog of
  * `DirectoryReader.open(FSDirectory)` (`BatchSearch.java:181-184`). The
  * index config (analyzer chain, bucket fan-out) is persisted alongside the
  * tables so the query path reconstructs the exact same analyzer by
  * construction — the reference allows an analyzer mismatch between index
  * and query time (`SearchFiles.java:76-89` hardcodes a different analyzer),
  * a failure mode this design rules out.
  */
class BuiltIndex(val spark: SparkSession, val dir: String, val cfg: IndexConfig) {
  import IndexLayout._

  /** Identity of the index's IMMUTABLE statistics surface, used to share
    * per-term stat memos across handles (r6): delete overlays keep the
    * pre-delete df/cf by contract, so an overlay shares its parent's key;
    * a union's stats are the union of its branch dirs.
    */
  def statsKey: String = s"$dir|${cfg.id}"

  // Table handles memoized per handle (r6 optimization): an index snapshot
  // directory is immutable (mutation mints a new snapshot/overlay handle —
  // see withDeletes/purge), so re-running spark.read.parquet on every
  // access only repeated the file listing + footer schema read. A search
  // touches postings/termStats/docs several times; entries run hundreds of
  // searches per session. Plans built from one cached DataFrame are
  // unchanged — this removes driver-side metadata work only.
  private lazy val docsDF = spark.read.parquet(s"$dir/$DocsDir")
  private lazy val postingsDF = spark.read.parquet(s"$dir/$PostingsDir")
  private lazy val termStatsDF = spark.read.parquet(s"$dir/$TermStatsDir")

  def docs: DataFrame = docsDF
  def postings: DataFrame = postingsDF
  def termStats: DataFrame = termStatsDF

  /** Postings view for paths that never read positions (scoring, WAND,
    * counting, negation): the position columns are replaced by empty
    * literals ABOVE the scan, so Catalyst prunes `pos_blob` /
    * `block_pos_off` out of the parquet read entirely. On a
    * positions-enabled index `pos_blob` is the largest column (~one
    * varint per TOKEN vs ~one per POSTING for doc/tf/dl), so a pure BM25
    * query would otherwise pay the whole positions column in scan bytes.
    * Field order matches [[PostingRun]], so `.as[PostingRun]` binds
    * unchanged; defined via [[postings]] so [[graft.streaming.UnionIndex]]'s
    * override flows through.
    */
  def postingsScoring: DataFrame = {
    import org.apache.spark.sql.functions.typedLit
    postings.withColumns(Map(
      "pos_blob" -> typedLit(Array.empty[Byte]),
      "block_pos_off" -> typedLit(Array.empty[Int])))
  }

  /** Narrower still: also blanks the per-run extrema and the block
    * metadata arrays for paths that sequentially decode whole runs
    * (plain scoring, expansion, blended, negation, WAND seed, match
    * counting) — they touch only term/ndocs and the doc/tf/dl blobs.
    * The WAND main pass keeps [[postingsScoring]]: block metadata is
    * exactly what it skips on. Worth a further ~28% of the
    * post-[[postingsScoring]] scan bytes on the sf0.01 oracle index
    * (17.4 points of the full-schema total, parquet column metadata).
    */
  def postingsDecode: DataFrame = {
    import org.apache.spark.sql.functions.typedLit
    postingsScoring.withColumns(Map(
      "first_docid" -> typedLit(0L),
      "last_docid" -> typedLit(0L),
      "max_tf" -> typedLit(0),
      "sum_tf" -> typedLit(0L),
      "block_last_docid" -> typedLit(Array.empty[Long]),
      "block_max_tf" -> typedLit(Array.empty[Int]),
      "block_min_dl" -> typedLit(Array.empty[Int]),
      "block_doc_off" -> typedLit(Array.empty[Int]),
      "block_tf_off" -> typedLit(Array.empty[Int]),
      "block_dl_off" -> typedLit(Array.empty[Int])))
  }

  /** Narrowest postings view: docid runs only — match-counting paths
    * (facet counts, attribute-filter membership) blank the tf/dl blobs on
    * top of [[postingsDecode]], so the parquet scan reads term/ndocs and
    * `doc_blob` alone.
    */
  def postingsMatch: DataFrame = {
    import org.apache.spark.sql.functions.typedLit
    postingsDecode.withColumns(Map(
      "tf_blob" -> typedLit(Array.empty[Byte]),
      "dl_blob" -> typedLit(Array.empty[Byte])))
  }

  /** Sorted (term, len) vocabulary projection for prunable prefix/fuzzy
    * expansion; indexes written before the projection existed fall back to
    * a derived (unprunable) view so they stay openable.
    */
  private lazy val vocabDF: DataFrame = {
    val p = new Path(s"$dir/$VocabDir")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(s"$dir/$VocabDir")
    else termStats.select(org.apache.spark.sql.functions.col("term"),
      org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("term")).as("len"))
  }

  def vocab: DataFrame = vocabDF

  lazy val stats: StatsRow = {
    val r = spark.read.parquet(s"$dir/$StatsDir").head()
    StatsRow(r.getAs[Long]("max_doc"), r.getAs[Long]("sum_total_term_freq"))
  }

  /** Equality-delete dirs applied to this index at query time: the
    * index's own `deletes/` subdir when present (in-place deletes, ≙
    * Lucene `.del` generations) plus any overlays attached via
    * [[withDeletes]] (deletes over a shared immutable snapshot, ≙
    * Iceberg-v2 delete files referenced by a newer snapshot).
    */
  def deleteDirs: Seq[String] = {
    val own = new Path(s"$dir/$DeletesDir")
    val fs = own.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(own)) Seq(own.toString) else Nil
  }

  /** Sorted tombstoned docids from [[deleteDirs]]; empty = no deletes.
    * Loaded once per handle — an index snapshot is immutable, and a new
    * delete batch is a new snapshot ([[withDeletes]] returns a fresh
    * handle).
    */
  lazy val tombstones: Array[Long] = Deletes.load(spark, deleteDirs)

  /** This index with an external equality-delete overlay attached — the
    * underlying snapshot (and any sibling handles) stay delete-free.
    */
  def withDeletes(overlayDir: String): BuiltIndex =
    new DeleteOverlayIndex(this, Seq(overlayDir))

  /** Ascending grp partition values of the docs table, read from the
    * directory listing alone (driver-side metadata, no Spark job). grp is
    * the docid's high bits (`docid >> (groupShift + mergeShift)` — the
    * same derivation the docno-attach join prunes on), so ascending grp
    * values are disjoint ascending docid ranges: the invariant the
    * searcher's k-bounded match-all complement scan terminates on.
    */
  def docGrps: Seq[Long] = BuiltIndex.listGrps(spark, s"$dir/$DocsDir")
}

object BuiltIndex {
  private val PropsFile = IndexLayout.PropsFile

  /** grp partition values under one docs directory, sorted ascending. */
  private[graft] def listGrps(spark: SparkSession, docsDir: String): Seq[Long] = {
    val p = new Path(docsDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).iterator
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("grp="))
      .map(_.stripPrefix("grp=").toLong)
      .toSeq.sorted
  }

  def writeProps(spark: SparkSession, dir: String, cfg: IndexConfig): Unit = {
    val p = new Properties()
    p.setProperty("tokenizer", cfg.analyzer.tokenizer)
    p.setProperty("stemmer", cfg.analyzer.stemmer)
    p.setProperty("stopWords", cfg.analyzer.stopWords.toSeq.sorted.mkString(" "))
    p.setProperty("buckets", cfg.buckets.toString)
    p.setProperty("groupShift", cfg.groupShift.toString)
    p.setProperty("mergeShift", cfg.mergeShift.toString)
    p.setProperty("indexPositions", cfg.indexPositions.toString)
    val out = new ByteArrayOutputStream()
    p.store(out, "graft index config")
    val path = new Path(dir, PropsFile)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = fs.create(path, true)
    try o.write(out.toByteArray)
    finally o.close()
  }

  /** Open an existing index, reconstructing its config from disk. */
  def open(spark: SparkSession, dir: String): BuiltIndex = {
    val path = new Path(dir, PropsFile)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    val bytes = try in.readAllBytes() finally in.close()
    val p = new Properties()
    p.load(new ByteArrayInputStream(bytes))
    val stop = Option(p.getProperty("stopWords")).getOrElse("").trim
    val cfg = IndexConfig(
      analyzer = AnalyzerConfig(
        tokenizer = p.getProperty("tokenizer", "whitespace"),
        stopWords = if (stop.isEmpty) Set.empty else stop.split("\\s+").toSet,
        stemmer = p.getProperty("stemmer", "none")),
      buckets = p.getProperty("buckets", "64").toInt,
      groupShift = p.getProperty("groupShift", "18").toInt,
      mergeShift = p.getProperty("mergeShift", "4").toInt,
      indexPositions = p.getProperty("indexPositions", "false").toBoolean)
    new BuiltIndex(spark, dir, cfg)
  }
}
