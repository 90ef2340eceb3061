package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Versioned snapshot manifests for a streaming index root — the
  * Iceberg-shaped commit protocol SURVEY §7.0 promised (no Iceberg runtime
  * jar ships in this environment, so the shape is implemented directly):
  *
  *   - every searchable-set change (a completed batch delta, a completed
  *     compaction) publishes `manifests/v_<N>` — a one-file, atomically
  *     renamed list of the dirs a reader should open;
  *   - readers ([[StreamingIngest.openUnion]]) resolve the LATEST version
  *     once and pin it: a concurrent compaction only ever ADDS new dirs
  *     and new manifest versions, so a pinned reader keeps seeing its
  *     snapshot — pre- or post-compaction answers, never an error or a
  *     mix (StreamingSpec locks this);
  *   - [[gc]] expires superseded snapshots after a grace period and then
  *     deletes index dirs no remaining manifest references — the piece
  *     that keeps an UNBOUNDED stream's storage bounded (without it,
  *     every covered delta lives forever). The grace period is the
  *     reader-duration contract, exactly like Iceberg's snapshot
  *     expiration: a reader must finish within `graceMs` of pinning.
  *
  * Manifest files store dirs relative to the root (one per line, batch-id
  * order), so a relocated root stays readable. Versions are monotonically
  * increasing; the atomic no-overwrite rename resolves racing writers by
  * bumping to the next free version.
  */
object SnapshotManifest {

  final case class Snapshot(version: Long, dirs: Seq[String], mtimeMs: Long)

  private def manifestsPath(rootDir: String) = new Path(rootDir, "manifests")

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versions(spark: SparkSession, rootDir: String): Seq[(Long, Path)] = {
    val dir = manifestsPath(rootDir)
    val f = fs(spark, dir)
    if (!f.exists(dir)) return Nil
    f.listStatus(dir).toSeq.map(_.getPath)
      .flatMap { p =>
        val n = p.getName
        if (n.startsWith("v_")) n.stripPrefix("v_").toLongOption.map(_ -> p)
        else None // temp files and strangers are ignored
      }.sortBy(_._1)
  }

  private def read(spark: SparkSession, p: Path, rootDir: String): Snapshot = {
    val f = fs(spark, p)
    val in = f.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val rel = text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    Snapshot(p.getName.stripPrefix("v_").toLong,
      rel.map(r => s"$rootDir/$r"),
      f.getFileStatus(p).getModificationTime)
  }

  /** Latest published snapshot, or None when the root predates manifests
    * (readers fall back to the directory-listing resolution).
    */
  def latest(spark: SparkSession, rootDir: String): Option[Snapshot] =
    versions(spark, rootDir).lastOption.map { case (_, p) =>
      read(spark, p, rootDir)
    }

  /** Publish the next manifest version listing `dirs` (absolute paths under
    * `rootDir`; stored relative). Atomic: written to a dot-temp file and
    * renamed; a rename refused by an existing target (a racing writer won
    * the version) retries at the next number. Returns the version.
    */
  def publish(spark: SparkSession, rootDir: String, dirs: Seq[String]): Long = {
    val dir = manifestsPath(rootDir)
    val f = fs(spark, dir)
    f.mkdirs(dir)
    // structural relativization (last two components: "batches/batch_N" /
    // "compacted/upto_N") — robust to scheme-qualified listing paths
    val rel = dirs.map { d =>
      val p = new Path(d)
      s"${p.getParent.getName}/${p.getName}"
    }
    val body = rel.mkString("", "\n", "\n").getBytes("UTF-8")
    var v = versions(spark, rootDir).lastOption.map(_._1 + 1).getOrElse(1L)
    var done = false
    while (!done) {
      val tmp = new Path(dir, s".tmp_v_${v}_${System.nanoTime()}")
      val out = f.create(tmp, false)
      try out.write(body) finally out.close()
      if (f.rename(tmp, new Path(dir, s"v_$v"))) done = true
      else { f.delete(tmp, false); v += 1 } // lost the race: next version
    }
    v
  }

  /** Expire superseded manifests older than `graceMs`, then delete index
    * dirs under `rootDir` that (a) no surviving manifest references,
    * (b) are COVERED — batch id ≤ the latest snapshot's compaction
    * watermark, or a compaction older than it — so a just-completed batch
    * that no manifest lists yet is never touched, and (c) are themselves
    * older than the grace period. No-ops unless a latest manifest exists
    * and it references a compaction. Returns the deleted paths.
    */
  def gc(spark: SparkSession, rootDir: String, graceMs: Long): Seq[String] = {
    val all = versions(spark, rootDir)
    if (all.isEmpty) return Nil
    val now = System.currentTimeMillis()
    val latestV = all.last._1
    val f = fs(spark, manifestsPath(rootDir))
    // 1. expire superseded manifests past the grace period
    val (dead, kept) = all.partition { case (v, p) =>
      v != latestV && now - f.getFileStatus(p).getModificationTime > graceMs
    }
    dead.foreach { case (_, p) => f.delete(p, false) }
    // 2. the latest snapshot's compaction watermark: nothing is deletable
    //    until a compaction covers it
    val latestSnap = read(spark, all.last._2, rootDir)
    val uptoOpt = latestSnap.dirs
      .map(d => new Path(d).getName)
      .collect { case n if n.startsWith("upto_") => n.stripPrefix("upto_").toLong }
      .sorted.lastOption
    if (uptoOpt.isEmpty) return Nil
    val upto = uptoOpt.get
    val referenced: Set[String] =
      kept.map(_._2).flatMap(p => read(spark, p, rootDir).dirs).toSet
    // 3. delete covered, unreferenced, grace-aged dirs
    def aged(p: Path): Boolean =
      now - f.getFileStatus(p).getModificationTime > graceMs
    val batchRoot = new Path(s"$rootDir/batches")
    val compRoot = new Path(s"$rootDir/compacted")
    val victims = Seq.newBuilder[Path]
    if (f.exists(batchRoot))
      f.listStatus(batchRoot).foreach { st =>
        val n = st.getPath.getName
        val id = if (n.startsWith("batch_")) n.stripPrefix("batch_").toLongOption else None
        if (id.exists(_ <= upto) && !referenced(st.getPath.toString) &&
            !referenced(s"$rootDir/batches/$n") && aged(st.getPath))
          victims += st.getPath
      }
    if (f.exists(compRoot))
      f.listStatus(compRoot).foreach { st =>
        val n = st.getPath.getName
        val id = if (n.startsWith("upto_")) n.stripPrefix("upto_").toLongOption else None
        if (id.exists(_ < upto) && !referenced(st.getPath.toString) &&
            !referenced(s"$rootDir/compacted/$n") && aged(st.getPath))
          victims += st.getPath
      }
    victims.result().map { p => f.delete(p, true); p.toString }
  }
}
