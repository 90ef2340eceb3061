package graft

import graft.analysis.AnalyzerConfig
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Searcher, Topic}
import graft.streaming.StreamingIngest
import org.scalatest.funsuite.AnyFunSuite

/** Structured-Streaming ingest: file-source micro-batches become delta
  * indexes; search over the union is FLOAT-IDENTICAL to a monolithic batch
  * build of the same rows; a restarted stream picks up only new files.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val batch1 = Seq(
    "s-01" -> "spark streams process data continuously",
    "s-02" -> "batch jobs process data at rest",
    "s-03" -> "data pipelines move data between systems")
  private val batch2 = Seq(
    "s-04" -> "streams and batches unify in one engine",
    "s-05" -> "process everything incrementally with streams")
  private val batch3 = Seq(
    "s-06" -> "late arriving data joins the index too")

  private val cfg = IndexConfig(
    analyzer = AnalyzerConfig(stopWords = Set("the", "and", "at", "in", "with")),
    groupShift = 1, mergeShift = 1, fingerprint = "none")

  private def writeFile(dir: String, name: String, rows: Seq[(String, String)]): Unit = {
    import spark.implicits._
    // one file per batch: write to a scratch dir, move the part file in
    val tmp = TestSpark.tmpDir("streamfile")
    rows.toDF("docno", "content").coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val part = fs.globStatus(new org.apache.hadoop.fs.Path(s"$tmp/part-*.parquet")).head.getPath
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/$name"))
  }

  test("streamed delta indexes union to the exact monolithic-build ranking") {
    import spark.implicits._
    val src = TestSpark.tmpDir("stream-src")
    val root = TestSpark.tmpDir("stream-root")
    writeFile(src, "b1.parquet", batch1)
    writeFile(src, "b2.parquet", batch2)

    val q = StreamingIngest.start(spark, src, root, cfg)
    q.awaitTermination()

    val union = StreamingIngest.openUnion(spark, root)
    assert(union.dirs.size == 2) // maxFilesPerTrigger=1 → one delta per file
    assert(union.stats.max_doc == 5)

    val topics = Seq(Topic("1", "process data streams"), Topic("2", "batch engine"))
    val streamed = new Searcher(union).search(topics, 10)
      .collect().sortBy(r => (r.qid, r.rank))
      .map(r => (r.qid, r.docno, r.rank, r.score)).toSeq

    val mono = IndexBuilder.build((batch1 ++ batch2).toDF("docno", "content"),
      TestSpark.tmpDir("stream-mono"), cfg)
    val batch = new Searcher(mono).search(topics, 10)
      .collect().sortBy(r => (r.qid, r.rank))
      .map(r => (r.qid, r.docno, r.rank, r.score)).toSeq

    assert(streamed == batch) // ranks AND float scores identical

    // restart: only the NEW file becomes a batch
    writeFile(src, "b3.parquet", batch3)
    val q2 = StreamingIngest.start(spark, src, root, cfg)
    q2.awaitTermination()
    val union2 = StreamingIngest.openUnion(spark, root)
    assert(union2.dirs.size == 3)
    assert(union2.stats.max_doc == 6)
    val late = new Searcher(union2).search(Seq(Topic("3", "late arriving")), 10)
      .collect().map(_.docno).toSet
    assert(late.contains("s-06"))

    // ---- epoch compaction (≙ Lucene background segment merges) ----------
    val allTopics = topics :+ Topic("3", "late arriving data")
    val pre = new Searcher(union2).search(allTopics, 10)
      .collect().sortBy(r => (r.qid, r.rank))
      .map(r => (r.qid, r.docno, r.rank, r.score)).toSeq
    val preRuns = union2.postings.count()
    assert(StreamingIngest.compact(spark, root).nonEmpty)
    val union3 = StreamingIngest.openUnion(spark, root)
    assert(union3.dirs.size == 1) // (a) fewer dirs: 3 deltas → 1 compacted
    assert(union3.stats.max_doc == 6)
    val post = new Searcher(union3).search(allTopics, 10)
      .collect().sortBy(r => (r.qid, r.rank))
      .map(r => (r.qid, r.docno, r.rank, r.score)).toSeq
    assert(post == pre) // (b) ranks AND float scores identical pre/post
    // cross-epoch runs genuinely merged, not just relocated
    assert(union3.postings.count() < preRuns)

    // a post-compaction batch lands NEXT TO the compaction, not inside it
    writeFile(src, "b4.parquet",
      Seq("s-07" -> "compaction keeps streamed data searchable"))
    val q3 = StreamingIngest.start(spark, src, root, cfg)
    q3.awaitTermination()
    val union4 = StreamingIngest.openUnion(spark, root)
    assert(union4.dirs.size == 2) // compacted + the new delta
    assert(union4.stats.max_doc == 7)
    val fresh = new Searcher(union4)
      .search(Seq(Topic("4", "compaction searchable")), 10)
      .collect().map(_.docno).toSet
    assert(fresh.contains("s-07"))
    // compacting again folds the straggler in
    assert(StreamingIngest.compact(spark, root).nonEmpty)
    val union5 = StreamingIngest.openUnion(spark, root)
    assert(union5.dirs.size == 1)
    assert(union5.stats.max_doc == 7)
  }

  test("snapshot isolation: a pinned reader survives concurrent compaction " +
    "and grace-period GC; expired dirs are reclaimed") {
    import spark.implicits._
    import graft.streaming.SnapshotManifest
    val root = TestSpark.tmpDir("snap-root")
    StreamingIngest.ingestBatch(batch1.toDF("docno", "content"), 0, root, cfg)
    StreamingIngest.ingestBatch(batch2.toDF("docno", "content"), 1, root, cfg)
    StreamingIngest.ingestBatch(batch3.toDF("docno", "content"), 2, root, cfg)

    val topics = Seq(Topic("1", "process data streams"), Topic("2", "batch engine"))
    def run(u: graft.streaming.UnionIndex) = new Searcher(u).search(topics, 10)
      .collect().sortBy(r => (r.qid, r.rank))
      .map(r => (r.qid, r.docno, r.rank, r.score)).toSeq

    // pin a reader on the pre-compaction snapshot (v3: three deltas)
    val pinned = StreamingIngest.openUnion(spark, root)
    assert(pinned.dirs.size == 3)
    val pre = run(pinned)

    // compact CONCURRENTLY with the pinned reader's lifetime, then GC with
    // a long grace: the pinned snapshot's dirs must survive
    assert(StreamingIngest.compact(spark, root).nonEmpty)
    assert(SnapshotManifest.gc(spark, root, graceMs = 60 * 60 * 1000L).isEmpty)
    val during = run(pinned) // re-runs the SAME pinned plan, post-compaction
    assert(during == pre, "pinned reader must keep its snapshot answer")

    // a NEW reader resolves the post-compaction manifest and agrees
    // float-identically (compaction preserves scores)
    val fresh = StreamingIngest.openUnion(spark, root)
    assert(fresh.dirs.size == 1)
    assert(run(fresh) == pre)

    // grace 0: superseded manifests expire, covered deltas are reclaimed —
    // bounded storage for an unbounded stream
    val deleted = SnapshotManifest.gc(spark, root, graceMs = 0L)
    assert(deleted.size == 3, s"expected the 3 covered deltas gone: $deleted")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    deleted.foreach(d =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(d)), s"$d not deleted"))
    // the latest manifest (and the compaction it references) still serve
    // readers — both the manifest path and the listing fallback
    val after = StreamingIngest.openUnion(spark, root)
    assert(after.dirs.size == 1)
    assert(run(after) == pre)
    assert(StreamingIngest.searchableDirs(spark, root)
      .map(_.stripPrefix("file:")) == after.dirs)

    // a batch newer than the compaction watermark is NEVER reclaimed, even
    // at grace 0 and before any manifest lists it
    StreamingIngest.ingestBatch(
      Seq("s-08" -> "straggler data").toDF("docno", "content"), 3, root, cfg)
    assert(SnapshotManifest.gc(spark, root, graceMs = 0L).isEmpty)
    assert(StreamingIngest.openUnion(spark, root).dirs.size == 2)
  }

  test("compactEvery wires periodic compaction into the stream itself") {
    val src = TestSpark.tmpDir("autocompact-src")
    val root = TestSpark.tmpDir("autocompact-root")
    writeFile(src, "c1.parquet", batch1)
    writeFile(src, "c2.parquet", batch2)
    writeFile(src, "c3.parquet", batch3)
    val q = StreamingIngest.start(spark, src, root, cfg, compactEvery = 2)
    q.awaitTermination()
    // batches 0,1,2: compaction fired after batch 1 → upto_1 + delta batch_2
    val dirs = StreamingIngest.searchableDirs(spark, root)
    assert(dirs.size == 2, dirs)
    assert(dirs.head.contains("upto_1") && dirs.last.contains("batch_2"), dirs)
    val union = StreamingIngest.openUnion(spark, root)
    assert(union.stats.max_doc == 6)
    val hit = new Searcher(union).search(Seq(Topic("1", "late arriving")), 10)
      .collect().map(_.docno).toSet
    assert(hit.contains("s-06"))
  }
}
