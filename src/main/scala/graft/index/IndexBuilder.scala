package graft.index

import graft.analysis.Analyzer
import graft.codec.{DecodedPosting, EncodedRun, PostingCodec}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.CollectionAccumulator

import java.security.MessageDigest

/** Corpus → inverted index: the Spark-native reimplementation of the
  * reference's `IndexTREC` lifecycle (`IndexTREC.java:94-141` +
  * `TrecAnalyzer` + Lucene's opaque segment write; SURVEY.md §3.1):
  *
  *   scan corpus table
  *     → deterministic docid assignment (range-sort by docno; ids packed
  *       (rangePartition << 40 | localIndex) so no global count barrier is
  *       needed and docid order ≡ docno order)
  *     → tokenize/tf/dl in one narrow pass (analyzer chain ≙ TrecAnalyzer)
  *     → checkpointed `stage_tokenized` (content dropped)
  *     → docs + stats tables
  *     → explode → shuffle on (term, docid-group) — the per-group docid
  *       bound keeps hot stop-like terms from skewing any reducer — →
  *       sorted, delta+varbyte-encoded posting runs ("segments")
  *     → merge adjacent runs into compacted postings (≙ Lucene's
  *       background segment merges)
  *     → per-term global stats.
  *
  * Every stage is atomic-published with a manifest ([[Checkpoint]]), so an
  * interrupted build resumes at the first incomplete stage instead of
  * recomputing (north rule).
  */
object IndexBuilder {
  import IndexLayout._

  /** Build (or resume building) an index at `dir` from `corpus`, which must
    * expose `docno` (unique string key) and `content` columns — north-rule
    * corpus rows map 1:1 to reference documents (`FileParser.java:157-164`).
    */
  def build(corpus: DataFrame, dir: String, cfg: IndexConfig,
            verifySha: Boolean = false): BuiltIndex = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val fp = fingerprint(corpus, cfg)
    val analyzer = new Analyzer(cfg.analyzer)
    var force = false

    // ---- stage: tokenized ------------------------------------------------
    val tokDir = s"$dir/$TokenizedDir"
    // Σdl per partition, accumulated alongside the row metrics so the stats
    // stage needs no table re-read (deduped by pid like the manifest — task
    // retries re-add and the last report wins).
    var freshDl: Option[Long] = None
    if (!Checkpoint.isComplete(tokDir, fp, cfg.id, conf)) {
      force = true
      val t0 = System.nanoTime()
      val acc = spark.sparkContext.collectionAccumulator[(Int, Long, Long)]("tokenized_parts")
      val dlAcc = spark.sparkContext.collectionAccumulator[(Int, Long)]("tokenized_dl")
      val parts = if (cfg.rangePartitions > 0) cfg.rangePartitions
                  else spark.sessionState.conf.numShufflePartitions
      // epoch-namespaced docids (streaming deltas) reserve bits 52+ for the
      // epoch, leaving 12 bits for the range-partition id — a larger build
      // must fail loudly, never silently collide docids across batches
      require(cfg.docidEpoch == 0 || parts <= (1 << 12),
        s"docidEpoch > 0 limits range partitions to 4096 (got $parts)")
      val sorted = corpus.select($"docno".cast("string"), $"content".cast("string"))
        .repartitionByRange(parts, $"docno")
        .sortWithinPartitions($"docno")
        .as[(String, String)]
      val tokenized = sorted.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val md = MessageDigest.getInstance("SHA-256")
        var idx = 0L
        var dlLocal = 0L
        var dlReported = false
        val epochBase = cfg.docidEpoch.toLong << 52
        val base = metered(it, acc, pid) { case (docno, content) =>
          val text = if (content == null) "" else content
          val docid = epochBase | (pid.toLong << 40) | idx
          idx += 1
          val terms =
            if (cfg.indexPositions) {
              val (tfs, d) = analyzer.termFreqsWithPositions(text)
              (tfs.map { case (t, f, ps) => TermTF(t, f, ps) }, d)
            } else {
              val (tfs, d) = analyzer.termFreqs(text)
              (tfs.map { case (t, f) => TermTF(t, f) }, d)
            }
          dlLocal += terms._2
          md.reset()
          val sha = hex(md.digest(text.getBytes("UTF-8")))
          (TokenizedDoc(docid, docno, sha, terms._2, terms._1),
            text.length.toLong)
        }
        new Iterator[TokenizedDoc] {
          def hasNext: Boolean = {
            val h = base.hasNext
            if (!h && !dlReported) { dlAcc.add((pid, dlLocal)); dlReported = true }
            h
          }
          def next(): TokenizedDoc = base.next()
        }
      }
      Checkpoint.atomically(tokDir, conf) { tmp =>
        tokenized.write.mode("overwrite").parquet(tmp)
      }
      publishManifest(tokDir, "tokenized", fp, cfg.id, acc, t0, conf)
      import scala.jdk.CollectionConverters._
      freshDl = Some(dlAcc.value.asScala.groupBy(_._1)
        .map { case (_, xs) => xs.last._2 }.sum)
    }
    val tokenized = spark.read.parquet(tokDir)
    // (pid, rows) lineage of the tokenize stage — docids are (pid<<40 | idx),
    // so downstream counts and the grp universe derive from it with no jobs
    val tokManifest = Checkpoint.readManifest(tokDir, conf)

    // ---- stage: docs -----------------------------------------------------
    val docsDir = s"$dir/$DocsDir"
    if (force || !Checkpoint.isComplete(docsDir, fp, cfg.id, conf)) {
      force = true
      val t0 = System.nanoTime()
      // Partitioned by coarse docid-range group so the query path's
      // docno-attach join on (docid, grp) dynamic-partition-prunes the doc
      // table instead of scanning all of it (critical at 10^12 rows);
      // sorted by docid within files for parquet min/max row-group skipping.
      Checkpoint.atomically(docsDir, conf) { tmp =>
        tokenized.select($"docid", $"docno", $"sha", $"dl")
          .withColumn("grp", shiftright($"docid", cfg.groupShift + cfg.mergeShift))
          .sortWithinPartitions($"grp", $"docid")
          .write.mode("overwrite").partitionBy("grp").parquet(tmp)
      }
      // row count = tokenize manifest rowsOut (1 row in = 1 row out): no
      // count() job over the just-written table
      val n = tokManifest.map(_.rowsOut)
        .getOrElse(spark.read.parquet(docsDir).count())
      Checkpoint.writeManifest(docsDir,
        Checkpoint.Manifest("docs", fp, cfg.id, n, msSince(t0), Nil), conf)
    }

    // ---- stage: stats ----------------------------------------------------
    val statsDir = s"$dir/$StatsDir"
    if (force || !Checkpoint.isComplete(statsDir, fp, cfg.id, conf)) {
      force = true
      val t0 = System.nanoTime()
      Checkpoint.atomically(statsDir, conf) { tmp =>
        (freshDl, tokManifest) match {
          case (Some(sumDl), Some(m)) =>
            // N and Σdl accumulated during tokenize — 1-row write, no scan
            Seq((m.rowsOut, sumDl)).toDF("max_doc", "sum_total_term_freq")
              .coalesce(1).write.mode("overwrite").parquet(tmp)
          case _ => // resume path: tokenize was skipped, derive from docs
            spark.read.parquet(docsDir)
              .agg(count(lit(1)).as("max_doc"),
                   coalesce(sum($"dl"), lit(0L)).as("sum_total_term_freq"))
              .write.mode("overwrite").parquet(tmp)
        }
      }
      Checkpoint.writeManifest(statsDir,
        Checkpoint.Manifest("stats", fp, cfg.id, 1L, msSince(t0), Nil), conf)
    }

    // ---- docid-range group → merged-group rank map -------------------------
    // grp values embed the range-partition id in their high bits (docid
    // packing), so merged groups come from the global SORTED grp rank —
    // bit-shifting grp could never merge across range partitions. The map
    // is tiny (one entry per 2^groupShift docids) and broadcast. Docids are
    // (pid << 40 | idx), so each partition's grp set is the contiguous
    // range [(pid<<40)>>shift, ((pid<<40)|(rows-1))>>shift] — the whole
    // universe derives from the tokenize manifest's (pid, rows) lineage
    // with NO Spark job (fallback: distinct scan when lineage is absent).
    val postDir = s"$dir/$PostingsDir"
    val runsDir = s"$dir/$RunsDir"
    lazy val mgrpMapDF = {
      val fromLineage: Option[Seq[Long]] = tokManifest
        .filter(_.partitions.nonEmpty)
        .map(_.partitions.flatMap { pm =>
          if (pm.rows <= 0) Nil
          else {
            val base = (cfg.docidEpoch.toLong << 52) | (pm.pid.toLong << 40)
            (base >> cfg.groupShift) to ((base | (pm.rows - 1)) >> cfg.groupShift)
          }
        }.distinct.sorted)
      val grps: Seq[Long] = fromLineage.getOrElse {
        tokenized
          .select(shiftright($"docid", cfg.groupShift).as("grp"))
          .distinct().orderBy("grp").as[Long].collect().toSeq
      }
      val mShift = cfg.mergeShift
      grps.zipWithIndex
        .map { case (g, i) => (g, (i >> mShift).toLong) }
        .toDF("grp", "mgrp")
    }
    val buckets = cfg.buckets

    def explodedPostings = tokenized
      .select($"docid", $"dl", explode($"terms").as("t"))
      .select($"t.term".as("term"), $"docid", $"t.tf".as("tf"), $"dl",
        $"t.pos".as("pos"))
      .withColumn("grp", shiftright($"docid", cfg.groupShift))

    def encodeChunks(sorted: Dataset[(String, Long, Int, Int, Long, Array[Int])],
                     acc: CollectionAccumulator[(Int, Long, Long)]) =
      sorted.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val rows = it.buffered
        val rawRuns = new Iterator[PostingRun] {
          def hasNext: Boolean = rows.hasNext
          def next(): PostingRun = {
            val head = rows.head
            val term = head._1
            val grp = head._5
            val chunk = new Iterator[DecodedPosting] {
              def hasNext: Boolean =
                rows.hasNext && rows.head._1 == term && rows.head._5 == grp
              def next(): DecodedPosting = {
                val r = rows.next()
                DecodedPosting(r._2, r._3, r._4,
                  if (r._6 == null || r._6.isEmpty) PostingCodec.NoPositions else r._6)
              }
            }
            toRun(term, grp, PostingCodec.encode(chunk), buckets)
          }
        }
        metered(rawRuns, acc, pid)(r =>
          (r, r.doc_blob.length.toLong + r.tf_blob.length + r.dl_blob.length
            + r.pos_blob.length))
      }

    if (!cfg.twoPhase) {
      // ---- stage: postings (single shuffle, final merged granularity) ----
      if (force || !Checkpoint.isComplete(postDir, fp, cfg.id, conf)) {
        force = true
        val t0 = System.nanoTime()
        val acc = spark.sparkContext.collectionAccumulator[(Int, Long, Long)]("postings_parts")
        val sorted = explodedPostings
          .join(broadcast(mgrpMapDF), Seq("grp"))
          .repartition($"term", $"mgrp")
          .sortWithinPartitions($"term", $"mgrp", $"docid")
          .select($"term", $"docid", $"tf", $"dl", $"mgrp", $"pos")
          .as[(String, Long, Int, Int, Long, Array[Int])]
        Checkpoint.atomically(postDir, conf) { tmp =>
          encodeChunks(sorted, acc)
            .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
        }
        publishManifest(postDir, "postings", fp, cfg.id, acc, t0, conf)
      }
    } else {
      // ---- stage: posting runs (initial segments) -------------------------
      if (force || !Checkpoint.isComplete(runsDir, fp, cfg.id, conf)) {
        force = true
        val t0 = System.nanoTime()
        val acc = spark.sparkContext.collectionAccumulator[(Int, Long, Long)]("runs_parts")
        val sorted = explodedPostings
          .repartition($"term", $"grp")
          .sortWithinPartitions($"term", $"grp", $"docid")
          .select($"term", $"docid", $"tf", $"dl", $"grp", $"pos")
          .as[(String, Long, Int, Int, Long, Array[Int])]
        Checkpoint.atomically(runsDir, conf) { tmp =>
          encodeChunks(sorted, acc).write.mode("overwrite").parquet(tmp)
        }
        publishManifest(runsDir, "runs", fp, cfg.id, acc, t0, conf)
      }

      // ---- stage: merged postings (segment merge) -------------------------
      if (force || !Checkpoint.isComplete(postDir, fp, cfg.id, conf)) {
        force = true
        val t0 = System.nanoTime()
        val acc = spark.sparkContext.collectionAccumulator[(Int, Long, Long)]("postings_parts")
        val runCols = Seq("term", "bucket", "grp", "ndocs", "first_docid",
          "last_docid", "max_tf", "sum_tf", "doc_blob", "tf_blob", "dl_blob",
          "pos_blob", "block_last_docid", "block_max_tf", "block_min_dl",
          "block_doc_off", "block_tf_off", "block_dl_off", "block_pos_off")
        val merged = spark.read.parquet(runsDir)
          .join(broadcast(mgrpMapDF), Seq("grp"))
          .repartition($"term", $"mgrp")
          .sortWithinPartitions($"term", $"grp")
          .select(struct(runCols.map(col): _*).as("_1"), $"mgrp".as("_2"))
          .as[(PostingRun, Long)]
        val mergedRuns = merged.mapPartitions { it =>
          val pid = TaskContext.getPartitionId()
          metered(SegmentMerger.mergeSorted(it), acc, pid)(r =>
            (r, r.doc_blob.length.toLong + r.tf_blob.length + r.dl_blob.length))
        }
        Checkpoint.atomically(postDir, conf) { tmp =>
          mergedRuns.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
        }
        publishManifest(postDir, "postings", fp, cfg.id, acc, t0, conf)
      }
    }

    // ---- stage: term stats -------------------------------------------------
    val tsDir = s"$dir/$TermStatsDir"
    if (force || !Checkpoint.isComplete(tsDir, fp, cfg.id, conf)) {
      val t0 = System.nanoTime()
      Checkpoint.atomically(tsDir, conf) { tmp =>
        spark.read.parquet(postDir)
          .groupBy($"term", $"bucket")
          .agg(sum($"ndocs").cast("long").as("df"),
               max($"max_tf").as("max_tf"),
               sum($"sum_tf").cast("long").as("cf"))
          .select($"term", $"bucket", $"df", $"max_tf", $"cf")
          .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
      }
      Checkpoint.writeManifest(tsDir,
        Checkpoint.Manifest("term_stats", fp, cfg.id, -1L, msSince(t0), Nil), conf)
    }

    // ---- stage: vocabulary projection (prefix/fuzzy expansion pruning) -----
    // Range-partitioned on (len, term) THEN directory-partitioned by len:
    // each writer task covers a contiguous (len, term) slice sorted by term,
    // so a prefix scan is a pushed-down StringStartsWith over term-sorted
    // row groups and a fuzzy scan partition-prunes to the ±maxEdits length
    // band — bounded work at a 10^8-term web vocabulary, vs the full
    // bucket-hashed term_stats pass this replaces.
    val vocabDir = s"$dir/$VocabDir"
    if (force || !Checkpoint.isComplete(vocabDir, fp, cfg.id, conf)) {
      val t0 = System.nanoTime()
      Checkpoint.atomically(vocabDir, conf) { tmp =>
        spark.read.parquet(tsDir)
          .select($"term", length($"term").as("len"))
          .repartitionByRange($"len", $"term")
          .sortWithinPartitions($"term")
          .write.mode("overwrite").partitionBy("len").parquet(tmp)
      }
      Checkpoint.writeManifest(vocabDir,
        Checkpoint.Manifest("vocab", fp, cfg.id, -1L, msSince(t0), Nil), conf)
    }

    BuiltIndex.writeProps(spark, dir, cfg)
    val idx = new BuiltIndex(spark, dir, cfg)
    if (verifySha) {
      val bad = shaMismatches(corpus, idx)
      require(bad == 0L, s"sha256 invariant violated for $bad rows (source vs indexed)")
    }
    idx
  }

  /** Per-row content sha256 equality, source vs indexed (input_hint
    * invariant). Returns the number of mismatching/missing rows.
    */
  def shaMismatches(corpus: DataFrame, idx: BuiltIndex): Long = {
    val src = corpus.select(col("docno"),
      sha2(coalesce(col("content").cast("string"), lit("")), 256).as("src_sha"))
    src.join(idx.docs, Seq("docno"), "full_outer")
      .where(col("src_sha").isNull || col("sha").isNull || col("src_sha") =!= col("sha"))
      .count()
  }

  // -- helpers ---------------------------------------------------------------

  private[index] def hex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  private def msSince(t0: Long): Long = (System.nanoTime() - t0) / 1000000L

  private def fingerprint(corpus: DataFrame, cfg: IndexConfig): String =
    cfg.fingerprint match {
      case "none" => "static"
      case _ =>
        val row = corpus
          .agg(count(lit(1)), coalesce(sum(crc32(col("docno"))), lit(0L))).head()
        s"n=${row.getLong(0)};crc=${row.getLong(1)}"
    }

  /** Wrap an iterator so the enclosing task reports (pid, rows, bytes) into
    * `acc` once exhausted; retried tasks re-add, so manifest writers dedupe
    * by pid.
    */
  private def metered[A, B](it: Iterator[A],
                            acc: CollectionAccumulator[(Int, Long, Long)],
                            pid: Int)(f: A => (B, Long)): Iterator[B] =
    new Iterator[B] {
      private var rows = 0L
      private var bytes = 0L
      private var reported = false
      def hasNext: Boolean = {
        val h = it.hasNext
        if (!h && !reported) { acc.add((pid, rows, bytes)); reported = true }
        h
      }
      def next(): B = {
        val (b, sz) = f(it.next())
        rows += 1; bytes += sz
        b
      }
    }

  private def publishManifest(dir: String, stage: String, fp: String, cfgId: String,
                              acc: CollectionAccumulator[(Int, Long, Long)],
                              t0: Long, conf: org.apache.hadoop.conf.Configuration): Unit = {
    import scala.jdk.CollectionConverters._
    val parts = acc.value.asScala.groupBy(_._1).map { case (pid, xs) =>
      val x = xs.last
      Checkpoint.PartitionMetric(pid, x._2, x._3)
    }.toSeq.sortBy(_.pid)
    Checkpoint.writeManifest(dir,
      Checkpoint.Manifest(stage, fp, cfgId, parts.map(_.rows).sum, msSince(t0), parts),
      conf)
  }

  private[index] def toRun(term: String, grp: Long, e: EncodedRun, buckets: Int): PostingRun =
    PostingRun(term, bucketOf(term, buckets), grp, e.ndocs, e.firstDocid, e.lastDocid,
      e.maxTf, e.sumTf, e.docBlob, e.tfBlob, e.dlBlob, e.posBlob,
      e.blockLastDocid, e.blockMaxTf, e.blockMinDl,
      e.blockDocOff, e.blockTfOff, e.blockDlOff, e.blockPosOff)
}
