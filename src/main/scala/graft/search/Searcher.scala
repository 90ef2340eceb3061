package graft.search

import graft.analysis.Analyzer
import graft.codec.PostingCodec
import graft.index.{BuiltIndex, IndexLayout, PostingRun}
import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** A batched topic query (≙ one `<top>` of the reference's query file,
  * parsed at `BatchSearch.java:193-233`).
  */
final case class Topic(qid: String, text: String)

/** One TREC run line: `qid Q0 docno rank score runtag`
  * (`BatchSearch.java:296-307`).
  */
final case class RunLine(qid: String, docno: String, rank: Int, score: Float, runtag: String)

/** One boosted term clause of a query (≙ a SHOULD TermQuery with boost). */
final case class WeightedClause(qid: String, qidx: Int, term: String, boost: Float)

/** Batch retrieval — the Spark-native reimplementation of the reference's
  * `BatchSearch` lifecycle (SURVEY.md §3.2). The Lucene boolean OR scorer
  * (union of query-term posting lists, per-doc float score sum, bounded
  * top-M heap, executed inside `searcher.search` at `BatchSearch.java:283`)
  * becomes:
  *
  *   postings lookup (bucket partition pruning + term predicate pushdown)
  *     → streaming blob decode → per-clause Float partial scores
  *     → per-(query, doc) sum in deterministic clause order (Float addition
  *       is not associative; SURVEY.md §7.5)
  *     → per-query bounded top-k via a typed Aggregator (map-side partial
  *       heaps merge like Lucene's collector, so no single reducer ever
  *       holds a full candidate list)
  *     → docno attach (broadcast of the tiny result set against the doc
  *       table) → dedup-by-docno keeping the first pre-dedup rank
  *       (`BatchSearch.java:290,296-304` — the FR-collection duplicate
  *       workaround; ranks skip after a duplicate, replicated faithfully).
  *
  * Query analysis reuses the index's persisted analyzer config, ruling out
  * the reference's possible index/query analyzer mismatch by construction.
  */
final class Searcher(val index: BuiltIndex) {
  private val spark: SparkSession = index.spark
  private val analyzer = new Analyzer(index.cfg.analyzer)

  /** Top-k retrieval for a batch of topics. Default k mirrors the
    * reference's `returnedResultCount` (`LTRSettings.java:14`).
    */
  def search(topics: Seq[Topic], k: Int = 1000,
             scorerName: String = "bm25"): Dataset[RunLine] = {
    // ≙ SimpleQueryParser over analyzed text: one SHOULD clause per token
    // occurrence, in token order (`BatchSearch.java:189-190,252`).
    val clauses = topics.flatMap { t =>
      analyzer.analyze(t.text).zipWithIndex.map { case (term, i) =>
        WeightedClause(t.qid, i, term, 1.0f)
      }
    }
    searchClauses(clauses, k, scorerName)
  }

  /** Retrieval over explicit weighted clauses (≙ boosted TermQuerys — used
    * by the relevance-feedback path, which emits `term^weight` pairs,
    * `ExplicitFeedbackM1PreProcessor.java:321-352`). `excludeDocnos` removes
    * documents per query BEFORE ranking (≙ `FeedbackDocumentFilter`
    * rewriting TopDocs before ranks are assigned,
    * `BatchSearch.java:238-249,286-287`).
    */
  def searchClauses(clauses: Seq[WeightedClause], k: Int = 1000,
                    scorerName: String = "bm25",
                    excludeDocnos: Map[String, Set[String]] = Map.empty): Dataset[RunLine] = {
    import spark.implicits._
    val scorer = Scorer.byName(scorerName)
    if (clauses.isEmpty) return spark.emptyDataset[RunLine]

    // Resolve excluded docnos → docids (tiny point lookup on the doc table,
    // ≙ the reference's docno TermQuery lookups §2.3).
    val excludedByQid: Map[String, Set[Long]] =
      if (excludeDocnos.isEmpty) Map.empty
      else {
        val allDocnos = excludeDocnos.values.flatten.toSeq.distinct
        val ids = index.docs.where(col("docno").isin(allDocnos: _*))
          .select("docno", "docid").as[(String, Long)].collect().toMap
        excludeDocnos.map { case (qid, ds) => qid -> ds.flatMap(ids.get) }
      }

    val terms = clauses.map(_.term).distinct
    val buckets = terms.map(IndexLayout.bucketOf(_, index.cfg.buckets)).distinct
    val stats = CollStats(index.stats.max_doc, index.stats.sum_total_term_freq)

    // Per-term docFreq from the tiny pruned term_stats lookup
    // (≙ TermStatistics.docFreq consumed at `BM25.java:61`).
    val dfs: Map[String, Long] = index.termStats
      .where(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
      .select("term", "df").as[(String, Long)].collect().toMap

    // Driver-side query plan: term → (idf, clauses using it).
    val plan: Map[String, (Float, Array[(String, Int, Float)])] =
      clauses.groupBy(_.term).flatMap { case (term, cs) =>
        dfs.get(term).map { df =>
          term -> (scorer.termWeight(df, stats),
                   cs.map(c => (c.qid, c.qidx, c.boost)).toArray)
        }
      }
    if (plan.isEmpty) return spark.emptyDataset[RunLine]

    // Postings lookup: bucket prunes parquet partitions, term pushes down.
    val posts = index.postings
      .where(col("bucket").isin(buckets: _*) && col("term").isin(plan.keys.toSeq: _*))
      .as[PostingRun]

    // Decode → per-clause partial scores (qid, docid, clauseIdx, partial);
    // clause boost multiplies like a Lucene query-term boost.
    val partials: Dataset[(String, Long, Int, Float)] = posts.flatMap { run =>
      val (idf, cs) = plan(run.term)
      PostingCodec.decodeBlobs(run.ndocs, run.doc_blob, run.tf_blob, run.dl_blob)
        .flatMap { p =>
          val s = scorer.score(p.tf, p.dl, idf, stats)
          cs.iterator.map { case (qid, qidx, boost) =>
            (qid, p.docid, qidx, if (boost == 1.0f) s else s * boost)
          }
        }
    }

    // Per-(query, doc) float sum in clause order (≙ boolean scorer sum),
    // with per-query doc exclusion applied BEFORE ranking.
    val excluded = excludedByQid
    val scores: Dataset[(String, Long, Float)] = partials
      .filter(t => excluded.get(t._1).forall(!_.contains(t._2)))
      .groupByKey(t => (t._1, t._2))
      .mapGroups[(String, Long, Float)] {
        (key: (String, Long), it: Iterator[(String, Long, Int, Float)]) =>
        val arr = it.toArray.sortBy(_._3)
        var s = 0.0f
        arr.foreach(s += _._4)
        (key._1, key._2, s)
      }

    // Bounded top-k per query (score desc, docid asc tie-break — the Lucene
    // collector contract, SURVEY.md §2.5).
    val agg = new TopKAgg(k, implicitly[Encoder[Seq[(Long, Float)]]],
      implicitly[Encoder[Seq[(Long, Float)]]])
    val top: Dataset[(String, Seq[(Long, Float)])] =
      scores.groupByKey(_._1).agg(agg.toColumn)

    val ranked = top.flatMap { case (qid, hits) =>
      hits.iterator.zipWithIndex.map { case ((docid, score), i) =>
        (qid, docid, i, score)
      }
    }.toDF("qid", "docid", "rank", "score")

    // Attach docno: tiny result side broadcast against the doc table; the
    // redundant grp equi-key (grp is a pure function of docid) lets Spark
    // dynamic-partition-prune the grp-partitioned doc table, so only the
    // docid ranges containing hits are read.
    val docShift = index.cfg.groupShift + index.cfg.mergeShift
    val withDocno = index.docs.select($"docid", $"docno", $"grp")
      .join(broadcast(ranked.withColumn("grp", shiftright($"docid", docShift))),
        Seq("docid", "grp"))

    // Docno dedup keeping the first (lowest pre-dedup rank) occurrence.
    val w = Window.partitionBy($"qid", $"docno").orderBy($"rank")
    withDocno
      .withColumn("rn", row_number().over(w)).where($"rn" === 1)
      .select($"qid", $"docno", $"rank".cast("int").as("rank"),
        $"score".cast("float").as("score"), lit(scorer.name).as("runtag"))
      .orderBy($"qid", $"rank")
      .as[RunLine]
  }

  /** Render run lines in trec_eval format (`BatchSearch.java:305-307`). */
  def formatRun(lines: Seq[RunLine]): Seq[String] =
    lines.map(l => s"${l.qid} Q0 ${l.docno} ${l.rank} ${l.score} ${l.runtag}")
}

/** Bounded top-k typed aggregator: buffers stay ≤ 4k entries, partial
  * buffers merge associatively (map-side combine), final order is
  * (score desc, docid asc).
  */
final class TopKAgg(k: Int,
                    bufEnc: Encoder[Seq[(Long, Float)]],
                    outEnc: Encoder[Seq[(Long, Float)]])
    extends Aggregator[(String, Long, Float), Seq[(Long, Float)], Seq[(Long, Float)]] {
  private def better(a: (Long, Float), b: (Long, Float)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
  private def compact(s: Seq[(Long, Float)]): Seq[(Long, Float)] =
    s.sortWith(better).take(k)
  def zero: Seq[(Long, Float)] = Vector.empty
  def reduce(buf: Seq[(Long, Float)], in: (String, Long, Float)): Seq[(Long, Float)] = {
    val b2 = buf :+ ((in._2, in._3))
    if (b2.size >= 4 * k) compact(b2) else b2
  }
  def merge(a: Seq[(Long, Float)], b: Seq[(Long, Float)]): Seq[(Long, Float)] =
    compact(a ++ b)
  def finish(buf: Seq[(Long, Float)]): Seq[(Long, Float)] = compact(buf)
  def bufferEncoder: Encoder[Seq[(Long, Float)]] = bufEnc
  def outputEncoder: Encoder[Seq[(Long, Float)]] = outEnc
}
