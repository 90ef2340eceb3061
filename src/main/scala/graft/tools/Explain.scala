package graft.tools

import graft.Engine
import graft.search.Topic
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: print formatted physical plans for the hot paths so
  * pushdown/pruning regressions are visible (`PushedFilters`, partition
  * pruning on `bucket`, `WholeStageCodegen` spans).
  *
  * Run: sbt "runMain graft.tools.Explain /root/testdata/sf0.001"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val idx = Engine.oracleIndex(spark, sfDir)

    println("\n========== postings lookup (should show bucket partition pruning + term PushedFilters) ==========")
    val terms = Seq("hash", "join", "merge")
    val buckets = terms.map(graft.index.IndexLayout.bucketOf(_, idx.cfg.buckets))
    idx.postings
      .where(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
      .explain("formatted")

    println("\n========== scoring postings view (pos_blob/block_pos_off pruned out of ReadSchema) ==========")
    idx.postingsScoring
      .where(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
      .explain("formatted")

    println("\n========== term_stats lookup ==========")
    idx.termStats
      .where(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
      .select("term", "df")
      .explain("formatted")

    println("\n========== full search plan ==========")
    new graft.search.Searcher(idx)
      .search(Seq(Topic("1", "hash join merge")), 20)
      .explain("formatted")

    println("\n========== docs scan for doclens (column pruning: docno, dl only) ==========")
    idx.docs.select("docno", "dl").explain("formatted")

    val searcher = new graft.search.Searcher(idx)
    println("\n========== vocab prefix scan (StringStartsWith pushed + len partition bound) ==========")
    searcher.prefixScan("qu").explain("formatted")

    println("\n========== vocab fuzzy length band (len partition pruning) ==========")
    idx.vocab.where(col("len") >= 2 && col("len") <= 6).explain("formatted")

    println("\n========== fuzzy blended search plan ==========")
    searcher.searchQuery(Seq(Topic("1", "lin~2 window")), 20).explain("formatted")

    println("\n========== sloppy phrase search plan ==========")
    searcher.searchQuery(Seq(Topic("1", "\"hash merge\"~2")), 20).explain("formatted")

    println("\n========== boolean-tree group plan ((hash | merge) + scan) ==========")
    searcher.searchQuery(Seq(Topic("1", "(hash | merge) + scan")), 20).explain("formatted")

    println("\n========== faithful negation plan (complement anti-join should BROADCAST the candidate side and reuse the aggregation exchange) ==========")
    searcher.searchQuery(Seq(Topic("1", "hash -window")), 20).explain("formatted")

    println("\n========== IVF assignment (narrow codegen'd fold — no shuffle before the candidate join) ==========")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.where(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    graft.ops.Knn.ivfTopK(emb, q, 10,
      graft.ops.Knn.ivfSeedCentroids(emb, 8), nProbe = 2).explain("formatted")

    println("\n========== hash sample (filter pushed to the corpus scan, zero shuffles) ==========")
    val corp = graft.corpus.Corpus.fromDocuments(spark, sfDir)
    graft.ops.Curation.hashSample(corp, "s1", 20, 2).explain("formatted")

    println("\n========== seeded shuffle prefix sum (exactly ONE range exchange; both passes read the materialized sort) ==========")
    graft.ops.Curation.seededShuffle(corp, "s1").explain("formatted")

    println("\n========== synonym-group search plan (group postings in the same bucket-pruned scan; one extra tiny shuffle for the tf sum) ==========")
    searcher.searchClauses(
      Seq(graft.search.WeightedClause("1", 0, "hash", 1.0f)),
      k = 20,
      synonymClauses = Seq(graft.search.SynonymClause("1", 1, Seq("scan", "window"), 1.0f)))
      .explain("formatted")

    println("\n========== hybrid RRF fusion (two bounded top-k inputs → full-outer join on ≤2k rows/query; the window runs over that bounded set) ==========")
    val docVecs = corp
      .select(expr("cast(substring(docno, 5, 24) as long)").as("vec_id"))
      .join(emb, "vec_id").select(col("vec_id"), col("embedding"))
    val qv1 = emb.where(col("vec_id") === 1001)
      .select(lit("1").as("qid"), col("embedding").as("qv"))
    val dense = graft.ops.Knn.bruteForceTopK(docVecs,
        emb.where(col("vec_id") === 1001)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")), 20)
      .select((col("qid") - 1000).cast("string").as("qid"),
        concat(lit("doc-"), lpad(col("vec_id").cast("string"), 8, "0")).as("docno"),
        col("rank"))
    val sparse = searcher.search(Seq(Topic("1", "hash join merge")), 20).toDF()
      .select(col("qid"), col("docno"), col("rank"))
    graft.ops.Fusion.rrf2(sparse, dense, 20).explain("formatted")

    println("\n========== in-row co-occurrence pairs (ONE aggregate exchange; pair fan-out inside WholeStageCodegen) ==========")
    graft.ops.TextQuality.coocPairs(
      spark.read.parquet(s"${idx.dir}/${graft.index.IndexLayout.TokenizedDir}")
        .select(col("docno"), col("terms.term").as("ts"))).explain("formatted")

    println("\n========== cluster assignment + stratified pick (assignment is a narrow fold over the scan — no shuffle before the per-cell heap agg) ==========")
    graft.ops.Curation.stratifiedSample(
      docVecs.withColumn("cid", graft.ops.Knn.ivfCellExpr(col("embedding"),
          graft.ops.Knn.ivfSeedCentroids(emb, 8)))
        .select(concat(lit("doc-"), lpad(col("vec_id").cast("string"), 8, "0")).as("docno"),
          col("cid")),
      "cid", "cs1", 5).explain("formatted")

    println("\n========== duplicate spans (one gram agg + semi-join; ONE docno exchange shared by both window passes and the island agg) ==========")
    graft.ops.Dedup.duplicatedSpans(corp,
      new graft.analysis.Analyzer(Engine.OracleAnalyzer), n = 5)
      .explain("formatted")

    println("\n========== multi-field most_fields (per-field bucket-pruned scans → ONE (qid, docid) full-outer join → bounded top-k) ==========")
    graft.search.MultiField.mostFields(
      Seq(new graft.search.Searcher(Engine.codeIndex(spark, sfDir)) -> 1.0f,
        new graft.search.Searcher(Engine.pathIndex(spark, sfDir)) -> 2.0f),
      Seq(Topic("m1", "hash join txt")), 20).explain("formatted")

    println("\n========== LM score (two count aggs broadcast-joined back onto the bigram stream; one per-doc agg) ==========")
    graft.ops.TextQuality.lmScore(corp,
      new graft.analysis.Analyzer(Engine.OracleAnalyzer)).explain("formatted")

    println("\n========== BM25F combined-field (per-field pruned postings scans → ONE (term, docid) full-outer join, checkpointed for the df agg + scoring double-read) ==========")
    graft.search.CombinedField.bm25f(
      Seq((new graft.search.Searcher(Engine.codeIndex(spark, sfDir)), 1.0, 0.75),
        (new graft.search.Searcher(Engine.pathIndex(spark, sfDir)), 2.0, 0.4)),
      Seq(Topic("m1", "hash join txt")), 20).explain("formatted")

    println("\n========== trigram substring lookup (bucket partition pruning + gram PushedFilters; verify join broadcasts the candidate side) ==========")
    val gt = Engine.trigramIndex(spark, sfDir)
    graft.index.TrigramIndex.substringTopK(corp, gt,
      Seq(("s1", "merge slow")), 20).explain("formatted")

    println("\n========== trigram grep (OR-of-branches in ONE grouped pass over the same pruned gram scan) ==========")
    graft.index.TrigramIndex.regexTopK(corp, gt,
      Seq(("g1", "merge (slow|fast)")), 20).explain("formatted")

    println("\n========== dismax (same bucket-pruned decode as flat OR; combiner is the one (qid, docid) agg) ==========")
    searcher.searchDisMax(Seq(Topic("1", "hash join merge")), 20, 0.3f)
      .explain("formatted")

    println("\n========== boosting (negative postings decode → distributed left join demote; no driver doc sets) ==========")
    searcher.searchBoosting(Seq(Topic("1", "hash join merge")),
      Seq(("1", "slow")), 0.5f, 20).explain("formatted")

    println("\n========== rescore (bounded window agg → left join against the phrase partial stream → bounded top-k) ==========")
    searcher.searchRescore(Seq(Topic("1", "hash join merge")),
      Seq(graft.search.PhraseClause("1", 0,
        Seq(("hash", 0), ("join", 1)), 1.0f)), 50, 2.0f, 20)
      .explain("formatted")

    println("\n========== span-first (positional postings scan pruned to the span terms' buckets) ==========")
    searcher.searchSpanFirst(Seq(("f1", "hash", 5)), 20).explain("formatted")

    println("\n========== shingle-rewritten phrase (ONE bigram-term bucket-pruned scan; ReadSchema must NOT contain pos_blob) ==========")
    new graft.search.Searcher(Engine.shingleIndex(spark, sfDir))
      .searchPhraseShingle(Seq("1" -> "hash join"), 20).explain("formatted")

    println("\n========== composite-agg page 2 (after-key filter BEFORE the aggregate; one agg exchange) ==========")
    graft.ops.CompositeAgg.page(
      spark.read.parquet(s"$sfDir/events.parquet")
        .select(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"), col("value")),
      Seq("event_type", "day"),
      Seq(count(lit(1)).as("n_events")), 7,
      Some(Seq("click", "2026-01-01"))).explain("formatted")

    println("\n========== pipeline aggs (window pass over the ALREADY-REDUCED bucket list — the single-partition window is bounded by construction) ==========")
    graft.ops.PipelineAgg.over(
      spark.read.parquet(s"$sfDir/events.parquet")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_events")),
      "day", "n_events", 3).explain("formatted")

    println("\n========== filtered kNN (label predicate in PushedFilters of the embeddings scan, BEFORE the norm arithmetic) ==========")
    val embf = spark.read.parquet(s"$sfDir/embeddings.parquet")
    graft.ops.Knn.filteredTopK(embf,
      embf.where(col("vec_id") === 1).limit(1)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")),
      5, col("label") === 2).explain("formatted")

    println("\n========== index-sorted prefix batch (closed-range sp partition predicate; sort+limit over ONE slice) ==========")
    val sd = Engine.sortedDocs(spark, sfDir)
    sd.data.where(col("sp") >= 0 && col("sp") <= 0)
      .select(col("skey"), col("docno"))
      .orderBy(col("skey").asc, col("docno").asc).limit(20)
      .explain("formatted")

    spark.stop()
  }
}
