package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-effectiveness metrics over a run table — the step a user of
  * the reference performs right after it writes its run file
  * (`BatchSearch.java:305-307` emits trec_eval-format lines precisely so
  * `trec_eval` can score them against qrels). This computes the standard
  * per-topic measures (num_ret / num_rel / num_rel_ret, P@5, P@10,
  * recall@k, reciprocal rank, average precision, NDCG@10) inside the
  * engine, so a 100 TB evaluation never round-trips through a single-node
  * text tool.
  *
  * Scale shape: the run is top-k-bounded per topic by construction (the
  * collector never returns more), so the per-topic fold state is ≤ k
  * structs; qrels join is a (qid, docno) hash join (qrels are
  * human-judged and sparse — broadcast when small); the ideal-DCG profile
  * needs only per-grade COUNTS of the topic's judgments (grades 0–4),
  * never a sorted judgment list, so no per-topic state grows with corpus
  * size. Everything after the one groupBy(qid) is a codegen'd column
  * expression.
  *
  * Determinism: every cross-row double reduction is an explicit
  * left-to-right `aggregate()` fold in ascending rank order (Spark's SUM
  * over doubles is partial-aggregation-order-dependent; a fold is not),
  * gains are integer-exact (2^rel − 1 via bit shift), and the NDCG
  * discounts 1/log2(p+1) are baked as literal doubles from
  * [[discounts]] — an oracle embedding the same literals replays every
  * metric bit-identically.
  */
object TrecEval {

  /** Highest relevance grade supported by the bounded ideal-DCG profile. */
  val MaxGrade = 4

  /** 1-indexed NDCG discounts `1/log2(p+1)`, p = 1..k — computed ONCE here
    * so engine expressions and generated oracle SQL embed the IDENTICAL
    * IEEE-754 doubles (`Double.toString` round-trips exactly on both
    * engines' literal parsers).
    */
  def discounts(k: Int): IndexedSeq[Double] =
    (1 to k).map(p => 1.0 / (math.log(p + 1.0) / math.log(2.0)))

  /** Per-topic metrics for `run` (qid, docno, rank — rank 0-based, the
    * engine's run-line convention) judged against `qrels` (qid, docno,
    * rel ∈ 0..4; rel 0 rows are judged-nonrelevant and count toward
    * nothing but the judgment pool). Topics absent from qrels score 0 on
    * every rel-dependent metric, like trec_eval's `-c` complete-judgment
    * mode restricted to the run's topics.
    */
  def evaluate(run: DataFrame, qrels: DataFrame, k: Int, ndcgK: Int = 10): DataFrame = {
    require(ndcgK <= k, s"ndcgK=$ndcgK must be <= k=$k")
    val discLit = discounts(ndcgK)
      .map(d => java.lang.Double.toString(d) + "D")
      .mkString("array(", ", ", ")")

    val rels = qrels.select(col("qid"), col("docno"), col("rel").cast("int").as("rel"))
    val topk = run
      .where(col("rank") < k)
      .select(col("qid"), col("docno"), (col("rank").cast("int") + 1).as("p"))
    val joined = topk.join(rels, Seq("qid", "docno"), "left")
      .select(col("qid"), col("p"), coalesce(col("rel"), lit(0)).as("rel"))

    // One ascending-rank fold carries every cumulative quantity: the
    // relevant-count prefix (AP's precision numerators), the P@5/P@10
    // windows, first-relevant rank, and the DCG chain.
    val folded = joined.groupBy("qid")
      .agg(sort_array(collect_list(struct(col("p"), col("rel")))).as("rl"))
      .withColumn("acc", expr(
        s"""aggregate(rl,
           |  named_struct('relcnt', 0, 'r5', 0, 'r10', 0, 'minp', 0,
           |               'ap', CAST(0 AS DOUBLE), 'dcg', CAST(0 AS DOUBLE)),
           |  (a, x) -> named_struct(
           |    'relcnt', a.relcnt + IF(x.rel > 0, 1, 0),
           |    'r5',  a.r5  + IF(x.rel > 0 AND x.p <= 5, 1, 0),
           |    'r10', a.r10 + IF(x.rel > 0 AND x.p <= 10, 1, 0),
           |    'minp', IF(a.minp = 0 AND x.rel > 0, x.p, a.minp),
           |    'ap', a.ap + IF(x.rel > 0,
           |            CAST(a.relcnt + 1 AS DOUBLE) / CAST(x.p AS DOUBLE),
           |            CAST(0 AS DOUBLE)),
           |    'dcg', a.dcg + IF(x.p <= $ndcgK,
           |            CAST(shiftleft(1, least(x.rel, $MaxGrade)) - 1 AS DOUBLE)
           |              * element_at($discLit, x.p),
           |            CAST(0 AS DOUBLE))))""".stripMargin))

    // Ideal-DCG inputs: judged counts per grade (bounded columns — the
    // ideal ranking's gain at position i is a step function of these).
    val gradeCounts = (MaxGrade to 1 by -1).map(g =>
      sum(when(col("rel") === g, 1L).otherwise(0L)).as(s"n$g"))
    val qstats = rels.groupBy("qid").agg(
      sum(when(col("rel") > 0, 1L).otherwise(0L)).as("num_rel"),
      gradeCounts: _*)
    val idealGain = (MaxGrade to 1 by -1).map { g =>
      val cum = (MaxGrade to g by -1).map(h => s"n$h").mkString(" + ")
      s"WHEN i <= $cum THEN ${((1 << g) - 1).toDouble}D"
    }.mkString("CASE ", " ", " ELSE 0.0D END")

    folded.join(qstats, Seq("qid"), "left")
      .na.fill(0L, "num_rel" +: (1 to MaxGrade).map(g => s"n$g"))
      .withColumn("idcg", expr(
        s"""aggregate(sequence(1, $ndcgK), CAST(0 AS DOUBLE),
           |  (a, i) -> a + ($idealGain) * element_at($discLit, CAST(i AS INT)))""".stripMargin))
      .select(
        col("qid"),
        size(col("rl")).cast("long").as("num_ret"),
        col("num_rel"),
        col("acc.relcnt").cast("long").as("num_rel_ret"),
        expr("CAST(acc.r5 AS DOUBLE) / 5.0D").as("p_5"),
        expr("CAST(acc.r10 AS DOUBLE) / 10.0D").as("p_10"),
        expr("""IF(num_rel > 0,
                   CAST(acc.relcnt AS DOUBLE) / CAST(num_rel AS DOUBLE),
                   CAST(0 AS DOUBLE))""").as("recall"),
        expr("""IF(acc.minp > 0,
                   CAST(1 AS DOUBLE) / CAST(acc.minp AS DOUBLE),
                   CAST(0 AS DOUBLE))""").as("rr"),
        expr("""IF(num_rel > 0, acc.ap / CAST(num_rel AS DOUBLE),
                   CAST(0 AS DOUBLE))""").as("ap"),
        expr("IF(idcg > 0.0D, acc.dcg / idcg, CAST(0 AS DOUBLE))").as("ndcg"))
  }
}
