package graft

import graft.ops.TrecEval
import org.scalatest.funsuite.AnyFunSuite

class TrecEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def disc(p: Int): Double = TrecEval.discounts(10)(p - 1)

  test("per-topic metrics match a hand-computed reference, bit-exactly") {
    import spark.implicits._
    // topic 1: d1(rel2)@1, d2(unjudged)@2, d3(rel1)@3, d4(judged 0)@4,
    //          d5(unjudged)@5; d9(rel1) never retrieved
    // topic 2: judged docs exist but none retrieved
    // topic 3: no qrels at all
    val run = Seq(
      ("1", "d1", 0), ("1", "d2", 1), ("1", "d3", 2), ("1", "d4", 3), ("1", "d5", 4),
      ("2", "x1", 0), ("2", "x2", 1),
      ("3", "y1", 0)).toDF("qid", "docno", "rank")
    val qrels = Seq(
      ("1", "d1", 2), ("1", "d3", 1), ("1", "d9", 1), ("1", "d4", 0),
      ("2", "z1", 1), ("2", "x2", 0)).toDF("qid", "docno", "rel")

    val got = TrecEval.evaluate(run, qrels, k = 20).orderBy("qid").collect()
    assert(got.length == 3)

    val r1 = got(0)
    assert(r1.getString(0) == "1")
    assert(r1.getLong(1) == 5)  // num_ret
    assert(r1.getLong(2) == 3)  // num_rel (d1, d3, d9 — rel-0 d4 excluded)
    assert(r1.getLong(3) == 2)  // num_rel_ret
    assert(r1.getDouble(4) == 2.0 / 5.0)   // p_5
    assert(r1.getDouble(5) == 2.0 / 10.0)  // p_10
    assert(r1.getDouble(6) == 2.0 / 3.0)   // recall
    assert(r1.getDouble(7) == 1.0)         // rr: first rel at p=1
    // ap: same fold order — (0 + 1/1) + 2/3, / num_rel
    val ap = ((0.0 + 1.0 / 1.0) + 2.0 / 3.0) / 3.0
    assert(r1.getDouble(8) == ap)
    // dcg: rel2@1, rel1@3; idcg: [2,1,1] at positions 1..3
    val dcg = (0.0 + 3.0 * disc(1)) + 1.0 * disc(3)
    val idcg = ((0.0 + 3.0 * disc(1)) + 1.0 * disc(2)) + 1.0 * disc(3)
    assert(r1.getDouble(9) == dcg / idcg)

    val r2 = got(1) // judged pool exists (num_rel=1) but nothing rel retrieved
    assert(r2.getLong(1) == 2 && r2.getLong(2) == 1 && r2.getLong(3) == 0)
    assert(r2.getDouble(6) == 0.0 && r2.getDouble(7) == 0.0)
    assert(r2.getDouble(8) == 0.0 && r2.getDouble(9) == 0.0)

    val r3 = got(2) // no qrels: every rel-dependent metric 0, no NaN/nulls
    assert(r3.getLong(2) == 0 && r3.getDouble(6) == 0.0)
    assert(r3.getDouble(8) == 0.0 && r3.getDouble(9) == 0.0)
  }

  test("ndcg=1 for a perfectly ordered run; rank cutoff k respected") {
    import spark.implicits._
    val run = Seq(("1", "a", 0), ("1", "b", 1), ("1", "c", 2), ("1", "z", 25))
      .toDF("qid", "docno", "rank")
    val qrels = Seq(("1", "a", 2), ("1", "b", 1), ("1", "c", 1), ("1", "z", 2))
      .toDF("qid", "docno", "rel")
    val r = TrecEval.evaluate(run, qrels, k = 20).collect().head
    assert(r.getLong(1) == 3)          // rank 25 excluded by k
    assert(r.getLong(3) == 3)          // z not retrieved within k
    // ideal order is [2,2,1,1] but only [2,1,1] retrieved → ndcg < 1
    assert(r.getDouble(9) < 1.0 && r.getDouble(9) > 0.0)
    // with z judged out of the pool, retrieved order IS ideal
    val r2 = TrecEval.evaluate(run,
      qrels.where($"docno" =!= "z"), k = 20).collect().head
    assert(r2.getDouble(9) == 1.0)
    assert(r2.getDouble(8) == 1.0)     // ap = 1 when all rel at the top
  }

  test("fold is partitioning-invariant (sort_array fixes the order)") {
    import spark.implicits._
    val run = (0 until 20).map(i => ("1", s"d$i", i)).toDF("qid", "docno", "rank")
    val qrels = (0 until 20 by 3).map(i => ("1", s"d$i", 1 + (i % 2)))
      .toDF("qid", "docno", "rel")
    val a = TrecEval.evaluate(run.repartition(13), qrels.repartition(7), 20)
      .collect().head
    val b = TrecEval.evaluate(run.coalesce(1), qrels.coalesce(1), 20)
      .collect().head
    assert(a == b)
  }
}
