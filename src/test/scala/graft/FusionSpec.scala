package graft

import graft.ops.{Fusion, TextQuality}
import org.scalatest.funsuite.AnyFunSuite

/** Reciprocal-rank fusion ([[ops.Fusion.rrf2]]) and in-row co-occurrence
  * pair generation ([[ops.TextQuality.coocPairs]]) — exact, hand-computed
  * expectations including the cases the gate corpus may not hit: single-list
  * documents, cross-list ties resolved by docno, and the pair generator's
  * a<b ordering with no self-pairs.
  */
class FusionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("rrf2: fuses, handles single-list docs, tie-breaks by docno") {
    import spark.implicits._
    // sparse: d1(0) d2(1) d3(2); dense: d2(0) d4(1) d1(2)
    val sparse = Seq(("1", "d1", 0L), ("1", "d2", 1L), ("1", "d3", 2L))
      .toDF("qid", "docno", "rank")
    val dense = Seq(("1", "d2", 0L), ("1", "d4", 1L), ("1", "d1", 2L))
      .toDF("qid", "docno", "rank")
    val got = Fusion.rrf2(sparse, dense, 10)
      .orderBy("rank").as[(String, String, Long)].collect().toSeq
    // weights: d1 1/61+1/63, d2 1/62+1/61, d3 1/63, d4 1/62
    val w = Map(
      "d1" -> (1.0 / 61 + 1.0 / 63), "d2" -> (1.0 / 62 + 1.0 / 61),
      "d3" -> 1.0 / 63, "d4" -> 1.0 / 62)
    val want = w.toSeq.sortBy { case (d, s) => (-s, d) }
      .zipWithIndex.map { case ((d, _), i) => ("1", d, i.toLong) }
    assert(got == want)
    // sanity on the hand math: d2 > d1 (rank0+rank1 beats rank0+rank2),
    // d4 (1/62) > d3 (1/63)
    assert(got.map(_._2) == Seq("d2", "d1", "d4", "d3"))
  }

  test("rrf2: exact cross-list tie falls to docno asc, k truncates") {
    import spark.implicits._
    // zz only-sparse rank 0 and aa only-dense rank 0 weigh exactly 1/61
    val sparse = Seq(("1", "zz", 0L), ("1", "mm", 1L)).toDF("qid", "docno", "rank")
    val dense = Seq(("1", "aa", 0L), ("1", "mm", 1L)).toDF("qid", "docno", "rank")
    val got = Fusion.rrf2(sparse, dense, 2)
      .orderBy("rank").as[(String, String, Long)].collect().toSeq
    // mm: 2/62 = 0.032..; aa = zz = 1/61 = 0.0163..; tie → aa before zz
    assert(got == Seq(("1", "mm", 0L), ("1", "aa", 1L)))
  }

  test("rrf2: queries fuse independently") {
    import spark.implicits._
    val sparse = Seq(("1", "d1", 0L), ("2", "d9", 0L)).toDF("qid", "docno", "rank")
    val dense = Seq(("2", "d8", 0L)).toDF("qid", "docno", "rank")
    val got = Fusion.rrf2(sparse, dense, 5)
      .orderBy("qid", "rank").as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("1", "d1", 0L), ("2", "d8", 0L), ("2", "d9", 1L)))
  }

  test("coocPairs: a<b pairs, no self-pairs, min-co-df floor") {
    import spark.implicits._
    val docs = Seq(
      ("d1", Seq("b", "a", "c")), // pairs ab ac bc
      ("d2", Seq("c", "a")),      // ac
      ("d3", Seq("a")),           // none
      ("d4", Seq("b", "c")))      // bc
      .toDF("docno", "ts")
    val got = TextQuality.coocPairs(docs, minCoDf = 2)
      .orderBy("term_a", "term_b")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("a", "c", 2L), ("b", "c", 2L)))
    val all = TextQuality.coocPairs(docs, minCoDf = 1)
      .orderBy("term_a", "term_b")
      .as[(String, String, Long)].collect().toSeq
    assert(all == Seq(("a", "b", 1L), ("a", "c", 2L), ("b", "c", 2L)))
  }
}
