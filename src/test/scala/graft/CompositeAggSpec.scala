package graft

import graft.ops.CompositeAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Composite aggregation paging ([[graft.ops.CompositeAgg]], ≙ ES
  * `composite` + `after_key`): chained pages partition the full
  * key-ordered bucket list exactly, the after predicate is strict, and
  * multi-source keys compare lexicographically.
  */
class CompositeAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val rows = {
    import spark.implicits._
    // 3 kinds × 5 days, several rows per bucket, deliberately unordered
    val data = for {
      k <- Seq("view", "click", "buy")
      d <- 1 to 5
      r <- 1 to (d + 1)
    } yield (k, f"2026-01-$d%02d", r.toDouble)
    scala.util.Random.shuffle(data).toDF("kind", "day", "v")
  }

  private def chain(size: Int): Seq[(String, String, Long)] = {
    val aggs = Seq(count(lit(1)).as("n"))
    var after: Option[Seq[Any]] = None
    val out = Seq.newBuilder[(String, String, Long)]
    var done = false
    while (!done) {
      val page = CompositeAgg.page(rows, Seq("kind", "day"), aggs, size, after)
        .collect()
      if (page.isEmpty) done = true
      else {
        page.foreach(r => out += ((r.getString(0), r.getString(1), r.getLong(2))))
        after = Some(Seq(page.last.getString(0), page.last.getString(1)))
        if (page.length < size) done = true
      }
    }
    out.result()
  }

  private lazy val full: Seq[(String, String, Long)] =
    rows.groupBy("kind", "day").agg(count(lit(1)).as("n"))
      .orderBy("kind", "day").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq

  test("chained pages reproduce the full bucket list exactly") {
    assert(full.size == 15)
    assert(chain(4) == full) // 4+4+4+3: last page short
    assert(chain(5) == full) // exact fit: the chain stops on the empty page
    assert(chain(100) == full)
  }

  test("the after predicate is strict and lexicographic") {
    val aggs = Seq(count(lit(1)).as("n"))
    // after = ("click", "2026-01-05"): the next bucket must be the first
    // "buy"-after... no — keys ascend, so the next is ("view", first day)?
    // "buy" < "click" < "view"; after the LAST click day comes view/01.
    val page = CompositeAgg.page(rows, Seq("kind", "day"), aggs, 2,
      Some(Seq("click", "2026-01-05"))).collect()
    assert(page.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("view", "2026-01-01"), ("view", "2026-01-02")))
    // mid-key resume: after ("click", "2026-01-02") the same kind's next
    // day comes first (second source breaks the tie)
    val mid = CompositeAgg.page(rows, Seq("kind", "day"), aggs, 1,
      Some(Seq("click", "2026-01-02"))).collect()
    assert((mid.head.getString(0), mid.head.getString(1)) ==
      ("click", "2026-01-03"))
  }
}
