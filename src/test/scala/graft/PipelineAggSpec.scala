package graft

import graft.ops.PipelineAgg
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline aggregations ([[graft.ops.PipelineAgg]], ≙ ES derivative /
  * cumulative_sum / moving_fn shift-0): exact frames, null conventions at
  * the series head, hand-checked values.
  */
class PipelineAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("derivative, cumulative sum, trailing-exclusive moving average") {
    import spark.implicits._
    val buckets = Seq(("d1", 4L), ("d2", 6L), ("d3", 3L), ("d4", 7L))
      .toDF("day", "n")
    val got = PipelineAgg.over(buckets, "day", "n", 2)
      .orderBy("day")
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(got.toSeq == Seq(
      // deriv null at head (ES skips the first bucket); mavg over the 2
      // buckets BEFORE current — null at head, single-element at d2
      ("d1", None, 4L, None),
      ("d2", Some(2L), 10L, Some(4.0)),
      ("d3", Some(-3L), 13L, Some(5.0)),   // (4+6)/2
      ("d4", Some(4L), 20L, Some(4.5))))   // (6+3)/2
  }
}
