package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline aggregations (≙ Elasticsearch `derivative`, `cumulative_sum`
  * and `moving_fn` with the default shift): second-pass computations over
  * a parent histogram's bucket series.
  *
  * Scale note: like ES, the pipeline pass runs over the BUCKET LIST, not
  * the rows — the parent aggregation has already reduced the data to one
  * row per bucket (a bounded series: days, hours…), so the single-series
  * window here is a driver-scale frame by construction, exactly the
  * contract ES imposes (pipeline aggs operate on the response buckets).
  * The parent agg's shuffle is the only data-volume shuffle.
  */
object PipelineAgg {

  /** Derivative, cumulative sum, and trailing moving average over the
    * bucket frame `buckets`, ordered by `orderCol`:
    *  - `deriv`  = value − lag(value)          (null for the first bucket,
    *    like ES's derivative which skips it);
    *  - `cum`    = running sum including the current bucket;
    *  - `mavg`   = average of the `window` buckets BEFORE the current one
    *    (ES `moving_fn` shift-0 frame `[i−window, i)`; null while empty).
    */
  def over(buckets: DataFrame, orderCol: String, valueCol: String,
           window: Int): DataFrame = {
    require(window > 0, "moving window must be positive")
    val w = Window.orderBy(col(orderCol))
    buckets
      .withColumn("deriv", col(valueCol) - lag(col(valueCol), 1).over(w))
      .withColumn("cum",
        sum(col(valueCol)).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("mavg",
        avg(col(valueCol)).over(w.rowsBetween(-window, -1)))
  }
}
