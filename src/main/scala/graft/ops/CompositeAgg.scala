package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composite aggregation (≙ Elasticsearch's `composite` agg): pages over
  * ALL buckets of a multi-source aggregation in deterministic composite-
  * key order, `size` buckets at a time, resuming from an `after` key —
  * the cursor that lets a client stream an unbounded-cardinality
  * aggregation without ever asking the cluster (or the driver) to hold
  * the whole bucket list.
  *
  * The scale contract ES built it for holds here:
  *  - a page never materializes more than `size` buckets on the driver;
  *  - the `after` predicate is a lexicographic key comparison applied to
  *    the ROWS, before the aggregation, so surviving groups shrink
  *    monotonically as the cursor advances;
  *  - with key-aligned layout (table partitioned/sorted by the leading
  *    source — the usual time-series shape) the leading-key disjunct of
  *    that predicate prunes at the parquet scan.
  *
  * The reference has no aggregation surface at all; this is a
  * published-API parity op like the date histogram beside it.
  */
object CompositeAgg {

  /** One page: buckets of `rows` grouped by `keys`, aggregated with
    * `aggs`, in ascending key order, strictly after the composite key
    * `after` (None = the first page). The returned frame carries the key
    * columns first — the caller chains pages by passing the LAST row's
    * key values back as `after`, exactly ES's `after_key`.
    */
  def page(rows: DataFrame, keys: Seq[String], aggs: Seq[Column],
           size: Int, after: Option[Seq[Any]] = None): DataFrame = {
    require(keys.nonEmpty, "composite agg needs at least one source key")
    require(size > 0, "page size must be positive")
    val filtered = after match {
      case None => rows
      case Some(a) =>
        require(a.length == keys.length,
          s"after key arity ${a.length} != sources ${keys.length}")
        // lexicographic (k1, …, kn) > (a1, …, an)
        val gt = keys.zip(a).foldRight(lit(false)) { case ((k, av), rest) =>
          (col(k) > lit(av)) || (col(k) === lit(av) && rest)
        }
        rows.where(gt)
    }
    filtered.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(keys.map(col(_).asc): _*)
      .limit(size)
  }
}
