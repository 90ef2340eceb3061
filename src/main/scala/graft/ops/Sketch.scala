package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-count sketching (≙ Elasticsearch's `cardinality` aggregation /
  * Lucene facets' value counting at scales where exact COUNT(DISTINCT) is
  * a full shuffle of the key universe): a deterministic HyperLogLog
  * (Flajolet-Furet-Gandouet-Meunier 2007) over an md5-derived 64-bit hash.
  *
  * Scale story — this is the 100 TB approximate-distinct primitive: ONE
  * narrow pass over the input, a map-side-combinable `groupBy(bucket)
  * .max(rho)` whose partial state is ≤ 2^p integers per task, and a 2^p-row
  * output, versus the exact count's shuffle of every distinct key. The
  * register table is also mergeable across corpora/segments (elementwise
  * max), so incremental ingest unions sketches without rescanning.
  *
  * Determinism contract (what the DuckDB oracle replays bit-for-bit): the
  * hash is md5, split as two 32-bit halves exactly like [[Dedup]]'s minhash
  * construction — h1 = first 8 hex chars, h2 = next 8. bucket = top `p`
  * bits of h1; the remaining (64−p)-bit stream w = (h1 mod 2^(32−p))·2^32 +
  * h2; rho = (64−p) − bitlength(w) + 1, i.e. the 1-based position of the
  * highest set bit from the left, with the all-zero stream taking the
  * conventional (64−p)+1. All integer arithmetic — no float leaves the
  * estimate helper.
  */
object Sketch {

  /** The HLL register table for the values of `valueCol`: one row per
    * non-empty bucket, (bucket ∈ [0, 2^p), register = max rho). Empty
    * buckets are simply absent (their register is 0 by convention —
    * [[hllEstimate]] accounts for them).
    */
  def hllRegisters(values: DataFrame, valueCol: String, p: Int = 8): DataFrame =
    hllRegistersBy(values, Nil, valueCol, p)

  /** Grouped register tables — one independent sketch per key combination
    * (≙ a cardinality agg nested under date_histogram/terms buckets):
    * same single map-side-combinable agg, output ≤ 2^p rows PER GROUP.
    * Non-string values hash via their canonical string rendering (cast),
    * which DuckDB/Spark agree on for integers.
    */
  def hllRegistersBy(values: DataFrame, groupCols: Seq[String],
                     valueCol: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val v: Column = col(valueCol).cast("string")
    val h1 = conv(substring(md5(v), 1, 8), 16, 10).cast("long")
    val h2 = conv(substring(md5(v), 9, 8), 16, 10).cast("long")
    val bucket = shiftright(h1, 32 - p)
    val rem = h1.bitwiseAND(lit((1L << (32 - p)) - 1))
    val w = shiftleft(rem, 32) + h2 // the (64-p)-bit stream; < 2^56 for p >= 8
    val width = 64 - p
    val rho = when(w === 0, lit(width + 1))
      .otherwise(lit(width + 1) - length(bin(w)))
    values.select(groupCols.map(col) ++
        Seq(bucket.as("bucket"), rho.cast("long").as("rho")): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rho").as("register"))
  }

  /** Count-min sketch (Cormode-Muthukrishnan 2005) for point frequency
    * estimation — the heavy-hitter / frequency-capping primitive a
    * training pipeline runs where an exact per-key count would shuffle the
    * whole key universe: `d`×`w` integer counters, one map-side-combinable
    * agg, output ≤ d·w rows regardless of input size, mergeable across
    * segments by elementwise SUM (the linearity that makes micro-batch
    * ingest additive). Estimates are one-sided: est(v) ≥ true(v) always,
    * and exceeds it only by colliding mass (≤ e·N/w with probability
    * 1−e^−d).
    *
    * Determinism contract (oracle-replayable): counter row i ∈ [0, d);
    * column = first-8-hex-chars of md5("i:value") mod w — integer-exact
    * end to end.
    */
  def cmsCounts(values: DataFrame, valueCol: String, weightCol: String,
                d: Int = 4, w: Int = 256): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2; got d=$d w=$w")
    val rows = values.select(col(valueCol).as("v"),
        col(weightCol).cast("long").as("wt"))
      .withColumn("row", explode(array((0 until d).map(lit): _*)))
    val cell = pmod(
      conv(substring(md5(concat(col("row").cast("string"), lit(":"), col("v"))),
        1, 8), 16, 10).cast("long"),
      lit(w.toLong))
    rows.select(col("row").cast("long").as("row"), cell.as("col"), col("wt"))
      .groupBy("row", "col").agg(sum("wt").as("cnt"))
  }

  /** Point estimate from a collected sketch: min over the d counters the
    * value hashes to (absent cells are 0). `sketch` is the ≤ d·w-row
    * output of [[cmsCounts]] — driver-sized by construction.
    */
  def cmsEstimate(sketch: DataFrame, value: String, d: Int = 4,
                  w: Int = 256): Long = {
    val cells = sketch.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until d).map { i =>
      val hex = md.digest(s"$i:$value".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      md.reset()
      val h = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      cells.getOrElse((i.toLong, h % w), 0L)
    }.min
  }

  /** The HLL estimate from a register table (≤ 2^p rows, collected — the
    * sketch is driver-sized by construction): alpha_m · m² / Σ 2^(−reg),
    * with the standard small-range linear-counting correction when the raw
    * estimate is under 2.5·m and empty buckets remain. Expected relative
    * error ≈ 1.04/√m (~6.5% at p = 8).
    */
  def hllEstimate(registers: DataFrame, p: Int = 8): Double = {
    val m = 1 << p
    val regs = registers.select("bucket", "register").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(regs.size <= m && regs.keys.forall(b => b >= 0 && b < m),
      s"register table inconsistent with p=$p")
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val sum = (0 until m).iterator
      .map(b => math.pow(2.0, -regs.getOrElse(b.toLong, 0L).toDouble)).sum
    val raw = alpha * m * m / sum
    val zeros = m - regs.size
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }
}
