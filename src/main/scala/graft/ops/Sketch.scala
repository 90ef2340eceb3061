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
  def hllRegisters(values: DataFrame, valueCol: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val v: Column = col(valueCol)
    val h1 = conv(substring(md5(v), 1, 8), 16, 10).cast("long")
    val h2 = conv(substring(md5(v), 9, 8), 16, 10).cast("long")
    val bucket = shiftright(h1, 32 - p)
    val rem = h1.bitwiseAND(lit((1L << (32 - p)) - 1))
    val w = shiftleft(rem, 32) + h2 // the (64-p)-bit stream; < 2^56 for p >= 8
    val width = 64 - p
    val rho = when(w === 0, lit(width + 1))
      .otherwise(lit(width + 1) - length(bin(w)))
    values.select(bucket.as("bucket"), rho.cast("long").as("rho"))
      .groupBy("bucket").agg(max("rho").as("register"))
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
