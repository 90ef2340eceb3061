package graft

import graft.ops.Sketch
import org.scalatest.funsuite.AnyFunSuite

/** HyperLogLog registers + estimate (ops.Sketch): the register table must
  * equal a from-first-principles reimplementation of the documented hash
  * construction, the estimate must track exact cardinality within the
  * sketch's error bound, and registers must merge by elementwise max —
  * the property that makes the sketch unionable across segments.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val P = 8

  /** Independent reference: md5 via MessageDigest, same split/rho rules. */
  private def refRegisters(values: Seq[String], p: Int): Map[Long, Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    values.foldLeft(Map.empty[Long, Long]) { (regs, v) =>
      val hex = md.digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
      md.reset()
      val h1 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      val h2 = java.lang.Long.parseLong(hex.substring(8, 16), 16)
      val bucket = h1 >>> (32 - p)
      val w = ((h1 & ((1L << (32 - p)) - 1)) << 32) | h2
      val width = 64 - p
      val rho =
        if (w == 0) width + 1
        else width + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      regs.updated(bucket, math.max(regs.getOrElse(bucket, 0L), rho.toLong))
    }
  }

  private def registers(values: Seq[String]): Map[Long, Long] = {
    import spark.implicits._
    Sketch.hllRegisters(values.toDF("v"), "v", P).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("register table ≡ the independent MessageDigest reimplementation") {
    val values = (1 to 5000).map(i => s"value-$i")
    assert(registers(values) == refRegisters(values, P))
  }

  test("estimate tracks exact cardinality; duplicates don't move it") {
    import spark.implicits._
    val values = (1 to 5000).map(i => s"card-$i")
    val est = Sketch.hllEstimate(
      Sketch.hllRegisters(values.toDF("v"), "v", P), P)
    // 1.04/sqrt(256) ≈ 6.5% expected relative error; assert 3 sigma
    assert(math.abs(est - 5000) / 5000.0 < 0.20, s"estimate $est")
    val dup = Sketch.hllEstimate(
      Sketch.hllRegisters((values ++ values ++ values).toDF("v"), "v", P), P)
    assert(dup == est)
  }

  test("small-range linear counting keeps tiny cardinalities honest") {
    import spark.implicits._
    val values = (1 to 40).map(i => s"tiny-$i")
    val est = Sketch.hllEstimate(
      Sketch.hllRegisters(values.toDF("v"), "v", P), P)
    assert(math.abs(est - 40) / 40.0 < 0.15, s"estimate $est")
  }

  test("grouped registers ≡ one independent sketch per group") {
    import spark.implicits._
    val rows = (1 to 3000).map(i => (s"g${i % 3}", s"u-${i % 700}"))
    val grouped = Sketch.hllRegistersBy(rows.toDF("g", "v"), Seq("g"), "v", P)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val perGroup = rows.groupBy(_._1).flatMap { case (g, vs) =>
      registers(vs.map(_._2)).map { case (b, reg) => (g, b) -> reg }
    }
    assert(grouped == perGroup)
  }

  test("count-min estimates are one-sided and exact for isolated keys") {
    import spark.implicits._
    // skewed truth: key-i has weight i
    val truth = (1 to 300).map(i => (s"key-$i", i.toLong))
    val sketch = Sketch.cmsCounts(truth.toDF("v", "wt"), "v", "wt", 4, 256)
    val cells = sketch.collect()
    assert(cells.length <= 4 * 256)
    val total = truth.map(_._2).sum
    truth.foreach { case (v, t) =>
      val est = Sketch.cmsEstimate(sketch, v, 4, 256)
      assert(est >= t, s"$v: est $est < true $t") // one-sided, always
      // colliding mass is bounded by the sketch's whole budget
      assert(est <= t + total, s"$v: est $est")
    }
    // an unseen key can only read colliding mass, never invent a row
    assert(Sketch.cmsEstimate(sketch, "never-seen-xyz", 4, 256) <
      truth.map(_._2).max * 4)
  }

  test("count-min sketches merge by elementwise sum (linearity)") {
    import spark.implicits._
    val a = (1 to 200).map(i => (s"m-$i", (i % 7 + 1).toLong))
    val b = (100 to 280).map(i => (s"m-$i", (i % 5 + 1).toLong))
    def cells(rows: Seq[(String, Long)]): Map[(Long, Long), Long] =
      Sketch.cmsCounts(rows.toDF("v", "wt"), "v", "wt", 4, 64).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (ca, cb, cab) = (cells(a), cells(b), cells(a ++ b))
    val summed = (ca.keySet ++ cb.keySet).map(k =>
      k -> (ca.getOrElse(k, 0L) + cb.getOrElse(k, 0L))).toMap
    assert(cab == summed)
  }

  test("registers merge by elementwise max (segment-unionable)") {
    val a = (1 to 2000).map(i => s"left-$i")
    val b = (1 to 2000).map(i => s"right-$i")
    val merged = (registers(a).keySet ++ registers(b).keySet).map { k =>
      k -> math.max(registers(a).getOrElse(k, 0L), registers(b).getOrElse(k, 0L))
    }.toMap
    assert(registers(a ++ b) == merged)
  }
}
