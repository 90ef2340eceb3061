package graft

import graft.ops.Curation
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpusDF(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (f"doc-$i%04d", s"word " * (i % 7 + 1)))
      .toDF("docno", "content")
  }

  test("stratifiedSample: n smallest per stratum, brute-force identical " +
    "under any partitioning") {
    import spark.implicits._
    val df = (0 until 200).map(i => (f"doc-$i%04d", s"g${i % 3}"))
      .toDF("docno", "lang")
    val got = Curation.stratifiedSample(df.repartition(7), "lang", "s1", 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._3)).toSeq
    // brute force: per group, sort by (md5('s1:'||docno), docno), take 4
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s"s1:$s".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = (0 until 200).map(i => (f"doc-$i%04d", s"g${i % 3}"))
      .groupBy(_._2).toSeq.flatMap { case (g, ds) =>
        ds.map(d => (h(d._1), d._1)).sorted.take(4).zipWithIndex
          .map { case ((_, docno), i) => (g, docno, (i + 1).toLong) }
      }.sortBy(t => (t._1, t._3))
    assert(got == want)
    // strata smaller than n return whole stratum, still ranked
    val tiny = Seq(("a", "g0"), ("b", "g0"), ("c", "g1")).toDF("docno", "lang")
    val t = Curation.stratifiedSample(tiny, "lang", "s1", 4).collect()
    assert(t.length == 3 && t.map(_.getLong(2)).forall(_ >= 1))
  }

  test("hashSample: deterministic, ~keep/buckets rate, bucket formula") {
    val c = corpusDF(400)
    val a = Curation.hashSample(c, "s1", 20, 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val b = Curation.hashSample(c, "s1", 20, 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(a.sorted.sameElements(b.sorted)) // stable across runs
    assert(a.forall(_._2 < 2))
    // ~10% of 400 with md5 uniformity; wide tolerance, zero flake
    assert(a.length > 10 && a.length < 110)
    // different salt ⇒ different sample
    val s2 = Curation.hashSample(c, "s2", 20, 2).collect().map(_.getString(0))
    assert(s2.toSet != a.map(_._1).toSet)
  }

  test("seededShuffle: a permutation, ordered by (md5, docno)") {
    val c = corpusDF(300)
    val rows = Curation.seededShuffle(c, "s1").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 300)
    assert(rows.map(_._2).sorted.sameElements(0L until 300L)) // exact 0..n-1
    // matches the local single-threaded definition
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md.digest(s"s1:$s".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expect = (0 until 300).map(i => f"doc-$i%04d")
      .sortBy(d => (hex(d), d)).zipWithIndex
      .map { case (d, i) => (d, i.toLong) }
    assert(rows.sortBy(_._2).toSeq == expect)
  }

  test("packSequences: chunk/offset replay the serial concat-and-chunk") {
    import spark.implicits._
    val toks = (0 until 200).map(i => (f"doc-$i%04d", (i % 90 + 1).toLong))
      .toDF("docno", "n_tokens")
    val got = Curation.packSequences(toks, 128).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    var cum = 0L
    val expect = (0 until 200).map { i =>
      val w = (i % 90 + 1).toLong
      val r = (f"doc-$i%04d", w, cum / 128, cum % 128)
      cum += w
      r
    }
    assert(got.toSeq == expect)
    // docs genuinely span chunk boundaries in this fixture
    assert(got.map(_._3).distinct.length > 1)
  }

  test("cumBefore: exclusive prefix sum across many partitions") {
    import spark.implicits._
    val keyed = (0 until 1000).map(i => (f"k$i%05d", f"d$i%05d", (i % 13).toLong))
      .toDF("skey", "docno", "w").repartition(17) // scrambled input layout
    val got = Curation.cumBefore(keyed).collect()
      .map(r => (r.getString(0), r.getLong(2))).sortBy(_._1)
    var cum = 0L
    val expect = (0 until 1000).map { i =>
      val r = (f"d$i%05d", cum)
      cum += (i % 13).toLong
      r
    }
    assert(got.toSeq == expect)
  }

  test("chunkWindows: closed-form window count, overlap, boundary, empty doc") {
    import spark.implicits._
    import graft.ops.Curation
    val c = Seq(
      ("c-1", (1 to 10).map(i => s"t$i").mkString(" ")), // n=10: 3 windows
      ("c-2", (1 to 4).map(i => s"u$i").mkString(" ")),  // n == size: 1
      ("c-3", (1 to 5).map(i => s"v$i").mkString(" ")),  // n = size+1: 2
      ("c-4", "")                                        // empty: 1 empty
    ).toDF("docno", "content")
    val got = Curation.chunkWindows(c, size = 4, stride = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got.filter(_._1 == "c-1") == Seq(
      ("c-1", 0L, 4L, "t1 t2 t3 t4"),
      ("c-1", 1L, 4L, "t4 t5 t6 t7"),   // 1-token overlap
      ("c-1", 2L, 4L, "t7 t8 t9 t10")))
    assert(got.filter(_._1 == "c-2") == Seq(("c-2", 0L, 4L, "u1 u2 u3 u4")))
    assert(got.filter(_._1 == "c-3") == Seq(
      ("c-3", 0L, 4L, "v1 v2 v3 v4"), ("c-3", 1L, 2L, "v4 v5")))
    assert(got.filter(_._1 == "c-4") == Seq(("c-4", 0L, 0L, "")))
    intercept[IllegalArgumentException](
      Curation.chunkWindows(c, size = 4, stride = 5))
  }
}
