package graft

import graft.index.SortedDocs
import org.scalatest.funsuite.AnyFunSuite

/** Index-time sorting ([[graft.index.SortedDocs]], ≙ Lucene
  * setIndexSort + TopFieldCollector early termination): correctness of
  * the prefix scan against a brute-force sort, the early-termination
  * observable (partitions actually opened), direction, filtering, and
  * checkpoint resume.
  */
class IndexSortSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 64 docs, keys deliberately NOT aligned with docno order
  private lazy val corpus = {
    import spark.implicits._
    (0 until 64).map { i =>
      (f"d-$i%03d", f"k-${(i * 37) % 64}%03d", s"body $i")
    }.toDF("docno", "path", "content")
  }

  private lazy val table =
    SortedDocs.build(corpus.select("docno", "path"), "path",
      TestSpark.tmpDir("sorted_docs"))

  private lazy val brute: Seq[(String, String)] = {
    corpus.select("path", "docno").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(identity).toSeq
  }

  test("ascending top-k equals the brute-force sort, from a prefix") {
    assert(table.topByKey(5) == brute.take(5))
    // 64 rows over 32 range partitions = 2 rows/partition; k=5 needs at
    // most the first 4 partitions via the doubling batches (1 + 2 + 4)
    assert(table.lastPartsScanned <= 7,
      s"early termination lost: ${table.lastPartsScanned} partitions read")
    assert(table.topByKey(64) == brute)
  }

  test("descending top-k scans the suffix") {
    assert(table.topByKey(5, asc = false) ==
      brute.reverse.take(5).map { case (k, d) => (k, d) })
    assert(table.lastPartsScanned <= 7)
  }

  test("filtered top-k widens the prefix only until k survive") {
    import spark.implicits._
    // survivors = even doc numbers; top-3 of the filtered brute order
    val keep = (0 until 64 by 2).map(i => f"d-$i%03d")
    val expect = brute.filter(p => keep.contains(p._2)).take(3)
    val got = table.topByKey(3,
      filterDocnos = Some(keep.toDF("docno")))
    assert(got == expect)
    assert(table.lastPartsScanned < 32)
  }

  test("build resumes from the checkpoint manifest") {
    val dir = TestSpark.tmpDir("sorted_docs_resume")
    SortedDocs.build(corpus.select("docno", "path"), "path", dir)
    // second build with the same corpus fingerprint must not rewrite —
    // the data directory's mtime set is unchanged
    val before = new java.io.File(s"$dir/data").lastModified()
    val again = SortedDocs.build(corpus.select("docno", "path"), "path", dir)
    assert(new java.io.File(s"$dir/data").lastModified() == before)
    assert(again.topByKey(2) == brute.take(2))
  }
}
