package graft

import graft.analysis.AnalyzerConfig
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Searcher, Topic}
import org.scalatest.funsuite.AnyFunSuite

/** DisjunctionMaxQuery (max + tie·rest) and the boosting query (demote,
  * don't exclude), verified against the plain OR run's per-doc partials.
  */
class DisMaxBoostSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val corpus = Seq(
    "b-1" -> "apple apple apple",        // one strong clause
    "b-2" -> "apple pear",               // two moderate clauses
    "b-3" -> "pear pear plum",           // two clauses, one repeated
    "b-4" -> "plum alone here",
    "b-5" -> "apple pear bad")           // the boosting victim

  private lazy val searcher: Searcher = {
    import spark.implicits._
    val dir = TestSpark.tmpDir("dismax")
    new Searcher(IndexBuilder.build(corpus.toDF("docno", "content"), dir,
      IndexConfig(analyzer = AnalyzerConfig())))
  }

  private val topic = Topic("t", "apple pear plum")

  test("tie=1 equals the OR sum; tie=0 is the pure max") {
    val or = searcher.search(Seq(topic), 10).collect()
      .map(l => l.docno -> l.score).toMap
    val tie1 = searcher.searchDisMax(Seq(topic), 10, tieBreaker = 1.0f)
      .collect().map(l => l.docno -> l.score).toMap
    assert(tie1.keySet == or.keySet)
    tie1.foreach { case (d, s) =>
      assert(math.abs(s - or(d)) <= math.ulp(or(d)) * 4, s"$d: $s vs ${or(d)}")
    }
    // tie=0: every doc scores exactly its best single clause — b-2 must
    // drop below b-1 (its two moderate partials no longer add)
    val tie0 = searcher.searchDisMax(Seq(topic), 10, tieBreaker = 0.0f)
      .collect().map(l => l.docno -> l.score).toMap
    assert(tie0.keySet == or.keySet)
    tie0.foreach { case (d, s) => assert(s <= or(d) + math.ulp(or(d))) }
  }

  test("intermediate tie ranks by max + tie·rest") {
    val got = searcher.searchDisMax(Seq(topic), 10, tieBreaker = 0.3f)
      .collect().sortBy(_.rank).map(_.docno).toSeq
    assert(got.toSet == Set("b-1", "b-2", "b-3", "b-4", "b-5"))
  }

  test("a repeated topic term scores once (sub-queries are a set, like the oracle's DISTINCT)") {
    // tie=1 is the OR sum, where a double-counted clause would be visible:
    // "apple apple pear" must score exactly like "apple pear" (ADVICE r5 —
    // the oracle dedupes via SELECT DISTINCT qid, term)
    val rep = searcher.searchDisMax(Seq(Topic("t", "apple apple pear")), 10,
        tieBreaker = 1.0f).collect().map(l => l.docno -> l.score).toMap
    val once = searcher.searchDisMax(Seq(Topic("t", "apple pear")), 10,
        tieBreaker = 1.0f).collect().map(l => l.docno -> l.score).toMap
    assert(rep == once)
  }

  test("boosting demotes matching docs without removing them") {
    val base = searcher.search(Seq(topic), 10).collect()
      .map(l => l.docno -> l.score).toMap
    val got = searcher.searchBoosting(Seq(topic), Seq(("t", "bad")), 0.5f, 10)
      .collect()
    val byDoc = got.map(l => l.docno -> l.score).toMap
    assert(byDoc.keySet == base.keySet) // nothing excluded
    assert(byDoc("b-5") == base("b-5") * 0.5f) // exact demote
    (byDoc.keySet - "b-5").foreach(d => assert(byDoc(d) == base(d)))
  }

  test("boosting parameter bounds are enforced") {
    intercept[IllegalArgumentException] {
      searcher.searchBoosting(Seq(topic), Seq(("t", "bad")), 1.5f, 10)
    }
    intercept[IllegalArgumentException] {
      searcher.searchDisMax(Seq(topic), 10, tieBreaker = 2.0f)
    }
  }
}
