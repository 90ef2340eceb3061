package graft

import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Searcher, Topic}
import org.scalatest.funsuite.AnyFunSuite

/** search_after cursors (Searcher.searchAfter), per-group top hits
  * (Searcher.topHits) and function-score boosting
  * (Searcher.searchFunctionScore): the three retrieval compositions layered
  * on the shared scored stream.
  */
class SearchExtrasSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val docs = Seq(
    ("a-1", "ra", "hot hot hot hot"),
    ("a-2", "ra", "hot hot hot"),
    ("a-3", "ra", "hot hot"),
    ("b-1", "rb", "hot cold filler words here"),
    ("b-2", "rb", "cold only"),
    ("c-1", "rc", "warm warm"),
    ("c-2", "rc", "warm warm"))

  private lazy val fixture = {
    import spark.implicits._
    val dir = TestSpark.tmpDir("searchextras")
    val corpus = docs.map(d => (d._1, d._3)).toDF("docno", "content")
    val idx = IndexBuilder.build(corpus, dir, IndexConfig())
    val s = new Searcher(idx)
    val keys = s.collapseKeyTable(
      docs.map(d => (d._1, d._2)).toDF("docno", "repo"), "repo")
    (s, keys)
  }

  test("search_after continuation ≡ the tail of the full ordering") {
    val (s, _) = fixture
    val topic = Seq(Topic("1", "hot"))
    val full = s.search(topic, 4).collect().sortBy(_.rank)
    val page1 = full.take(2)
    val cursor = Map("1" -> (page1.last.score, page1.last.docno))
    val page2 = s.searchAfter(topic, cursor, 2).collect().sortBy(_.rank)
    assert(page2.map(_.docno).toSeq == full.drop(2).take(2).map(_.docno).toSeq)
    // the continuation never re-returns the cursor hit, and restarts ranks
    assert(!page2.exists(_.docno == page1.last.docno))
    assert(page2.map(_.rank).toSeq == Seq(0, 1))
  }

  test("search_after resumes inside an exact score tie by docid") {
    val (s, _) = fixture
    // c-1/c-2 have identical content, hence bit-equal scores; a cursor at
    // c-1 must resume at c-2, not skip or repeat the tie group
    val topic = Seq(Topic("1", "warm"))
    val full = s.search(topic, 2).collect().sortBy(_.rank)
    assert(full.map(_.docno).toSeq == Seq("c-1", "c-2"))
    assert(full(0).score == full(1).score)
    val after = s.searchAfter(topic,
      Map("1" -> (full(0).score, full(0).docno)), 2).collect()
    assert(after.map(_.docno).toSeq == Seq("c-2"))
  }

  test("search_after: topics without a cursor start from rank 0") {
    val (s, _) = fixture
    val topics = Seq(Topic("1", "hot"), Topic("2", "cold"))
    val h = s.search(Seq(topics.head), 1).collect().head
    val out = s.searchAfter(topics, Map("1" -> (h.score, h.docno)), 10)
      .collect().groupBy(_.qid)
    // qid 1 resumed after its top hit; qid 2 got its full ranking
    assert(!out("1").exists(_.docno == h.docno))
    val cold = s.search(Seq(topics(1)), 10).collect().sortBy(_.rank)
    assert(out("2").sortBy(_.rank).map(_.docno).toSeq ==
      cold.map(_.docno).toSeq)
  }

  test("search_after rejects a cursor docno the index does not hold") {
    val (s, _) = fixture
    intercept[IllegalArgumentException] {
      s.searchAfter(Seq(Topic("1", "hot")), Map("1" -> (1.0f, "nope")), 2)
    }
  }

  test("top_hits returns every group's bounded best list, not a filter of the global top-k") {
    val (s, keys) = fixture
    // global top-2 on "hot" is all repo A, yet rb must still surface b-1
    val rows = s.topHits(Seq(Topic("1", "hot")), keys, 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    val byKey = rows.groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(byKey("ra") == Seq("a-1", "a-2")) // n-bounded: a-3 cut
    assert(byKey("rb") == Seq("b-1"))        // outside the global top-2
    assert(!byKey.contains("rc"))            // no match, no group
  }

  test("top_hits ranks within a group by (score desc, docid asc)") {
    val (s, keys) = fixture
    val rows = s.topHits(Seq(Topic("1", "warm")), keys, 5).collect()
      .map(r => (r.getString(2), r.getLong(3))).sortBy(_._2)
    // bit-equal scores: the tie breaks by docid, like the collector
    assert(rows.map(_._1).toSeq == Seq("c-1", "c-2"))
  }

  test("function_score multiplies after clause summation and reorders") {
    import spark.implicits._
    val (s, _) = fixture
    // plain "hot": a-1 > a-2 > a-3 > b-1; a factor of 8 on b-1 and 1
    // elsewhere must put b-1 first; docs without a row keep missing=1
    val plain = s.search(Seq(Topic("1", "hot")), 4).collect().sortBy(_.rank)
    assert(plain.head.docno == "a-1")
    val factors = s.factorTable(
      Seq(("b-1", 8.0f)).toDF("docno", "f"),
      org.apache.spark.sql.functions.col("f"))
    val boosted = s.searchFunctionScore(Seq(Topic("1", "hot")), factors, 4)
      .collect().sortBy(_.rank)
    assert(boosted.head.docno == "b-1")
    assert(boosted.map(_.docno).toSet == plain.map(_.docno).toSet)
    // the boosted score is the plain score × factor, in Float
    val pb = plain.find(_.docno == "b-1").get.score
    assert(boosted.head.score == pb * 8.0f)
    // unboosted docs keep their plain scores (missing = multiply by 1)
    assert(boosted.find(_.docno == "a-1").get.score == plain.head.score)
  }
}
