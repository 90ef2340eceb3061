package graft

import graft.analysis.AnalyzerConfig
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Searcher, SimpleQuery, Topic}
import org.scalatest.funsuite.AnyFunSuite

/** SimpleQueryParser-subset semantics (≙ `BatchSearch.java:189-190,252`):
  * parse shapes, then end-to-end retrieval — `-` MUST_NOT excludes before
  * ranking, `+`/phrase force conjunction, `|` stays disjunctive.
  */
class SimpleQuerySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("parse: default OR, infix + and |, prefix -, phrase, * and ~N") {
    assert(SimpleQuery.parse("alpha beta") ==
      SimpleQuery(Seq("alpha", "beta"), Nil, Nil, Nil, Nil, conjunctive = false))
    assert(SimpleQuery.parse("alpha | beta") ==
      SimpleQuery(Seq("alpha", "beta"), Nil, Nil, Nil, Nil, conjunctive = false))
    assert(SimpleQuery.parse("alpha|beta") ==
      SimpleQuery(Seq("alpha", "beta"), Nil, Nil, Nil, Nil, conjunctive = false))
    assert(SimpleQuery.parse("alpha + beta") ==
      SimpleQuery(Seq("alpha", "beta"), Nil, Nil, Nil, Nil, conjunctive = true))
    assert(SimpleQuery.parse("alpha+beta") ==
      SimpleQuery(Seq("alpha", "beta"), Nil, Nil, Nil, Nil, conjunctive = true))
    assert(SimpleQuery.parse("alpha -beta gamma") ==
      SimpleQuery(Seq("alpha", "gamma"), Seq("beta"), Nil, Nil, Nil, conjunctive = false))
    assert(SimpleQuery.parse("\"alpha beta\" gamma") ==
      SimpleQuery(Seq("gamma"), Nil, Seq(("alpha beta", 0)), Nil, Nil, conjunctive = false))
    assert(SimpleQuery.parse("\"alpha beta\"~3 gamma") ==
      SimpleQuery(Seq("gamma"), Nil, Seq(("alpha beta", 3)), Nil, Nil, conjunctive = false))
    assert(SimpleQuery.parse("alph* beta") ==
      SimpleQuery(Seq("beta"), Nil, Nil, Seq("alph"), Nil, conjunctive = false))
    assert(SimpleQuery.parse("alpha~1 beta~ beta~9") ==
      SimpleQuery(Nil, Nil, Nil, Nil,
        Seq(("alpha", 1), ("beta", 2), ("beta", 2)), conjunctive = false))
    // a token mixing both infix operators splits on BOTH; '+' wins
    assert(SimpleQuery.parse("a|b+c") ==
      SimpleQuery(Seq("a", "b", "c"), Nil, Nil, Nil, Nil, conjunctive = true))
    intercept[IllegalArgumentException](SimpleQuery.parse("-alph*"))
    intercept[IllegalArgumentException](SimpleQuery.parse("-alpha~1"))
  }

  test("prefix expansion: constant score, OR and AND composition") {
    // alph* matches only "alpha"; docs containing alpha score exactly 1.0
    val or = searcher.searchQuery(Seq(Topic("1", "alph*")), 10).collect()
    assert(or.map(_.docno).toSet == Set("s-1", "s-2", "s-3"))
    assert(or.forall(_.score == 1.0f)) // CONSTANT_SCORE, once per doc
    // d* ∪ beta: delta docs get 1.0, beta docs add their BM25 partial
    val mixed = searcher.searchQuery(Seq(Topic("1", "d* beta")), 10)
      .collect().map(r => r.docno -> r.score).toMap
    assert(mixed.keySet == Set("s-1", "s-2", "s-3", "s-4"))
    assert(mixed("s-4") > 1.0f) // delta AND beta
    // AND with an empty expansion matches nothing
    val and = searcher.searchQuery(Seq(Topic("1", "zzz* + alpha")), 10).collect()
    assert(and.isEmpty)
    // AND: required term + prefix both present
    val and2 = searcher.searchQuery(Seq(Topic("1", "beta + d*")), 10)
      .collect().map(_.docno).toSet
    assert(and2 == Set("s-4")) // beta ∧ delta
  }

  test("fuzzy expansion: levenshtein over the vocabulary, blended scoring") {
    // "alpka"~1 → alpha (distance 1)
    val got = searcher.searchQuery(Seq(Topic("1", "alpka~1")), 10)
      .collect().map(_.docno).toSet
    assert(got == Set("s-1", "s-2", "s-3"))
    // distance 2 also reaches "delta"? levenshtein(alpka, delta) = 4 → no
    val far = searcher.searchQuery(Seq(Topic("1", "alpka~2")), 10)
      .collect().map(_.docno).toSet
    assert(far == Set("s-1", "s-2", "s-3"))
    // expandFuzzy returns (term, distance) in (distance asc, term asc) order
    assert(searcher.expandFuzzy("alpka", 2) == Seq(("alpha", 1)))
  }

  test("fuzzy scoring is blended-frequency, not constant") {
    // "deta"~1 expands to {beta(d=1), delta(d=1)}; blended df = max(df) and
    // each match scores BM25(tf, dl, blendedIdf) × (1 − d/min(|q|,|t|))
    val exps = searcher.expandFuzzy("deta", 1)
    assert(exps == Seq(("beta", 1), ("delta", 1)))
    val hits = searcher.searchQuery(Seq(Topic("1", "deta~1")), 10)
      .collect().map(r => r.docno -> r.score).toMap
    assert(hits.keySet == Set("s-1", "s-2", "s-3", "s-4"))
    // scores vary with tf/dl/boost — not a constant per doc
    assert(hits.values.toSet.size > 1)
    // s-4 holds BOTH expansions (beta + delta) → strictly the best score
    assert(hits("s-4") > hits.removed("s-4").values.max)
  }

  test("fuzzy composes with AND mode and dead expansions kill the query") {
    // deta~1 → {beta, delta}; conjunctive with gamma: only s-1 has
    // (beta ∨ delta) ∧ gamma
    val and = searcher.searchQuery(Seq(Topic("1", "deta~1 + gamma")), 10)
      .collect().map(_.docno).toSet
    assert(and == Set("s-1"))
    // an empty fuzzy expansion in AND mode matches nothing
    val dead = searcher.searchQuery(Seq(Topic("1", "zzzzz~1 + alpha")), 10)
      .collect()
    assert(dead.isEmpty)
    // …but in OR mode the query degrades to the other clauses
    val or = searcher.searchQuery(Seq(Topic("1", "zzzzz~1 alpha")), 10)
      .collect().map(_.docno).toSet
    assert(or == Set("s-1", "s-2", "s-3"))
  }

  private lazy val searcher: Searcher = {
    import spark.implicits._
    val corpus = Seq(
      "s-1" -> "alpha beta gamma",
      "s-2" -> "alpha beta",
      "s-3" -> "alpha delta",
      "s-4" -> "beta delta").toDF("docno", "content")
    val idx = IndexBuilder.build(corpus, TestSpark.tmpDir("sqp"),
      IndexConfig(analyzer = AnalyzerConfig()))
    new Searcher(idx)
  }

  test("searchQuery: '-' excludes matching docs BEFORE ranking (ranks close up)") {
    val got = searcher.searchQuery(Seq(Topic("1", "alpha -gamma")), 10)
      .collect().sortBy(_.rank).map(r => (r.docno, r.rank))
    // s-1 contains gamma → excluded entirely; remaining ranks contiguous
    assert(!got.map(_._1).contains("s-1"))
    assert(got.map(_._2).toSeq == got.indices.toSeq)
    assert(got.map(_._1).toSet == Set("s-2", "s-3"))
  }

  test("searchQuery: '+' requires every positive term (conjunctive)") {
    val got = searcher.searchQuery(Seq(Topic("1", "alpha + beta")), 10)
      .collect().map(_.docno).toSet
    assert(got == Set("s-1", "s-2"))
  }

  test("searchQuery: phrase degrades to conjunction on a no-positions index") {
    // the spec index stores no positions → documented fallback
    val got = searcher.searchQuery(Seq(Topic("1", "\"alpha delta\"")), 10)
      .collect().map(_.docno).toSet
    assert(got == Set("s-3"))
  }

  test("searchQuery: mixed-mode batch unions OR and AND topics") {
    val got = searcher.searchQuery(
        Seq(Topic("or1", "alpha delta"), Topic("and1", "alpha + delta")), 10)
      .collect().groupBy(_.qid).view.mapValues(_.map(_.docno).toSet).toMap
    assert(got("or1") == Set("s-1", "s-2", "s-3", "s-4"))
    assert(got("and1") == Set("s-3"))
  }

  test("searchQuery: conjunctive NOT composes with AND mode") {
    val got = searcher.searchQuery(Seq(Topic("1", "alpha + beta -gamma")), 10)
      .collect().map(_.docno).toSet
    assert(got == Set("s-2"))
  }

  test("searchQuery ranks match plain search when no operators are used") {
    val topics = Seq(Topic("7", "alpha beta"))
    val a = searcher.search(topics, 10).collect().sortBy(_.rank)
      .map(r => (r.docno, r.rank, r.score)).toSeq
    val b = searcher.searchQuery(topics, 10).collect().sortBy(_.rank)
      .map(r => (r.docno, r.rank, r.score)).toSeq
    assert(a == b)
  }
}
