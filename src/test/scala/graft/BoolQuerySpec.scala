package graft

import graft.analysis.AnalyzerConfig
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{BoolQuery, Searcher, Topic}
import org.scalatest.funsuite.AnyFunSuite

/** Lucene-SimpleQueryParser-faithful boolean trees: parse shapes (the
  * left-associative operator batching, the `-` match-all wrap and its
  * folkloric gotchas, groups, escapes), tree evaluation, and end-to-end
  * retrieval through `searchQuery`.
  */
class BoolQuerySpec extends AnyFunSuite {
  import BoolQuery._
  private lazy val spark = TestSpark.spark

  /** Literal leaves, except "the" which dies like a stopword. */
  private object RawLeaves extends LeafFactory {
    def token(text: String): Option[Node] =
      if (text == "the") None else Some(TermLeaf(text))
    def phrase(text: String, slop: Int): Option[Node] =
      Some(PhraseLeaf(text.split("\\s+").toSeq.zipWithIndex, slop))
    def prefix(text: String): Option[Node] = Some(PrefixLeaf(text))
    def fuzzy(text: String, maxEdits: Int): Option[Node] =
      Some(FuzzyLeaf(text, maxEdits))
  }
  private def p(text: String): Node = BoolQuery.parse(text, RawLeaves).get
  private def t(s: String): Node = TermLeaf(s)

  test("parse: default OR flattens, explicit operators batch left-associatively") {
    assert(p("a") == t("a"))
    assert(p("a b") == BoolNode(Vector(Should -> t("a"), Should -> t("b"))))
    assert(p("a b c") ==
      BoolNode(Vector(Should -> t("a"), Should -> t("b"), Should -> t("c"))))
    assert(p("a + b") == BoolNode(Vector(Must -> t("a"), Must -> t("b"))))
    assert(p("a | b") == BoolNode(Vector(Should -> t("a"), Should -> t("b"))))
    // operator CHANGE wraps the tree so far as the first clause of a new node
    assert(p("a b + c") == BoolNode(Vector(
      Must -> BoolNode(Vector(Should -> t("a"), Should -> t("b"))),
      Must -> t("c"))))
    assert(p("a + b | c") == BoolNode(Vector(
      Should -> BoolNode(Vector(Must -> t("a"), Must -> t("b"))),
      Should -> t("c"))))
    // infix operators terminate tokens: a|b+c ≡ a | b + c ⇒ (a OR b) AND c
    assert(p("a|b+c") == BoolNode(Vector(
      Must -> BoolNode(Vector(Should -> t("a"), Should -> t("b"))),
      Must -> t("c"))))
    // only the FIRST operator between two clauses counts
    assert(p("a + | b") == BoolNode(Vector(Must -> t("a"), Must -> t("b"))))
    // a leading operator has no left operand and is dropped
    assert(p("+ a b") == BoolNode(Vector(Should -> t("a"), Should -> t("b"))))
  }

  test("parse: '-' wraps as (MUST_NOT x, SHOULD match-all), with the stopword quirks") {
    val negA = BoolNode(Vector(MustNot -> t("a"), Should -> MatchAllNode))
    assert(p("-a") == negA)
    assert(p("--a") == t("a")) // double negation cancels
    assert(p("b -a") == BoolNode(Vector(Should -> t("b"), Should -> negA)))
    // a dead (stopword) clause leaves the armed operator AND the pending
    // '-' for the NEXT clause — Lucene's null-branch behavior
    assert(p("a + the b") == BoolNode(Vector(Must -> t("a"), Must -> t("b"))))
    assert(p("-the b") == BoolNode(Vector(MustNot -> t("b"), Should -> MatchAllNode)))
  }

  test("parse: groups, group negation, '()' operator reset, unbalanced recovery") {
    assert(p("(a b) c") == BoolNode(Vector(
      Should -> BoolNode(Vector(Should -> t("a"), Should -> t("b"))),
      Should -> t("c"))))
    assert(p("(a + b) | c") == BoolNode(Vector(
      Should -> BoolNode(Vector(Must -> t("a"), Must -> t("b"))),
      Should -> t("c"))))
    assert(p("-(a b) c") == BoolNode(Vector(
      Should -> BoolNode(Vector(
        MustNot -> BoolNode(Vector(Should -> t("a"), Should -> t("b"))),
        Should -> MatchAllNode)),
      Should -> t("c"))))
    // '()' resets a pending operator, so the default OR applies
    assert(p("a + () b") == BoolNode(Vector(Should -> t("a"), Should -> t("b"))))
    // unmatched '(' is dropped; its tail parses at the current level
    assert(p("(a b") == BoolNode(Vector(Should -> t("a"), Should -> t("b"))))
    // stray ')' is ignored
    assert(p(") a") == t("a"))
  }

  test("parse: phrases, slop, prefix, fuzzy, escapes, lone '*'") {
    assert(p("\"x y\"") == PhraseLeaf(Seq(("x", 0), ("y", 1)), 0))
    assert(p("\"x y\"~3") == PhraseLeaf(Seq(("x", 0), ("y", 1)), 3))
    assert(p("\"x y\"~") == PhraseLeaf(Seq(("x", 0), ("y", 1)), 2)) // bare ~ ⇒ 2
    assert(p("ab*") == PrefixLeaf("ab"))
    assert(p("ab~") == FuzzyLeaf("ab", 2))
    assert(p("ab~1") == FuzzyLeaf("ab", 1))
    assert(p("ab~9") == FuzzyLeaf("ab", 2)) // clamped to Lucene's max
    assert(p("ab~1x") == t("ab~1x"))        // '~' not in operator position
    assert(p("alpha~1 beta~ beta~9") == BoolNode(Vector(
      Should -> FuzzyLeaf("alpha", 1),
      Should -> FuzzyLeaf("beta", 2),
      Should -> FuzzyLeaf("beta", 2))))
    // negated multi-term queries are legal in the tree model
    assert(p("-ab*") == BoolNode(Vector(MustNot -> PrefixLeaf("ab"), Should -> MatchAllNode)))
    // '\' escapes strip operator meaning
    assert(p("te\\*t") == t("te*t"))
    assert(p("ab\\~2") == t("ab~2"))
    assert(p("\\-a") == t("-a"))
    assert(p("\\(a") == t("(a"))
    assert(p("\"a \\\" b\"") == PhraseLeaf(Seq(("a", 0), ("\"", 1), ("b", 2)), 0))
    // a whole query of '*' is match-all; empty/dead queries parse to None
    assert(p(" * ") == MatchAllNode)
    assert(BoolQuery.parse("the", RawLeaves).isEmpty)
    assert(BoolQuery.parse("  ", RawLeaves).isEmpty)
    assert(BoolQuery.parse("+ -", RawLeaves).isEmpty)
  }

  test("eval: boolean match semantics and per-node coord") {
    val noCoord = (_: Int, _: Int) => 1.0f
    def sc(m: Map[Int, Float]): Int => Float = q => m.getOrElse(q, Float.NaN)
    val or = EBool(Array(1 -> ELeaf(0), 1 -> ELeaf(1)))
    assert(eval(or, sc(Map(0 -> 2.0f)), noCoord) == 2.0f)
    assert(eval(or, sc(Map(0 -> 2.0f, 1 -> 3.0f)), noCoord) == 5.0f)
    assert(eval(or, sc(Map.empty), noCoord).isNaN)
    val and = EBool(Array(0 -> ELeaf(0), 0 -> ELeaf(1)))
    assert(eval(and, sc(Map(0 -> 2.0f)), noCoord).isNaN)
    assert(eval(and, sc(Map(0 -> 2.0f, 1 -> 3.0f)), noCoord) == 5.0f)
    // MUST_NOT rejects; a matched MUST makes SHOULD optional
    val mixed = EBool(Array(0 -> ELeaf(0), 1 -> ELeaf(1), 2 -> ELeaf(2)))
    assert(eval(mixed, sc(Map(0 -> 1.0f)), noCoord) == 1.0f)
    assert(eval(mixed, sc(Map(0 -> 1.0f, 1 -> 2.0f)), noCoord) == 3.0f)
    assert(eval(mixed, sc(Map(0 -> 1.0f, 2 -> 9.0f)), noCoord).isNaN)
    // negation wrap: unmatched leaf ⇒ the match-all constant scores
    val wrap = EBool(Array(2 -> ELeaf(0), 1 -> EConst(1.0f)))
    assert(eval(wrap, sc(Map.empty), noCoord) == 1.0f)
    assert(eval(wrap, sc(Map(0 -> 5.0f)), noCoord).isNaN)
    // coord counts scoring clauses only (MUST_NOT excluded from maxOverlap)
    val coord = (overlap: Int, max: Int) => overlap.toFloat / max
    assert(eval(mixed, sc(Map(0 -> 1.0f)), coord) == 0.5f)
    // nested: coord applies per node (inner 1-of-2 halves, outer 2-of-2 not)
    val nested = EBool(Array(1 -> or, 1 -> ELeaf(2)))
    assert(eval(nested, sc(Map(0 -> 2.0f, 2 -> 4.0f)), coord) == 2.0f * 0.5f + 4.0f)
  }

  // --- end-to-end through a tiny index (no positions) ---------------------

  private lazy val searcher: Searcher = {
    import spark.implicits._
    val corpus = Seq(
      "s-1" -> "alpha beta gamma",
      "s-2" -> "alpha beta",
      "s-3" -> "alpha delta",
      "s-4" -> "beta delta").toDF("docno", "content")
    val idx = IndexBuilder.build(corpus, TestSpark.tmpDir("boolq"),
      IndexConfig(analyzer = AnalyzerConfig()))
    new Searcher(idx)
  }

  test("searchQuery: '-' under default OR adds the match-all branch, not an exclusion") {
    // The classic simple_query_string gotcha: "alpha -gamma" ⇒
    // alpha OR (NOT gamma): gamma docs that match alpha STAY (without the
    // +1 bonus), and alpha-free gamma-free docs enter at the constant 1.
    val got = searcher.searchQuery(Seq(Topic("1", "alpha -gamma")), 10)
      .collect().sortBy(_.rank)
    assert(got.map(_.docno).toSet == Set("s-1", "s-2", "s-3", "s-4"))
    assert(got.last.docno == "s-1") // only doc with gamma: no +1 branch
    assert(got.map(_.rank).toSeq == got.indices.toSeq)
    // pure negation matches exactly the complement, at the constant score
    val pure = searcher.searchQuery(Seq(Topic("1", "-alpha")), 10).collect()
    assert(pure.map(_.docno).toSeq == Seq("s-4"))
    assert(pure.head.score == 1.0f)
    // match-all query: every doc, constant score, docid-ordered ties
    val all = searcher.searchQuery(Seq(Topic("1", "*")), 10)
      .collect().sortBy(_.rank)
    assert(all.map(_.docno).toSeq == Seq("s-1", "s-2", "s-3", "s-4"))
    assert(all.forall(_.score == 1.0f))
  }

  test("searchQuery: duplicate qids are rejected, not silently merged") {
    // treeB is keyed by qid (last-wins) while clause builders accumulate
    // for every topic — colliding qids would mix both topics' partials
    val e = intercept[IllegalArgumentException] {
      searcher.searchQuery(Seq(Topic("1", "alpha"), Topic("1", "beta")), 10)
    }
    assert(e.getMessage.contains("distinct qids"))
  }

  test("searchQuery: match-all complement scans grp partitions k-bounded") {
    import spark.implicits._
    // 16 docs over 8 grp partitions (deterministic ntile packing: docid
    // ascending = docno ascending, 2 docs per grp)
    val corpus = (1 to 16).map(i => f"c-$i%02d" -> f"term$i%02d filler")
      .toDF("docno", "content")
    val idx = IndexBuilder.build(corpus, TestSpark.tmpDir("boolq-comp"),
      IndexConfig(analyzer = AnalyzerConfig(), rangePartitions = 8))
    val s = new Searcher(idx)
    assert(idx.docGrps.length == 8)
    // k=3 pure negation: all complement rows tie at the constant score with
    // docid-asc tie-break, so the doubling batch scan stops after 3 of the
    // 8 partitions (1+2) — the rest of the corpus is never read
    val got = s.searchQuery(Seq(Topic("1", "-term09")), 3)
      .collect().sortBy(_.rank)
    assert(got.map(_.docno).toSeq == Seq("c-01", "c-02", "c-03"))
    assert(got.forall(_.score == 1.0f))
    assert(s.lastComplementGrpsScanned == 3)
    // k past the corpus: the scan exhausts every partition and yields the
    // exact complement (the doc holding only the negated term stays out)
    val all = s.searchQuery(Seq(Topic("1", "-term09")), 100)
      .collect().sortBy(_.rank)
    assert(all.map(_.docno).toSeq ==
      (1 to 16).filterNot(_ == 9).map(i => f"c-$i%02d"))
    assert(s.lastComplementGrpsScanned == 8)
  }

  test("searchQuery: left-associative chains and groups change the matched set") {
    // alpha + beta -gamma ⇒ (alpha AND beta) OR (NOT gamma) — all four docs
    val chain = searcher.searchQuery(Seq(Topic("1", "alpha + beta -gamma")), 10)
      .collect().sortBy(_.rank)
    assert(chain.map(_.docno).toSet == Set("s-1", "s-2", "s-3", "s-4"))
    assert(chain.head.docno == "s-2") // alpha+beta AND the +1 branch
    // (alpha + delta) | beta ⇒ s-3 via the group, beta docs via the OR
    val grouped = searcher.searchQuery(Seq(Topic("1", "(alpha + delta) | beta")), 10)
      .collect().map(_.docno).toSet
    assert(grouped == Set("s-1", "s-2", "s-3", "s-4"))
    // group under MUST: (alpha | delta) + beta ⇒ beta docs containing either
    val andGroup = searcher.searchQuery(Seq(Topic("1", "(alpha | delta) + beta")), 10)
      .collect().map(_.docno).toSet
    assert(andGroup == Set("s-1", "s-2", "s-4"))
  }

  test("searchQuery: '+' requires every term; phrase degrades to MUST group without positions") {
    val and = searcher.searchQuery(Seq(Topic("1", "alpha + beta")), 10)
      .collect().map(_.docno).toSet
    assert(and == Set("s-1", "s-2"))
    val ph = searcher.searchQuery(Seq(Topic("1", "\"alpha delta\"")), 10)
      .collect().map(_.docno).toSet
    assert(ph == Set("s-3"))
  }

  test("searchQuery ranks match plain search when no operators are used") {
    val topics = Seq(Topic("7", "alpha beta"))
    val a = searcher.search(topics, 10).collect().sortBy(_.rank)
      .map(r => (r.docno, r.rank, r.score)).toSeq
    val b = searcher.searchQuery(topics, 10).collect().sortBy(_.rank)
      .map(r => (r.docno, r.rank, r.score)).toSeq
    assert(a == b)
  }

  test("prefix expansion: constant score, OR and MUST composition") {
    val or = searcher.searchQuery(Seq(Topic("1", "alph*")), 10).collect()
    assert(or.map(_.docno).toSet == Set("s-1", "s-2", "s-3"))
    assert(or.forall(_.score == 1.0f)) // CONSTANT_SCORE, once per doc
    val mixed = searcher.searchQuery(Seq(Topic("1", "d* beta")), 10)
      .collect().map(r => r.docno -> r.score).toMap
    assert(mixed.keySet == Set("s-1", "s-2", "s-3", "s-4"))
    assert(mixed("s-4") > 1.0f) // delta AND beta
    val dead = searcher.searchQuery(Seq(Topic("1", "zzz* + alpha")), 10).collect()
    assert(dead.isEmpty) // MUST on an empty expansion matches nothing
    val and2 = searcher.searchQuery(Seq(Topic("1", "beta + d*")), 10)
      .collect().map(_.docno).toSet
    assert(and2 == Set("s-4"))
  }

  test("fuzzy expansion: blended scoring, MUST composition, dead expansions") {
    val got = searcher.searchQuery(Seq(Topic("1", "alpka~1")), 10)
      .collect().map(_.docno).toSet
    assert(got == Set("s-1", "s-2", "s-3"))
    assert(searcher.expandFuzzy("alpka", 2) == Seq(("alpha", 1)))
    // "deta"~1 ⇒ {beta, delta}: blended df, boost 1 − d/min(|q|,|t|)
    assert(searcher.expandFuzzy("deta", 1) == Seq(("beta", 1), ("delta", 1)))
    val hits = searcher.searchQuery(Seq(Topic("1", "deta~1")), 10)
      .collect().map(r => r.docno -> r.score).toMap
    assert(hits.keySet == Set("s-1", "s-2", "s-3", "s-4"))
    assert(hits.values.toSet.size > 1) // scored, not constant
    assert(hits("s-4") > hits.removed("s-4").values.max) // holds BOTH expansions
    val and = searcher.searchQuery(Seq(Topic("1", "deta~1 + gamma")), 10)
      .collect().map(_.docno).toSet
    assert(and == Set("s-1"))
    assert(searcher.searchQuery(Seq(Topic("1", "zzzzz~1 + alpha")), 10)
      .collect().isEmpty)
    val orDegrade = searcher.searchQuery(Seq(Topic("1", "zzzzz~1 alpha")), 10)
      .collect().map(_.docno).toSet
    assert(orDegrade == Set("s-1", "s-2", "s-3"))
  }

  test("highlightTerms: scoring leaves only, expansions included") {
    assert(searcher.highlightTerms("alpha -gamma (d* | alpka~1)") ==
      Set("alpha", "delta")) // gamma is prohibited; d* ⇒ delta, alpka~1 ⇒ alpha
    assert(searcher.highlightTerms("\"alpha beta\"") == Set("alpha", "beta"))
  }
}
