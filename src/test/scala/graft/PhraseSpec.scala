package graft

import graft.analysis.AnalyzerConfig
import graft.codec.{DecodedPosting, PostingCodec}
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Searcher, Topic}
import org.scalatest.funsuite.AnyFunSuite

/** Exact phrase matching over the positions blob: codec round-trip,
  * adjacency, stop-word position gaps (Lucene positionIncrement
  * semantics), phraseFreq scoring, and composition with loose terms and
  * AND mode.
  */
class PhraseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("codec: positions round-trip, including multi-block seeks") {
    val rnd = new scala.util.Random(42)
    val postings = (0 until 300).map { i =>
      val tf = 1 + rnd.nextInt(4)
      val pos = Array.iterate(rnd.nextInt(5), tf)(_ + 1 + rnd.nextInt(9))
      DecodedPosting(i.toLong * 3 + 1, tf, 10 + rnd.nextInt(90), pos)
    }
    val run = PostingCodec.encode(postings.iterator)
    assert(run.posBlob.nonEmpty && run.blockPosOff.length == run.blockDocOff.length)
    val decoded = PostingCodec.decode(run).toSeq
    assert(decoded.map(_.docid) == postings.map(_.docid))
    decoded.zip(postings).foreach { case (d, p) =>
      assert(d.pos.toSeq == p.pos.toSeq, s"docid ${p.docid}")
    }
    // block-seek decode of the middle block matches the full decode
    val bi = 1
    val blk = PostingCodec.decodeBlock(bi, run.ndocs, run.docBlob, run.tfBlob,
      run.dlBlob, run.blockLastDocid, run.blockDocOff, run.blockTfOff,
      run.blockDlOff, run.posBlob, run.blockPosOff).toSeq
    val expect = decoded.slice(bi * PostingCodec.BlockSize, (bi + 1) * PostingCodec.BlockSize)
    assert(blk.map(_.docid) == expect.map(_.docid))
    blk.zip(expect).foreach { case (a, b) => assert(a.pos.toSeq == b.pos.toSeq) }
    // a no-positions run still encodes/decodes with empty pos
    val bare = PostingCodec.encode(postings.map(_.copy(pos = PostingCodec.NoPositions)).iterator)
    assert(bare.posBlob.isEmpty)
    assert(PostingCodec.decode(bare).forall(_.pos.isEmpty))
  }

  private lazy val searcher: Searcher = {
    import spark.implicits._
    val corpus = Seq(
      "p-1" -> "alpha beta gamma",
      "p-2" -> "beta alpha gamma",
      "p-3" -> "alpha gamma beta alpha beta",
      "p-4" -> "alpha the beta",            // "the" is stopped → gap at pos 1
      "p-5" -> "alpha beta alpha beta").toDF("docno", "content")
    val idx = IndexBuilder.build(corpus, TestSpark.tmpDir("phrase"),
      IndexConfig(analyzer = AnalyzerConfig(stopWords = Set("the")),
        indexPositions = true, groupShift = 1, mergeShift = 1))
    new Searcher(idx)
  }

  test("exact adjacency: only true phrase occurrences match") {
    val got = searcher.searchQuery(Seq(Topic("1", "\"alpha beta\"")), 10)
      .collect().map(_.docno).toSet
    assert(got == Set("p-1", "p-3", "p-5")) // p-2 reversed, p-4 gapped
  }

  test("phraseFreq scores through the tf saturation (2 occurrences > 1)") {
    val run = searcher.searchQuery(Seq(Topic("1", "\"alpha beta\"")), 10)
      .collect().sortBy(_.rank)
    assert(run.head.docno == "p-5") // freq 2 beats freq 1 at comparable dl
    assert(run.map(_.score).distinct.length > 1)
  }

  test("stopped words leave position gaps (positionIncrement semantics)") {
    // "alpha the beta" analyzes to alpha@0, beta@2: matches docs where beta
    // sits two positions after alpha — p-4 ("alpha the beta") AND p-3
    // ("alpha gamma beta..."), exactly like Lucene's gapped PhraseQuery
    // (the gap admits ANY token, not specifically the stopped one); and NOT
    // the adjacent p-1/p-5.
    val got = searcher.searchQuery(Seq(Topic("1", "\"alpha the beta\"")), 10)
      .collect().map(_.docno).toSet
    assert(got == Set("p-4", "p-3"))
  }

  test("phrase composes with loose terms (OR) and with AND mode") {
    val or = searcher.searchQuery(Seq(Topic("1", "\"alpha beta\" gamma")), 10)
      .collect()
    val orDocs = or.map(_.docno).toSet
    assert(orDocs == Set("p-1", "p-2", "p-3", "p-5")) // phrase hits ∪ gamma hits
    // phrase+gamma docs outrank gamma-only docs
    val byRank = or.sortBy(_.rank).map(_.docno).toSeq
    assert(byRank.indexOf("p-2") > byRank.indexOf("p-1"))

    val and = searcher.searchQuery(Seq(Topic("1", "\"alpha beta\" + gamma")), 10)
      .collect().map(_.docno).toSet
    assert(and == Set("p-1", "p-3")) // must have BOTH the phrase and gamma
  }

  test("single-word phrase rewrites to a plain term clause") {
    val a = searcher.searchQuery(Seq(Topic("1", "\"gamma\"")), 10)
      .collect().sortBy(_.rank).map(r => (r.docno, r.score)).toSeq
    val b = searcher.searchQuery(Seq(Topic("1", "gamma")), 10)
      .collect().sortBy(_.rank).map(r => (r.docno, r.score)).toSeq
    assert(a == b)
  }

  test("phrase weight is the reference's accumulate-from-1.0 multi-term idf") {
    import graft.search.{Bm25Scorer, CollStats}
    val stats = CollStats(5, 19)
    val w = Bm25Scorer.phraseWeight(Seq((4L, 0L), (4L, 0L)), stats)
    assert(w == 1.0f + Bm25Scorer.termWeight(4L, 0L, stats) * 2)
  }

  test("sloppy phrase ~N: window matching, reordering, and freq counting") {
    // slop 0 rejects the gapped p-4 and reversed p-2; slop 2's ±2 window
    // admits the stop gap (beta two positions late) AND the p-2 reorder
    // (beta two positions early: |0 − (1+1)| = 2)
    val s0 = searcher.searchQuery(Seq(Topic("1", "\"alpha beta\"~0")), 10)
      .collect().map(_.docno).toSet
    assert(s0 == Set("p-1", "p-3", "p-5")) // identical to the exact phrase
    val s2 = searcher.searchQuery(Seq(Topic("1", "\"alpha beta\"~2")), 10)
      .collect().map(_.docno).toSet
    assert(s2 == Set("p-1", "p-2", "p-3", "p-4", "p-5"))
    // freq = matching ANCHOR (first-slot) positions: p-5 "alpha beta alpha
    // beta" has 2 anchors with beta in ±1 → freq 2 still tops the ranking
    val r1 = searcher.searchQuery(Seq(Topic("1", "\"alpha beta\"~1")), 10)
      .collect().sortBy(_.rank)
    assert(r1.head.docno == "p-5")
    // slop composes with loose terms and keeps per-query disjoint clauses
    val mixed = searcher.searchQuery(Seq(Topic("1", "\"alpha beta\"~1 gamma")), 10)
      .collect().map(_.docno).toSet
    assert(mixed.contains("p-2")) // gamma hit even where the phrase misses
  }
}
