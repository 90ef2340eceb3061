package graft

import graft.analysis.AnalyzerConfig
import graft.index.{IndexBuilder, IndexConfig}
import graft.search._
import org.scalatest.funsuite.AnyFunSuite

/** Formula + end-to-end checks for the Lucene-5.4-style stock similarities
  * (bm25L / defaultL / lmdirichletL).
  */
class LuceneScorerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val stats = CollStats(maxDoc = 10, sumTotalTermFreq = 100)

  test("bm25L: natural-log idf, lossy norm doc length") {
    val idf = Bm25LuceneScorer.termWeight(3, 0, stats)
    assert(math.abs(idf - math.log(1.0 + (10 - 3 + 0.5) / 3.5)) < 1e-6)
    // lossy dl: decode(encode(1/sqrt(dl)))^-2 — monotone, small ints near-exact
    assert(LuceneNorms.lossyDl(1) == 1.0f)
    assert(LuceneNorms.lossyDl(4) == 4.0f)
    assert(math.abs(LuceneNorms.lossyDl(100) - 100.0f) / 100.0f < 0.15f)
    val sShort = Bm25LuceneScorer.score(2, 5, idf, stats)
    val sLong = Bm25LuceneScorer.score(2, 50, idf, stats)
    assert(sShort > sLong)
  }

  test("defaultL: classic tf-idf with queryNorm and coord") {
    val idf = ClassicScorer.termWeight(4, 0, stats)
    assert(math.abs(idf - (1.0 + math.log(10 / 5.0))) < 1e-6)
    assert(ClassicScorer.queryNorm(Seq(2.0f)) == (1.0 / math.sqrt(4.0)).toFloat)
    assert(ClassicScorer.coord(2, 4) == 0.5f)
    assert(ClassicScorer.coord(4, 4) == 1.0f)
    // score = sqrt(tf) · idf² · lossy(1/sqrt(dl))
    val s = ClassicScorer.score(4, 16, idf, stats)
    assert(math.abs(s - 2.0f * idf * idf * LuceneNorms.lossyInvSqrt(16)) < 1e-6)
  }

  test("lmdirichletL: collection probability, dirichlet smoothing, floor at 0") {
    val p = LmDirichletScorer.termWeight(1, 9, stats)
    assert(math.abs(p - (9 + 1.0) / (100 + 1.0)) < 1e-9)
    val s = LmDirichletScorer.score(3, 10, p, stats)
    val dlf = LuceneNorms.lossyDl(10)
    val want = math.log(1.0 + 3 / (2000.0f * p)) + math.log(2000.0f / (dlf + 2000.0f))
    assert(math.abs(s - want) < 1e-6)
    // a frequent term in a long doc can go negative → floored to 0
    val pCommon = LmDirichletScorer.termWeight(10, 90, stats)
    assert(LmDirichletScorer.score(1, 100000, pCommon, stats) >= 0.0f)
  }

  test("end-to-end: all registry scorers produce sane rankings") {
    import spark.implicits._
    val docs = Seq(
      "m1" -> "spark spark spark query",
      "m2" -> "spark query engine",
      "m3" -> "unrelated words here entirely",
      "m4" -> "spark")
    val dir = TestSpark.tmpDir("lucsc")
    val idx = IndexBuilder.build(docs.toDF("docno", "content"), dir,
      IndexConfig(analyzer = AnalyzerConfig(), groupShift = 1, mergeShift = 1))
    val s = new Searcher(idx)
    for (name <- Seq("bm25", "bm25e", "bm25L", "defaultL", "lmdirichletL")) {
      val run = s.search(Seq(Topic("q", "spark query")), 10, scorerName = name).collect()
      assert(run.nonEmpty, name)
      assert(!run.map(_.docno).contains("m3"), name)
      assert(run.map(_.rank).toSeq == run.indices.toSeq, name)
      // m1 matches both terms with high tf — must beat the single-term m4
      val byDoc = run.map(r => r.docno -> r.rank).toMap
      assert(byDoc("m1") < byDoc("m4"), s"$name: ${run.mkString(",")}")
    }
    // coord matters for defaultL: m2 (2 of 2 clauses) vs m4 (1 of 2)
    val classic = s.search(Seq(Topic("q", "spark query")), 10, "defaultL").collect()
    val byDoc = classic.map(r => r.docno -> r.score).toMap
    assert(byDoc("m2") > byDoc("m4"))
  }
}
