package graft

import graft.analysis.AnalyzerConfig
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Searcher, Topic}
import org.scalatest.funsuite.AnyFunSuite

/** Committed golden TREC run lines — regression lock for rank identity
  * across rounds: any change to the analyzer chain, codec, stats plumbing,
  * float scoring order or tie-breaking shows up as a byte-level diff here.
  * Golden values were produced by the round-1 implementation after it was
  * verified float-bit-identical to the independent brute-force oracle and
  * rank-identical to the DuckDB oracle.
  */
class GoldenRunSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val corpus = Seq(
    "cli-1" -> "the quick brown fox jumps",
    "cli-2" -> "lazy dogs sleeping quietly",
    "cli-3" -> "quick quick foxes running wild")

  test("TREC run output is byte-identical to the committed golden") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("golden")
    val idx = IndexBuilder.build(corpus.toDF("docno", "content"), dir,
      IndexConfig(analyzer = AnalyzerConfig(
        stopWords = Set("the", "a"), stemmer = "porter")))
    val s = new Searcher(idx)
    val run = s.search(Seq(Topic("401", "quick fox"), Topic("402", "sleeping dogs")), 10)
    val lines = s.formatRun(run.collect().toSeq.sortBy(l => (l.qid, l.rank)))
    val golden = Seq(
      "401 Q0 cli-3 0 1.5316031 bm25",
      "401 Q0 cli-1 1 1.4002062 bm25",
      "402 Q0 cli-2 0 2.9220266 bm25")
    assert(lines == golden, s"\ngot:\n${lines.mkString("\n")}")
  }
}
