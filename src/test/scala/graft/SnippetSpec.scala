package graft

import graft.analysis.{Analyzer, AnalyzerConfig}
import graft.index.{IndexBuilder, IndexConfig}
import graft.search._
import org.scalatest.funsuite.AnyFunSuite

class SnippetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val an = new Analyzer(AnalyzerConfig())

  test("fragmenter cuts at the char budget on token boundaries") {
    assert(Snippets.fragments("aa bb cc dd", 5) == Seq("aa bb", "cc dd"))
    assert(Snippets.fragments("aaaaaaaaaa bb", 5) == Seq("aaaaaaaaaa", "bb"))
    assert(Snippets.fragments("", 5).isEmpty)
  }

  test("snippet keeps the best fragments in document order, joined by ...") {
    val text = "noise noise / match one / noise / match match two / tail"
    val s = Snippets.snippet(text, Set("match"), an, fragChars = 12, maxFragments = 2)
    // the two matching fragments survive, document order, "..." joined
    assert(s.contains("match"))
    assert(s.split("\\.\\.\\.").length == 2)
    assert(Snippets.snippet("no hits here", Set("absent"), an) == "")
  }

  test("attach joins snippets onto a run") {
    import spark.implicits._
    val docs = Seq("s1" -> "alpha beta gamma", "s2" -> "delta alpha epsilon zeta")
    val corpus = docs.toDF("docno", "content")
    val dir = TestSpark.tmpDir("snip")
    val idx = IndexBuilder.build(corpus, dir, IndexConfig(groupShift = 1, mergeShift = 1))
    val searcher = new Searcher(idx)
    val run = searcher.search(Seq(Topic("q", "alpha")), 10)
    val out = Snippets.attach(run, corpus, an, Map("q" -> Set("alpha"))).collect()
    assert(out.length == 2)
    out.foreach(r => assert(r.getAs[String]("snippet").contains("alpha")))
  }

  test("dfrL and ibL scorers produce sane monotone-ish rankings") {
    import spark.implicits._
    val docs = Seq(
      "m1" -> "spark spark spark query",
      "m2" -> "spark query engine",
      "m3" -> "unrelated words only here",
      "m4" -> "spark")
    val dir = TestSpark.tmpDir("dfrib")
    val idx = IndexBuilder.build(docs.toDF("docno", "content"), dir,
      IndexConfig(groupShift = 1, mergeShift = 1))
    val s = new Searcher(idx)
    for (name <- Seq("dfrL", "ibL")) {
      val run = s.search(Seq(Topic("q", "spark query")), 10, scorerName = name).collect()
      assert(run.nonEmpty, name)
      assert(!run.map(_.docno).contains("m3"), name)
      val byDoc = run.map(r => r.docno -> r.rank).toMap
      assert(byDoc("m1") < byDoc("m4"), s"$name: ${run.mkString(",")}")
      assert(run.forall(_.score >= 0.0f), name)
    }
  }
}
