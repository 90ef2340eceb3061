package graft

import graft.analysis.AnalyzerConfig
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Searcher, Topic}
import graft.tools.SearchRepl
import org.scalatest.funsuite.AnyFunSuite

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}

/** The interactive paging REPL (≙ `SearchFiles.java:90-233`): prompt loop,
  * 5-page prefetch, p/n/jump paging, the "Collect more (y/n) ?" re-search
  * when paging past the prefetch, and totalHits reporting.
  */
class ReplSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 7 docs with identical content: scores tie → ranks follow docid = docno
  // order, so every page's contents are deterministic
  private lazy val searcher: Searcher = {
    import spark.implicits._
    val corpus = (1 to 7).map(i => (s"r-$i", "common word")).toDF("docno", "content")
    val idx = IndexBuilder.build(corpus, TestSpark.tmpDir("repl"),
      IndexConfig(analyzer = AnalyzerConfig(), groupShift = 1, mergeShift = 1))
    new Searcher(idx)
  }

  private def run(script: String, hitsPerPage: Int,
                  repeat: Int = 0): Seq[String] = {
    val in = new BufferedReader(new StringReader(script))
    val bytes = new ByteArrayOutputStream()
    val out = new PrintStream(bytes, true, "UTF-8")
    SearchRepl.loop(searcher, in, out, hitsPerPage, repeat = repeat)
    new String(bytes.toByteArray, "UTF-8").split("\n").toSeq
  }

  test("-repeat N times the query loop before paging (SearchFiles.java:109-117)") {
    val outp = run("common\nq\n\n", hitsPerPage = 2, repeat = 3)
    val timeLines = outp.filter(_.matches("""Time: \d+ms"""))
    assert(timeLines.size == 1)
    // the timing line prints between `Searching for:` and the page output
    assert(outp.indexOf("Searching for: common") < outp.indexOf(timeLines.head))
    assert(outp.indexOf(timeLines.head) < outp.indexOf("7 total matching documents"))
    // repeat = 0 (default) prints no timing line
    assert(!run("common\nq\n\n", hitsPerPage = 2)
      .exists(_.startsWith("Time: ")))
  }

  test("matchCounts = distinct matching docs (the demo's totalHits)") {
    assert(searcher.matchCounts(Seq(Topic("1", "common")))("1") == 7L)
    assert(searcher.matchCounts(Seq(Topic("2", "absent")))("2") == 0L)
  }

  test("paging: next, previous, page jump, bad page, quit") {
    val outp = run("common\nn\np\n3\n9\nq\n\n", hitsPerPage = 2)
    assert(outp.contains("Enter query: "))
    assert(outp.contains("Searching for: common"))
    assert(outp.contains("7 total matching documents"))
    // page 1 → n → page 2 → p → page 1 → jump 3 → page 3 → bad jump → quit
    val pages = outp.filter(_.matches("""\d+\. r-\d"""))
    assert(pages == Seq("1. r-1", "2. r-2", "3. r-3", "4. r-4",
      "1. r-1", "2. r-2", "5. r-5", "6. r-6"))
    assert(outp.contains("No such page"))
    // the first menu hides (p)revious, later menus show it
    assert(outp.exists(l => l.startsWith("Press (n)ext")))
    assert(outp.exists(l => l.startsWith("Press (p)revious page, (n)ext")))
  }

  test("paging past the 5-page prefetch asks to collect more, then re-searches") {
    val outp = run("common\nn\nn\nn\nn\nn\ny\nq\n\n", hitsPerPage = 1)
    assert(outp.contains(
      "Only results 1 - 5 of 7 total matching documents collected."))
    assert(outp.contains("Collect more (y/n) ?"))
    val pages = outp.filter(_.matches("""\d+\. r-\d"""))
    assert(pages == (1 to 6).map(i => s"$i. r-$i"))
    // declining the collect ends the query session instead
    val declined = run("common\nn\nn\nn\nn\nn\nn\n\n", hitsPerPage = 1)
    assert(declined.filter(_.matches("""\d+\. r-\d""")) ==
      (1 to 5).map(i => s"$i. r-$i"))
  }
}
