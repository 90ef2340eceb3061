package graft.tools

import graft.LtrSettings
import graft.index.BuiltIndex
import graft.search.{RunLine, Searcher, Topic}

import java.io.{BufferedReader, PrintStream}

/** Interactive paging search demo — the reimplementation of the reference's
  * `SearchFiles` entry point (`SearchFiles.java:90-233`): prompt for a
  * query, prefetch 5 result pages, page with `(p)revious` / `(n)ext` /
  * `(q)uit` / page-number commands, and re-collect ALL hits when the user
  * pages past the prefetch (the "Collect more (y/n) ?" flow). Output lines
  * mirror the reference's (`Enter query:`, `Searching for:`, `N total
  * matching documents`, `i. docno`); the engine's docs carry no `title`
  * field, so the title line never prints. Documented deviation: a
  * non-numeric page jump prints `No such page` instead of throwing
  * `NumberFormatException` out of the loop.
  *
  * Usage (settings-file + `key=value` convention like the other mains):
  *   sbt "runMain graft.tools.SearchRepl [settings.hjson] [key=value...]"
  */
object SearchRepl {

  def main(args: Array[String]): Unit = {
    val (file, ovs) = Cli.splitArgs(args)
    val settings = LtrSettings.load(file, ovs)
    val spark = Cli.session()
    val searcher = new Searcher(BuiltIndex.open(spark, settings.indexPath))
    val in = new BufferedReader(new java.io.InputStreamReader(System.in, "UTF-8"))
    loop(searcher, in, System.out, hitsPerPage = 10,
      scorerName = settings.scorerName, repeat = settings.repeat)
    spark.stop()
  }

  /** The prompt loop (testable: reader/printer injected). A null or blank
    * line ends the session, exactly like the reference (`:96-104`).
    * `repeat > 0` re-runs each query that many times and prints
    * `Time: <ms>ms` before paging — the reference demo's only measurement
    * affordance (`SearchFiles.java:109-117`, `searcher.search(query, 100)`
    * in the timed loop, hence k=100 here too).
    */
  def loop(searcher: Searcher, in: BufferedReader, out: PrintStream,
           hitsPerPage: Int, scorerName: String = "bm25",
           repeat: Int = 0): Unit = {
    var qn = 0
    var done = false
    while (!done) {
      out.println("Enter query: ")
      val line = in.readLine()
      if (line == null || line.trim.isEmpty) done = true
      else {
        qn += 1
        val text = line.trim
        out.println(s"Searching for: $text")
        if (repeat > 0) { // repeat & time as benchmark (SearchFiles.java:109)
          val start = System.currentTimeMillis()
          var i = 0
          while (i < repeat) {
            searcher.search(Seq(Topic(s"i$qn", text)), 100, scorerName)
              .collect()
            i += 1
          }
          out.println(s"Time: ${System.currentTimeMillis() - start}ms")
        }
        doPagingSearch(searcher, Topic(s"i$qn", text), in, out, hitsPerPage,
          scorerName)
      }
    }
  }

  /** One query's paging session (≙ `doPagingSearch`, `SearchFiles.java:
    * 140-233`): prefetch 5 pages; paging past the collected hits asks
    * `Collect more (y/n) ?` and re-runs the search for ALL matches.
    */
  def doPagingSearch(searcher: Searcher, topic: Topic, in: BufferedReader,
                     out: PrintStream, hitsPerPage: Int,
                     scorerName: String): Unit = {
    def runSearch(k: Int): Array[RunLine] =
      searcher.search(Seq(topic), k, scorerName).collect().sortBy(_.rank)

    var hits = runSearch(5 * hitsPerPage)
    var numTotalHits = searcher.matchCounts(Seq(topic))(topic.qid)
    out.println(s"$numTotalHits total matching documents")

    var start = 0
    var end = math.min(numTotalHits, hitsPerPage.toLong).toInt
    var quit = false
    while (!quit) {
      if (end > hits.length) {
        out.println(s"Only results 1 - ${hits.length} of $numTotalHits " +
          "total matching documents collected.")
        out.println("Collect more (y/n) ?")
        val line = in.readLine()
        if (line == null || line.isEmpty || line.charAt(0) == 'n')
          return
        hits = runSearch(math.min(numTotalHits, Int.MaxValue.toLong).toInt)
        // after a FULL collect the hit list is definitive — clamp the bound
        // so the prompt cannot recur (search() dedups docnos, so k hits in
        // can come back as fewer rows than matchCounts' docno total when
        // duplicate docnos crowd the top-k; Lucene has no dedup and never
        // hits this)
        numTotalHits = math.min(numTotalHits, hits.length.toLong)
      }
      end = math.min(hits.length, start + hitsPerPage)
      (start until end).foreach(i => out.println(s"${i + 1}. ${hits(i).docno}"))
      if (end == 0) return

      if (numTotalHits >= end) {
        var chosen = false
        while (!chosen && !quit) {
          val menu = new StringBuilder("Press ")
          if (start - hitsPerPage >= 0) menu ++= "(p)revious page, "
          if (start + hitsPerPage < numTotalHits) menu ++= "(n)ext page, "
          menu ++= "(q)uit or enter number to jump to a page."
          out.println(menu.toString)
          val line = in.readLine()
          if (line == null || line.isEmpty || line.charAt(0) == 'q') quit = true
          else if (line.charAt(0) == 'p') {
            start = math.max(0, start - hitsPerPage); chosen = true
          } else if (line.charAt(0) == 'n') {
            if (start + hitsPerPage < numTotalHits) start += hitsPerPage
            chosen = true
          } else line.toIntOption match {
            case Some(page) if (page - 1).toLong * hitsPerPage < numTotalHits =>
              start = (page - 1) * hitsPerPage; chosen = true
            case _ => out.println("No such page")
          }
        }
        if (!quit) end = math.min(numTotalHits, (start + hitsPerPage).toLong).toInt
      }
    }
  }
}
