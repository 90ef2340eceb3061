package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end CLI parity: index a TREC fixture corpus via the IndexTrec
  * flow, answer topics via the BatchSearch flow (same code paths as the
  * mains, minus the session/println shell).
  */
class CliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("index-then-search round trip from settings, files and topics") {
    val dir = TestSpark.tmpDir("cli")
    val corpusDir = s"$dir/corpus"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(corpusDir))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(corpusDir, "a.trec"),
      """<DOC>
        |<DOCNO>c-1</DOCNO>
        |<TEXT>the quick brown fox</TEXT>
        |</DOC>
        |<DOC>
        |<DOCNO>c-2</DOCNO>
        |<TEXT>the lazy dogs sleeping</TEXT>
        |</DOC>
        |<DOC>
        |<DOCNO>c-3</DOCNO>
        |<TEXT>quick quick foxes running</TEXT>
        |</DOC>""".stripMargin)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "stop.txt"), "the\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "queries.txt"),
      """<top>
        |<num>7</num>
        |<text>quick fox</text>
        |</top>""".stripMargin)
    val settingsFile = s"$dir/settings.hjson"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(settingsFile),
      s"""{
         |  indexPath: $dir/index
         |  docsPath: $corpusDir
         |  stopFile: $dir/stop.txt
         |  stemmer: PorterStemFilter
         |  queryFile: $dir/queries.txt
         |  similarity: BM25
         |  returnedResultCount: 10
         |}""".stripMargin)

    val settings = LtrSettings.load(Some(settingsFile), Seq("tokenizer=WhitespaceTokenizer"))
    // IndexTrec flow
    val cfg = graft.index.IndexConfig(
      analyzer = settings.analyzerConfig(tools.Cli.stopWords(settings)),
      groupShift = 1, mergeShift = 1)
    val corpus = tools.Cli.readCorpus(spark, settings)
    val idx = graft.index.IndexBuilder.build(corpus, settings.indexPath, cfg, verifySha = true)
    assert(idx.stats.max_doc == 3)

    // BatchSearch flow: "quick fox" stems to quick/fox; porter maps
    // foxes→fox, so c-1 and c-3 match
    val reopened = graft.index.BuiltIndex.open(spark, settings.indexPath)
    val run = new graft.search.Searcher(reopened)
      .search(Parsers.topicsOf(s"$dir/queries.txt"), settings.returnedResultCount,
        settings.scorerName)
      .collect()
    assert(run.map(_.qid).distinct.toSeq == Seq("7"))
    assert(run.map(_.docno).toSet == Set("c-1", "c-3"))
    assert(run.forall(_.runtag == "bm25"))
    // c-3 (quick tf=2 + fox) outranks c-1
    assert(run.minBy(_.rank).docno == "c-3")
  }

  test("batched runner: plain topics in one job, topic order, snippets") {
    val dir = TestSpark.tmpDir("clib")
    val corpusDir = s"$dir/corpus"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(corpusDir))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(corpusDir, "b.trec"),
      """<DOC>
        |<DOCNO>b-1</DOCNO>
        |<TEXT>alpha beta gamma words continue alpha beta</TEXT>
        |</DOC>
        |<DOC>
        |<DOCNO>b-2</DOCNO>
        |<TEXT>delta epsilon words</TEXT>
        |</DOC>""".stripMargin)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "queries.txt"),
      """<top><num>21</num><text>alpha</text></top>
        |<top><num>22</num><text>delta -alpha</text></top>
        |<top><num>23</num><text>"epsilon words"</text></top>""".stripMargin)
    val settings = LtrSettings(
      indexPath = s"$dir/index", docsPath = corpusDir,
      queryFile = s"$dir/queries.txt", returnedResultCount = 10,
      includeSnippets = true, indexPositions = true)
    val cfg = graft.index.IndexConfig(
      analyzer = settings.analyzerConfig(Set.empty), groupShift = 1, mergeShift = 1,
      indexPositions = settings.indexPositions)
    graft.index.IndexBuilder.build(
      tools.Cli.readCorpus(spark, settings), settings.indexPath, cfg)

    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val lines = tools.Cli.runBatchSearch(spark, settings)
    val after2 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    // topic-file order; run lines interleaved with snippet lines
    val runLines = lines.filter(_.contains(" Q0 "))
    assert(runLines.map(_.split(" ")(0)) == Seq("21", "22", "23"))
    assert(runLines.head.startsWith("21 Q0 b-1 0 "))
    assert(runLines(1).startsWith("22 Q0 b-2 0 "))
    // exact phrase through the CLI: "epsilon words" adjacent only in b-2
    assert(runLines(2).startsWith("23 Q0 b-2 0 "))
    assert(runLines.count(_.startsWith("23 ")) == 1) // b-1 has words, not the phrase
    // each run line is followed by a "..."-wrapped snippet line
    val i21 = lines.indexOf(runLines.head)
    assert(lines(i21 + 1).contains("alpha") && lines(i21 + 1).endsWith("..."))

    // batching property: 3x the plain topics must NOT cost ~3x the Spark
    // jobs — the per-run overhead (index open, stats lookup, snippet join)
    // dominates and the topic batch itself stays one job
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "queries.txt"),
      """<top><num>21</num><text>alpha</text></top>
        |<top><num>22</num><text>delta -alpha</text></top>
        |<top><num>23</num><text>beta</text></top>
        |<top><num>24</num><text>gamma</text></top>
        |<top><num>25</num><text>epsilon</text></top>
        |<top><num>26</num><text>words</text></top>""".stripMargin)
    tools.Cli.runBatchSearch(spark, settings)
    val after6 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val (jobs2, jobs6) = (after2 - before, after6 - after2)
    assert(jobs6 <= jobs2 + 4,
      s"job count scales with topic count: 2 topics → $jobs2 jobs, 6 topics → $jobs6")
  }

  private object Parsers {
    def topicsOf(file: String): Seq[graft.search.Topic] =
      graft.corpus.Parsers.parseTopics(
        java.nio.file.Files.readString(java.nio.file.Paths.get(file)))
        .map(t => graft.search.Topic(t.qid, t.text))
  }
}
