package graft.tools

import graft.LtrSettings
import graft.analysis.Analyzer
import graft.corpus.Parsers
import graft.index.{BuiltIndex, IndexBuilder, IndexConfig}
import graft.search.{Feedback, Searcher, Snippets, Topic}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Command-line parity with the reference's two entry points:
  *
  *   IndexTrec:   corpus files → inverted index   (≙ `IndexTREC.main`)
  *   BatchSearch: topics file → TREC run lines    (≙ `BatchSearch.main`)
  *
  * Usage mirrors the reference's settings-file + `key=value` override
  * convention (`IndexTREC.java:53-76`):
  *
  *   sbt "runMain graft.tools.IndexTrec [settings.hjson] [key=value...]"
  *   sbt "runMain graft.tools.BatchSearch [settings.hjson] [key=value...]"
  */
object Cli {
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def splitArgs(args: Array[String]): (Option[String], Seq[String]) = {
    val (ovs, files) = args.toSeq.partition(_.contains("="))
    (files.headOption, ovs)
  }

  def stopWords(settings: LtrSettings): Set[String] =
    if (settings.stopFile == "None") Set.empty
    else Analyzer.parseStopWords(
      java.nio.file.Files.readString(java.nio.file.Paths.get(settings.stopFile)))

  def readCorpus(spark: SparkSession, settings: LtrSettings): DataFrame =
    settings.fileFormat match {
      case "warc"   => Parsers.readWarcCorpus(spark, settings.docsPath)
      case "simple" => Parsers.readSimpleCorpus(spark, settings.docsPath)
      case _        => Parsers.readTrecCorpus(spark, settings.docsPath, settings.trecFieldsToIndex)
    }
}

object IndexTrec {
  def main(args: Array[String]): Unit = {
    val (file, ovs) = Cli.splitArgs(args)
    val settings = LtrSettings.load(file, ovs)
    val spark = Cli.session()
    val cfg = IndexConfig(analyzer = settings.analyzerConfig(Cli.stopWords(settings)))
    val corpus = Cli.readCorpus(spark, settings)
    val idx = IndexBuilder.build(corpus, settings.indexPath, cfg, verifySha = true)
    println(s"indexed ${idx.stats.max_doc} docs, " +
      s"${idx.stats.sum_total_term_freq} tokens → ${settings.indexPath}")
    spark.stop()
  }
}

object BatchSearch {
  def main(args: Array[String]): Unit = {
    val (file, ovs) = Cli.splitArgs(args)
    val settings = LtrSettings.load(file, ovs)
    val spark = Cli.session()
    val idx = BuiltIndex.open(spark, settings.indexPath)
    val searcher = new Searcher(idx)
    val scorer = settings.scorerName
    val k = settings.returnedResultCount
    val topics = Parsers.parseTopics(
      java.nio.file.Files.readString(java.nio.file.Paths.get(settings.queryFile)))

    topics.foreach { t =>
      // Feedback topics run the preprocessor/postprocessor pipeline
      // (≙ BatchSearch.java:204-249); plain topics are bag-of-words.
      val run =
        if (t.feedbackDocs.nonEmpty && t.preprocessor.nonEmpty) {
          val corpus = Cli.readCorpus(spark, settings)
          Feedback.searchWithFeedback(searcher, corpus, t.qid,
            t.feedbackDocs, t.topTermsToKeep, k, scorer)
        } else searcher.search(Seq(Topic(t.qid, t.text)), k, scorer)
      val lines = run.collect()
      lines.foreach(l => println(s"${l.qid} Q0 ${l.docno} ${l.rank} ${l.score} ${l.runtag}"))
    }
    spark.stop()
  }
}
