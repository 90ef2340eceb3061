package graft.search

import graft.analysis.Analyzer
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Optional snippet sink (≙ the reference's `includeSnippets` path:
  * Lucene Highlighter with `SimpleFragmenter(15)` and
  * `maxSnippetFragments` = 4 best fragments joined by "..." —
  * `BatchSearch.java:40,311-338,352-367`). Out of scope for rank identity
  * (SURVEY.md §2.1); behavior is fixture-locked in SnippetSpec.
  *
  * The reference reads stored fields (`storeFields: true`); here content
  * comes from the corpus table, joined only for the tiny top-k result set.
  */
object Snippets {

  /** Greedy char-budget fragmenter (≙ SimpleFragmenter semantics: cut when
    * the fragment exceeds `fragChars`, at token boundaries).
    */
  def fragments(text: String, fragChars: Int): Seq[String] = {
    if (text == null || text.isEmpty) return Nil
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val out = Seq.newBuilder[String]
    var cur = new StringBuilder
    toks.foreach { t =>
      if (cur.nonEmpty && cur.length + 1 + t.length > fragChars) {
        out += cur.toString
        cur = new StringBuilder
      }
      if (cur.nonEmpty) cur.append(' ')
      cur.append(t)
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }

  /** Best-fragments snippet for one doc: fragments scored by matched
    * query-term count (analyzed), top `maxFragments` kept in document
    * order, joined by "...".
    */
  def snippet(content: String, queryTerms: Set[String], analyzer: Analyzer,
              fragChars: Int = 15, maxFragments: Int = 4): String = {
    val frags = fragments(content, fragChars)
    val scored = frags.zipWithIndex.map { case (f, i) =>
      val score = analyzer.analyze(f).count(queryTerms.contains)
      (i, f, score)
    }
    scored.filter(_._3 > 0)
      .sortBy { case (i, _, s) => (-s, i) }
      .take(maxFragments)
      .sortBy(_._1)
      .map(_._2)
      .mkString("...")
  }

  /** Attach a `snippet` column to a run: broadcast the (tiny) run against
    * the corpus — content never travels for non-hit docs.
    */
  def attach(run: Dataset[RunLine], corpus: DataFrame, analyzer: Analyzer,
             termsByQid: Map[String, Set[String]],
             fragChars: Int = 15, maxFragments: Int = 4): DataFrame = {
    val spark = run.sparkSession
    import spark.implicits._
    val joined = corpus.select(col("docno"), col("content"))
      .join(broadcast(run.toDF()), Seq("docno"))
      .select($"qid", $"docno", $"rank", $"score", $"runtag", $"content")
      .as[(String, String, Int, Float, String, String)]
    joined.map { case (qid, docno, rank, score, runtag, content) =>
      val terms = termsByQid.getOrElse(qid, Set.empty)
      (qid, docno, rank, score, runtag,
        snippet(content, terms, analyzer, fragChars, maxFragments))
    }.toDF("qid", "docno", "rank", "score", "runtag", "snippet")
      .orderBy("qid", "rank")
  }
}
