package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Repetition / boilerplate signals for training-data filtering (the
  * published MassiveText/Gopher repetition-filter family): per document,
  * integer counts a downstream policy turns into fractions and
  * thresholds. One typed pass per row with a token HashMap — O(tokens),
  * narrow, no shuffle; a column-expression formulation of the top-bigram
  * count would be O(tokens²) per row, which dies on long documents at
  * corpus scale.
  *
  * Tokens are lowercased whitespace tokens (the same split the quality
  * signals use), so the DuckDB oracle replays the counts with a
  * positions-preserving split + window/group SQL.
  */
object Repetition {

  /** (docno, n_tokens, n_distinct, top_bigram, max_run):
    *  - `n_distinct`  distinct tokens (type-token ratio numerator);
    *  - `top_bigram`  occurrences of the most frequent adjacent bigram
    *                  (0 when fewer than 2 tokens);
    *  - `max_run`     longest run of identical consecutive tokens
    *                  (0 for an empty document).
    */
  def repetitionSignals(corpus: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select("docno", "content").as[(String, String)].map {
      case (docno, content) =>
        val toks = content.toLowerCase(java.util.Locale.ROOT)
          .split("\\s+").filter(_.nonEmpty)
        val distinct = new java.util.HashSet[String]()
        val bigrams = new java.util.HashMap[String, Int]()
        var topBigram = 0
        var maxRun = 0
        var run = 0
        var i = 0
        while (i < toks.length) {
          distinct.add(toks(i))
          if (i > 0) {
            val bg = toks(i - 1) + " " + toks(i)
            val c = bigrams.merge(bg, 1, Integer.sum)
            if (c > topBigram) topBigram = c
          }
          run = if (i > 0 && toks(i) == toks(i - 1)) run + 1 else 1
          if (run > maxRun) maxRun = run
          i += 1
        }
        (docno, toks.length.toLong, distinct.size.toLong,
          topBigram.toLong, maxRun.toLong)
    }.toDF("docno", "n_tokens", "n_distinct", "top_bigram", "max_run")
  }
}
