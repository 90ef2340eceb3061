package graft.ops

import graft.analysis.Analyzer
import org.apache.spark.sql.DataFrame

/** Document fingerprinting by winnowing (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003)
  * — the standard near-copy detection fingerprint for large corpora: hash
  * every word k-gram, then from every window of `w` consecutive hashes
  * keep the minimum (rightmost on ties), guaranteeing at least one shared
  * fingerprint for any match of length ≥ w + k − 1 tokens.
  *
  * K-gram hashes are the first 8 md5 hex chars as an unsigned 32-bit value
  * (so the DuckDB oracle reproduces them exactly via
  * `('0x' || substr(md5(g),1,8))::BIGINT`); a production deployment would
  * swap in a cheaper rolling polynomial hash behind the same column shape.
  *
  * Scale: one narrow flatMap per document (O(n·w) selection over ~doc-length
  * arrays) — no shuffle until the caller aggregates fingerprints, which is
  * a hash-partitioned groupBy on the fingerprint value.
  */
object Fingerprint {

  // one digest per thread, reset per gram — a fresh getInstance per k-gram
  // would be a provider lookup + allocation on the per-token hot path
  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 md5 hex chars of the gram, as an unsigned 32-bit Long. */
  def gramHash(gram: String): Long = {
    val md = Md5.get()
    md.reset()
    val d = md.digest(gram.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Winnowed fingerprint positions for one token sequence: (kgramPos,
    * hash) pairs, distinct, position-ascending.
    */
  def winnow(tokens: IndexedSeq[String], k: Int, w: Int): Seq[(Int, Long)] = {
    if (tokens.length < k) return Nil
    val hs = Array.tabulate(tokens.length - k + 1)(i =>
      gramHash(tokens.slice(i, i + k).mkString(" ")))
    if (hs.length <= w) {
      // fewer grams than one window: keep the single rightmost minimum
      var best = 0
      for (i <- hs.indices) if (hs(i) <= hs(best)) best = i
      return Seq((best, hs(best)))
    }
    val out = scala.collection.mutable.LinkedHashSet.empty[(Int, Long)]
    var s = 0
    while (s + w <= hs.length) {
      var best = s
      var i = s + 1
      while (i < s + w) { if (hs(i) <= hs(best)) best = i; i += 1 } // rightmost min
      out += ((best, hs(best)))
      s += 1
    }
    out.toSeq
  }

  /** (docno, pos, fp) winnowed fingerprints over the analyzed token stream. */
  def fingerprints(corpus: DataFrame, analyzer: Analyzer,
                   k: Int = 3, w: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(org.apache.spark.sql.functions.col("docno").cast("string"),
        org.apache.spark.sql.functions.col("content").cast("string"))
      .as[(String, String)]
      .flatMap { case (docno, content) =>
        val toks = analyzer.analyze(if (content == null) "" else content)
        winnow(toks.toIndexedSeq, k, w).iterator.map { case (p, h) => (docno, p, h) }
      }.toDF("docno", "pos", "fp")
  }
}
