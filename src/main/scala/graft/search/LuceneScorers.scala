package graft.search

import graft.codec.SmallFloat315

/** Formula-level reimplementations of the Lucene 5.4 stock similarities the
  * reference loads by reflection (`BatchSearch.java:117-160`; name map in
  * the `models` file: bm25L → BM25Similarity, defaultL → DefaultSimilarity,
  * lmdirichletL → LMDirichletSimilarity). Semantics follow the published
  * Lucene 5.4 sources: natural-log idf, avgdl over maxDoc, and the lossy
  * 1-byte norm — these similarities store boost/sqrt(dl) in a SmallFloat315
  * byte, so the decoded doc length is 1/f² of the decoded byte.
  */
object LuceneNorms {
  /** dl → the lossy doc length Lucene's norm decode cache yields:
    * decode(encode(1/sqrt(dl)))⁻².
    */
  def lossyDl(dl: Int): Float = {
    val f = SmallFloat315.byte315ToFloat(
      SmallFloat315.floatToByte315((1.0 / math.sqrt(dl.toDouble)).toFloat))
    1.0f / (f * f)
  }

  /** dl → decoded 1/sqrt(dl) norm (classic TF-IDF fieldNorm). */
  def lossyInvSqrt(dl: Int): Float =
    SmallFloat315.byte315ToFloat(
      SmallFloat315.floatToByte315((1.0 / math.sqrt(dl.toDouble)).toFloat))
}

/** Lucene 5.4 `BM25Similarity`: idf = ln(1 + (N − n + 0.5)/(n + 0.5)),
  * avgdl = sumTotalTermFreq/maxDoc, doc length through the lossy norm.
  */
object Bm25LuceneScorer extends Scorer {
  val name = "bm25L"
  val k1 = 1.2f
  val b = 0.75f
  def termWeight(docFreq: Long, cf: Long, s: CollStats): Float =
    math.log(1.0 + (s.maxDoc - docFreq + 0.5d) / (docFreq + 0.5d)).toFloat
  def score(tf: Float, dl: Int, idf: Float, s: CollStats): Float = {
    val avgdl = (s.sumTotalTermFreq / s.maxDoc.toDouble).toFloat
    val dlf = LuceneNorms.lossyDl(dl)
    val norm = k1 * ((1 - b) + b * dlf / avgdl)
    idf * (k1 + 1) * tf / (tf + norm)
  }
}

/** Lucene 5.4 `DefaultSimilarity` (classic TF-IDF): tf = sqrt(freq),
  * idf = 1 + ln(N/(n+1)), fieldNorm = lossy 1/sqrt(dl), with the classic
  * queryNorm (1/sqrt(Σ weight²)) and coord (overlap/maxOverlap) factors the
  * reference's own models disable but DefaultSimilarity keeps.
  */
object ClassicScorer extends Scorer {
  val name = "defaultL"
  def termWeight(docFreq: Long, cf: Long, s: CollStats): Float =
    (1.0 + math.log(s.maxDoc / (docFreq + 1.0))).toFloat
  def score(tf: Float, dl: Int, idf: Float, s: CollStats): Float =
    (math.sqrt(tf.toDouble).toFloat * idf * idf) * LuceneNorms.lossyInvSqrt(dl)
  override def queryNorm(clauseWeights: Seq[Float]): Float = {
    var sum = 0.0f
    clauseWeights.foreach(w => sum += w * w)
    if (sum == 0.0f) 1.0f else (1.0 / math.sqrt(sum.toDouble)).toFloat
  }
  override def coord(overlap: Int, maxOverlap: Int): Float =
    if (maxOverlap == 0) 1.0f else overlap.toFloat / maxOverlap
  override def supportsPruning: Boolean = false // coord < 1 breaks the bound
}

/** Lucene 5.4 `DFRSimilarity(BasicModelP, AfterEffectL, NormalizationH2)` —
  * the composition LTR's `dfrL` selects (`BatchSearch.java:123-132`).
  * Formula-level per the published 5.4 sources (byte parity unverified in
  * this sandbox — no Lucene jar):
  *   tfn   = tf · log2(1 + c·avgdl/dl), c = 1              (NormalizationH2)
  *   λ     = (cf + 1)/(N + 1)                               (BasicModelP)
  *   P     = tfn·log2(tfn/λ) + (λ + 1/(12·tfn) − tfn)·log2(e)
  *           + 0.5·log2(2π·tfn)
  *   score = max(0, boost · P · 1/(tfn + 1))                (AfterEffectL)
  */
object DfrScorer extends Scorer {
  val name = "dfrL"
  private val LOG2E = 1.0 / math.log(2.0)
  private def log2(x: Double): Double = math.log(x) / math.log(2.0)
  def termWeight(docFreq: Long, cf: Long, s: CollStats): Float =
    ((cf + 1.0) / (s.maxDoc + 1.0)).toFloat // λ
  def score(tf: Float, dl: Int, lambda: Float, s: CollStats): Float = {
    val avgdl = s.sumTotalTermFreq / s.maxDoc.toDouble
    val dlf = LuceneNorms.lossyDl(dl)
    val tfn = tf * log2(1.0 + avgdl / dlf)
    if (tfn <= 0) return 0.0f
    val p = tfn * log2(tfn / lambda) +
      (lambda + 1.0 / (12 * tfn) - tfn) * LOG2E +
      0.5 * log2(2 * math.Pi * tfn)
    math.max(0.0f, (p * (1.0 / (tfn + 1))).toFloat)
  }
  // monotonicity in tf is not provable for all λ — keep pruning off
  override def supportsPruning: Boolean = false
}

/** Lucene 5.4 `IBSimilarity(DistributionSPL, LambdaDF, NormalizationH2)` —
  * LTR's `ibL` (`BatchSearch.java:133-142`). Formula-level:
  *   tfn   = tf · log2(1 + avgdl/dl)                        (NormalizationH2)
  *   λ     = (df + 1)/(N + 1)                               (LambdaDF)
  *   score = max(0, boost · −log2((λ^(tfn/(tfn+1)) − λ)/(1 − λ)))   (SPL)
  */
object IbScorer extends Scorer {
  val name = "ibL"
  private def log2(x: Double): Double = math.log(x) / math.log(2.0)
  def termWeight(docFreq: Long, cf: Long, s: CollStats): Float =
    ((docFreq + 1.0f) / (s.maxDoc + 1.0f)) // λ
  def score(tf: Float, dl: Int, lambda: Float, s: CollStats): Float = {
    val avgdl = s.sumTotalTermFreq / s.maxDoc.toDouble
    val dlf = LuceneNorms.lossyDl(dl)
    val tfn = tf * log2(1.0 + avgdl / dlf)
    if (tfn <= 0) return 0.0f
    val v = -log2((math.pow(lambda, tfn / (tfn + 1.0)) - lambda) / (1.0 - lambda))
    math.max(0.0f, v.toFloat)
  }
  override def supportsPruning: Boolean = false
}

/** Lucene 5.4 `LMDirichletSimilarity` (μ = 2000): score =
  * log(1 + tf/(μ·p(w|C))) + log(μ/(dl + μ)), p(w|C) = (cf+1)/(Σcf+1),
  * doc length through the lossy norm. Lucene floors the total at 0 via
  * `Math.max(0.0f, score)` on SimilarityBase composition.
  */
object LmDirichletScorer extends Scorer {
  val name = "lmdirichletL"
  val mu = 2000.0f
  def termWeight(docFreq: Long, cf: Long, s: CollStats): Float =
    ((cf + 1.0) / (s.sumTotalTermFreq + 1.0)).toFloat // p(w|C)
  def score(tf: Float, dl: Int, p: Float, s: CollStats): Float = {
    val dlf = LuceneNorms.lossyDl(dl)
    val v = (math.log(1.0 + tf / (mu * p)) + math.log(mu / (dlf + mu))).toFloat
    math.max(0.0f, v)
  }
}
