package graft.analysis

/** Configuration for the analysis chain — the engine-side equivalent of the
  * reference's settings surface (`LTRSettings.java:20-26`: `tokenizer`,
  * `stopFile`, `stemmer`, with "None" meaning disabled).
  */
final case class AnalyzerConfig(
    tokenizer: String = "whitespace",
    stopWords: Set[String] = Set.empty,
    stemmer: String = "none",
    foldAscii: Boolean = false, // ≙ ASCIIFoldingFilter (AsciiFold subset)
    shingleSize: Int = 1 // ≙ ShingleFilter(n, outputUnigrams) when > 1
) {
  /** Stable id used in index manifests so a config change invalidates
    * checkpointed stages. (`fold=1`/`sh=n` appended only when enabled, so
    * every pre-existing checkpointed index id is unchanged.)
    */
  def id: String = {
    val stop = if (stopWords.isEmpty) "-" else stopWords.toSeq.sorted.mkString(",")
    val fold = if (foldAscii) ";fold=1" else ""
    val sh = if (shingleSize > 1) s";sh=$shingleSize" else ""
    s"tok=$tokenizer;stop=${Integer.toHexString(stop.hashCode)};stem=$stemmer$fold$sh"
  }
}

/** The analysis chain: tokenize → lowercase → [fold] → stop-filter → stem,
  * exactly the reference's `TrecAnalyzer` composition and order
  * (`TrecAnalyzer.java:48-106`; lowercase always applied BEFORE stopping,
  * :72-76, so the stop list is effectively case-insensitive against input
  * tokens; the optional ASCII fold sits between them, the conventional
  * ASCIIFoldingFilter slot, so stop terms compare against folded forms).
  * Serializable: one instance is closed over by Dataset transformations
  * and shipped to executors.
  */
final class Analyzer(val cfg: AnalyzerConfig) extends Serializable {
  private val tokenizer = Tokenizer.byName(cfg.tokenizer)
  private val stemmer = Stemmer.byName(cfg.stemmer)
  private val stop = cfg.stopWords // already-lowercased stop terms
  private val stopping = stop.nonEmpty
  private val stemming = stemmer ne NoStemmer
  private val folding = cfg.foldAscii

  /** Code-point-wise lowercase (the observable behavior of Lucene's
    * `LowerCaseFilter`), NOT `String.toLowerCase` whose locale-aware
    * multi-char mappings would diverge.
    */
  def lowercase(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** Analyzed terms in order (positions collapse like Lucene's StopFilter:
    * stopped tokens are simply absent and do not count toward doc length,
    * matching `FieldInvertState.getLength` semantics used as the norm,
    * reference `BM25.java:146-149`).
    */
  def analyze(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = Array.newBuilder[String]
    val it = tokenizer.tokenize(text)
    while (it.hasNext) {
      val low0 = lowercase(it.next())
      val low = if (folding) AsciiFold.fold(low0) else low0
      if (!stopping || !stop.contains(low)) {
        out += (if (stemming) stemmer.stem(low) else low)
      }
    }
    val base = out.result()
    if (cfg.shingleSize <= 1) base else shingled(base)
  }

  /** Word n-gram shingling over the post-stop term stream (≙ Lucene's
    * ShingleFilter with outputUnigrams=true / Elasticsearch's
    * `index_phrases` 2-shingle field — the index-time phrase-speed trade):
    * at each term emit the unigram, then the space-joined n-gram starting
    * there, Lucene's emission order. One documented deviation: no "_"
    * filler tokens at stop-removed positions — shingles join consecutive
    * SURVIVING terms, so a shingle can span a removed stopword
    * (ShingleSpec locks this). Shingles count toward doc length exactly
    * like Lucene (FieldInvertState.getLength counts every emitted token,
    * position-increment-0 ones included).
    */
  private def shingled(base: Array[String]): Array[String] = {
    val n = cfg.shingleSize
    val out = Array.newBuilder[String]
    out.sizeHint(2 * base.length)
    var i = 0
    while (i < base.length) {
      out += base(i)
      if (i + n <= base.length) {
        val sb = new java.lang.StringBuilder(base(i))
        var j = i + 1
        while (j < i + n) { sb.append(' ').append(base(j)); j += 1 }
        out += sb.toString
      }
      i += 1
    }
    out.result()
  }

  /** Analyzed (term, position) pairs, where position is the token's index
    * in the post-tokenize stream COUNTING stopped tokens — Lucene's
    * positionIncrement semantics (StopFilter leaves gaps) — and honoring
    * the tokenizer's own increments (ClassicTokenizer's discarded
    * over-long tokens leave gaps too), so phrase matching across a
    * stopped or discarded word behaves like the reference's analyzer
    * chain would.
    */
  def analyzeWithPositions(text: String): Array[(String, Int)] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = Array.newBuilder[(String, Int)]
    val it = tokenizer.tokenizeWithIncrements(text)
    var pos = 0
    while (it.hasNext) {
      val (raw, inc) = it.next()
      pos += inc - 1 // tokenizer-level skips (discarded over-long matches)
      val low0 = lowercase(raw)
      val low = if (folding) AsciiFold.fold(low0) else low0
      if (!stopping || !stop.contains(low)) {
        out += ((if (stemming) stemmer.stem(low) else low, pos))
      }
      pos += 1
    }
    val base = out.result()
    if (cfg.shingleSize <= 1) base
    else {
      // a shingle sits at its FIRST token's position (posIncrement 0
      // after the unigram), like ShingleFilter
      val n = cfg.shingleSize
      val sh = Array.newBuilder[(String, Int)]
      sh.sizeHint(2 * base.length)
      var i = 0
      while (i < base.length) {
        sh += base(i)
        if (i + n <= base.length) {
          val sb = new java.lang.StringBuilder(base(i)._1)
          var j = i + 1
          while (j < i + n) { sb.append(' ').append(base(j)._1); j += 1 }
          sh += ((sb.toString, base(i)._2))
        }
        i += 1
      }
      sh.result()
    }
  }

  /** (term, tf, positions) triples for one document plus its doc length —
    * one pass, no shuffle; positions ascending per term.
    */
  def termFreqsWithPositions(text: String): (Array[(String, Int, Array[Int])], Int) = {
    val tps = analyzeWithPositions(text)
    if (tps.isEmpty) return (Array.empty, 0)
    val m = new java.util.LinkedHashMap[String, scala.collection.mutable.ArrayBuilder.ofInt]()
    var i = 0
    while (i < tps.length) {
      val (t, p) = tps(i)
      var b = m.get(t)
      if (b == null) { b = new scala.collection.mutable.ArrayBuilder.ofInt; m.put(t, b) }
      b += p
      i += 1
    }
    val out = new Array[(String, Int, Array[Int])](m.size)
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      val ps = e.getValue.result()
      out(k) = (e.getKey, ps.length, ps)
      k += 1
    }
    (out, tps.length)
  }

  /** (term, tf) pairs for one document plus its doc length — one pass, no
    * shuffle: tf is computed within the row (SURVEY.md §2.4).
    */
  def termFreqs(text: String): (Array[(String, Int)], Int) = {
    val terms = analyze(text)
    if (terms.isEmpty) return (Array.empty, 0)
    val m = new java.util.HashMap[String, Int](terms.length * 2)
    var i = 0
    while (i < terms.length) {
      m.put(terms(i), m.getOrDefault(terms(i), 0) + 1)
      i += 1
    }
    val out = new Array[(String, Int)](m.size)
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) { val e = it.next(); out(k) = (e.getKey, e.getValue); k += 1 }
    (out, terms.length)
  }
}

object Analyzer {
  /** Parse a stop list the way the reference does: whitespace-token scan of
    * the file text (`TrecAnalyzer.java:28-40`).
    */
  def parseStopWords(text: String): Set[String] =
    text.split("\\s+").iterator.filter(_.nonEmpty).toSet
}
