package graft

import graft.analysis.AnalyzerConfig
import graft.index.IndexConfig

/** Flat key-value run settings — ≙ the reference's `LTRSettings`
  * (`LTRSettings.java:14-45`: HJSON file + CLI override, same field names
  * and defaults). Parsed from an HJSON-subset (comments, unquoted
  * keys/values, `[a, b]` arrays — enough for files shaped like
  * `example/settings.hjson`) with `key=value` CLI overrides applied after
  * (`LTRSettings.java:88-125`).
  */
final case class LtrSettings(
    indexPath: String = "index",
    docsPath: String = "corpus",
    queryFile: String = "queries.txt",
    returnedResultCount: Int = 1000, // LTRSettings.java:14
    storeFields: Boolean = false,    // :16
    tokenizer: String = "WhitespaceTokenizer", // :20
    stemmer: String = "None",        // :23
    stopFile: String = "None",
    searchField: String = "contents", // :26
    similarity: String = "BM25Similarity",
    memory: Double = 4096,           // :28 (RAM buffer MiB — shuffle sizing here)
    includeSnippets: Boolean = false,
    maxSnippetFragments: Int = 4,
    fileFormat: String = "trec",
    trecFieldsToIndex: Seq[String] = Nil,
    warcFieldsToIndex: Seq[String] = Nil,
    // engine extension (no reference analog): store in-doc positions so
    // SimpleQueryParser "..." phrases match by exact adjacency
    indexPositions: Boolean = false,
    // ≙ SearchFiles.java:42,60-62 `-repeat n`: before paging, re-run each
    // query n times and print `Time: <ms>ms` — the demo's latency loop
    repeat: Int = 0
) {
  /** Engine analyzer config from the reference-style settings. */
  def analyzerConfig(stopWords: Set[String]): AnalyzerConfig =
    AnalyzerConfig(
      tokenizer = tokenizer match {
        case "None" | "WhitespaceTokenizer" => "whitespace"
        case "ClassicTokenizer"             => "classic"
        case other                          => other
      },
      stopWords = stopWords,
      stemmer = stemmer match {
        case "None"                     => "none"
        case "PorterStemFilter"         => "porter"
        case "EnglishMinimalStemFilter" => "minimal"
        case other                      => other
      })

  /** Scorer name from the reference's `models`-file naming. */
  def scorerName: String = similarity match {
    case "BM25Similarity"        => "bm25L"
    case "DefaultSimilarity"     => "defaultL"
    case "LMDirichletSimilarity" => "lmdirichletL"
    case "DFRSimilarity"         => "dfrL"
    case "IBSimilarity"          => "ibL"
    case "BM25"                  => "bm25"
    case "BM25e"                 => "bm25e"
    case "TMPL"                  => "tmpl"
    case "TMPLe"                 => "tmple"
    case other                   => other
  }
}

object LtrSettings {
  /** Parse the HJSON subset the reference's example uses: `##`/`#` comment
    * lines, `key: value`, quoted or bare values, `["a", "b"]` arrays,
    * optional surrounding braces.
    */
  def parse(text: String): Map[String, String] = {
    text.linesIterator
      .map(_.trim)
      .filterNot(l => l.isEmpty || l.startsWith("#") || l == "{" || l == "}")
      .flatMap { line =>
        val i = line.indexOf(':')
        if (i < 0) None
        else {
          val k = line.substring(0, i).trim.stripPrefix("\"").stripSuffix("\"")
          val v = line.substring(i + 1).trim.stripSuffix(",").trim
          Some(k -> stripQuotes(v))
        }
      }.toMap
  }

  private def stripQuotes(v: String): String =
    if (v.length >= 2 && v.startsWith("\"") && v.endsWith("\"")) v.substring(1, v.length - 1)
    else v

  private def parseList(v: String): Seq[String] =
    v.stripPrefix("[").stripSuffix("]").split(",").iterator
      .map(s => stripQuotes(s.trim)).filter(_.nonEmpty).toSeq

  def fromMap(m: Map[String, String], base: LtrSettings = LtrSettings()): LtrSettings = {
    var s = base
    m.foreach {
      case ("indexPath", v)           => s = s.copy(indexPath = v)
      case ("docsPath", v)            => s = s.copy(docsPath = v)
      case ("queryFile", v)           => s = s.copy(queryFile = v)
      case ("returnedResultCount", v) => s = s.copy(returnedResultCount = v.toInt)
      case ("storeFields", v)         => s = s.copy(storeFields = v.toBoolean)
      case ("tokenizer", v)           => s = s.copy(tokenizer = v)
      case ("stemmer", v)             => s = s.copy(stemmer = v)
      case ("stopFile", v)            => s = s.copy(stopFile = v)
      case ("searchField", v)         => s = s.copy(searchField = v)
      case ("similarity", v)          => s = s.copy(similarity = v)
      case ("memory", v)              => s = s.copy(memory = v.toDouble)
      case ("includeSnippets", v)     => s = s.copy(includeSnippets = v.toBoolean)
      case ("maxSnippetFragments", v) => s = s.copy(maxSnippetFragments = v.toInt)
      case ("fileFormat", v)          => s = s.copy(fileFormat = v)
      case ("trecFieldsToIndex", v)   => s = s.copy(trecFieldsToIndex = parseList(v))
      case ("warcFieldsToIndex", v)   => s = s.copy(warcFieldsToIndex = parseList(v))
      case ("indexPositions", v)      => s = s.copy(indexPositions = v.toBoolean)
      case ("repeat", v)              => s = s.copy(repeat = v.toInt)
      case _                          => // unknown keys ignored like Gson does
    }
    s
  }

  /** Settings file (optional) + `key=value` CLI overrides. */
  def load(file: Option[String], overrides: Seq[String]): LtrSettings = {
    val fromFile = file.map(f =>
      fromMap(parse(java.nio.file.Files.readString(java.nio.file.Paths.get(f)))))
      .getOrElse(LtrSettings())
    val ovMap = overrides.flatMap { o =>
      val i = o.indexOf('=')
      if (i > 0) Some(o.substring(0, i) -> o.substring(i + 1)) else None
    }.toMap
    fromMap(ovMap, fromFile)
  }
}
