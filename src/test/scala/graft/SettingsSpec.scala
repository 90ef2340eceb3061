package graft

import org.scalatest.funsuite.AnyFunSuite

class SettingsSpec extends AnyFunSuite {

  private val hjson =
    """## comment header
      |{
      |    stopFile:           stop.txt
      |    stemmer:            PorterStemFilter
      |    tokenizer:          ClassicTokenizer
      |    indexPath:          index
      |    docsPath:           corpus
      |    storeFields:        true
      |    warcFieldsToIndex:  ["contents", "title", "body", "a"]
      |    trecFieldsToIndex:  []
      |    searchField:        contents
      |    similarity:         BM25Similarity
      |    queryFile:          queries.txt
      |    returnedResultCount: 10
      |    includeSnippets:    true
      |}""".stripMargin

  test("hjson-subset parse mirrors the reference example settings") {
    val s = LtrSettings.fromMap(LtrSettings.parse(hjson))
    assert(s.stopFile == "stop.txt")
    assert(s.stemmer == "PorterStemFilter")
    assert(s.tokenizer == "ClassicTokenizer")
    assert(s.storeFields)
    assert(s.warcFieldsToIndex == Seq("contents", "title", "body", "a"))
    assert(s.trecFieldsToIndex == Nil)
    assert(s.similarity == "BM25Similarity")
    assert(s.returnedResultCount == 10)
    assert(s.includeSnippets)
  }

  test("defaults match the reference (LTRSettings.java:14-45)") {
    val d = LtrSettings()
    assert(d.returnedResultCount == 1000)
    assert(!d.storeFields)
    assert(d.tokenizer == "WhitespaceTokenizer")
    assert(d.stemmer == "None")
    assert(d.searchField == "contents")
    assert(d.memory == 4096)
  }

  test("cli overrides win over the file (IndexTREC.java:76)") {
    val s = LtrSettings.fromMap(
      Map("stemmer" -> "None", "returnedResultCount" -> "77"),
      LtrSettings.fromMap(LtrSettings.parse(hjson)))
    assert(s.stemmer == "None")
    assert(s.returnedResultCount == 77)
    assert(s.tokenizer == "ClassicTokenizer") // untouched
  }

  test("analyzer + scorer mapping from reference names") {
    val s = LtrSettings(tokenizer = "ClassicTokenizer",
      stemmer = "PorterStemFilter", similarity = "LMDirichletSimilarity")
    val a = s.analyzerConfig(Set("the"))
    assert(a.tokenizer == "classic")
    assert(a.stemmer == "porter")
    assert(a.stopWords == Set("the"))
    assert(s.scorerName == "lmdirichletL")
    assert(LtrSettings(similarity = "BM25").scorerName == "bm25")
  }
}
