package graft

import graft.corpus.Parsers
import org.scalatest.funsuite.AnyFunSuite

class ParserSpec extends AnyFunSuite {

  private val trecFixture =
    """<DOC>
      |<DOCNO>fix-doc-1</DOCNO>
      |<SOMETAG>arbitrary tags are handled </SOMETAG>
      |<TEXT>
      |First sample text.
      |</TEXT>
      |</DOC>
      |<DOC>
      |<DOCNO> fix-doc-2 </DOCNO>
      |<TEXT>
      |Second doc
      |spans lines.
      |</TEXT>
      |</DOC>""".stripMargin

  test("trec parser: literal markers, docno trim, tag-stripped contents") {
    val docs = Parsers.parseTrec(trecFixture)
    assert(docs.map(_.docno) == Seq("fix-doc-1", "fix-doc-2"))
    assert(docs.head.content == "fix-doc-1 arbitrary tags are handled First sample text.")
    assert(docs(1).content == "fix-doc-2 Second doc spans lines.")
  }

  test("trec parser: configured field projection") {
    val docs = Parsers.parseTrec(trecFixture, fieldsToIndex = Seq("text"))
    assert(docs.head.content == "First sample text.")
    // "contents" in the list adds the whole stripped block too
    val both = Parsers.parseTrec(trecFixture, fieldsToIndex = Seq("contents", "text"))
    assert(both.head.content.contains("arbitrary tags"))
    assert(both.head.content.endsWith("First sample text."))
  }

  test("trec parser: unmatched markers and text outside docs are ignored") {
    val messy = "stray line\n<DOC>\n<DOCNO>d1</DOCNO>\nbody\n</DOC>\ntrailing\n</DOC>"
    val docs = Parsers.parseTrec(messy)
    assert(docs.map(_.docno) == Seq("d1"))
  }

  private val warcFixture =
    Seq(
      "WARC/1.0",
      "WARC-Type: warcinfo",
      "WARC-Record-ID: <urn:uuid:1>",
      "",
      "ignored preamble",
      "",
      "WARC/1.0",
      "WARC-Type: response",
      "WARC-TREC-ID: warc-fix-1",
      "Content-Type: application/http; msgtype=response",
      "",
      "HTTP/1.1 200 OK",
      "Content-Type: text/html",
      "",
      "<html><title>Hello</title><body>World</body></html>",
      "",
      "WARC/1.0",
      "WARC-Type: response",
      "Content-Type: application/http",
      "",
      "HTTP/1.1 200 OK",
      "",
      "<html>no trec id, skipped</html>"
    ).mkString("\n")

  test("warc parser: response + trec-id filter, markup KEPT in content") {
    val docs = Parsers.parseWarc(warcFixture)
    assert(docs.map(_.docno) == Seq("warc-fix-1"))
    // outerHtml quirk: markup included, unlike the TREC parser
    assert(docs.head.content.contains("<title>Hello</title>"))
  }

  test("simple parser: basename docno, lines joined with NO separator") {
    val d = Parsers.parseSimple("line one\nline two\n", "/data/corpus/doc42.txt")
    assert(d.docno == "doc42")
    assert(d.content == "line oneline two")
  }

  test("topics parser: case-insensitive tags, feedback block") {
    val topics = Parsers.parseTopics(
      """<TOP>
        |  <NUM> 1 </NUM>
        |  <TEXT> web page </TEXT>
        |</TOP>
        |<top>
        |  <num>3</num>
        |  <feedback>
        |    <topTermsToKeep>3</topTermsToKeep>
        |    <doc relevant="true" docno="d-1"/>
        |    <doc relevant="false" docno="d-2"/>
        |  </feedback>
        |  <preprocessor class="ExplicitFeedbackM1PreProcessor"/>
        |  <postprocessor class="FeedbackDocumentFilter"/>
        |</top>""".stripMargin)
    assert(topics.size == 2)
    assert(topics.head.qid == "1")
    assert(topics.head.text == "web page")
    assert(topics.head.feedbackDocs.isEmpty)
    val fb = topics(1)
    assert(fb.qid == "3")
    assert(fb.topTermsToKeep == 3)
    assert(fb.feedbackDocs == Seq(
      graft.search.Feedback.FeedbackDoc(true, Some("d-1"), None),
      graft.search.Feedback.FeedbackDoc(false, Some("d-2"), None)))
    assert(fb.preprocessor.contains("ExplicitFeedbackM1PreProcessor"))
    assert(fb.postprocessor.contains("FeedbackDocumentFilter"))
  }

  test("topics parser: inline feedback-doc content, attr-precedence, errors") {
    // ≙ ExplicitFeedbackM1PreProcessor.java:226-240: docno attr OR node
    // text; text ignored when docno present; error when neither; error on
    // missing/invalid 'relevant'.
    val topics = Parsers.parseTopics(
      """<top>
        |  <num>9</num>
        |  <feedback>
        |    <doc relevant="true">inline relevant text</doc>
        |    <doc relevant="false" docno="d-7">ignored because docno wins</doc>
        |    <doc relevant="true" docno="d-8"/>
        |  </feedback>
        |</top>""".stripMargin)
    assert(topics.head.feedbackDocs == Seq(
      graft.search.Feedback.FeedbackDoc(true, None, Some("inline relevant text")),
      graft.search.Feedback.FeedbackDoc(false, Some("d-7"), None),
      graft.search.Feedback.FeedbackDoc(true, Some("d-8"), None)))
    intercept[IllegalArgumentException] { // neither docno nor text
      Parsers.parseTopics(
        "<top><num>9</num><feedback><doc relevant=\"true\"/></feedback></top>")
    }
    intercept[IllegalArgumentException] { // missing relevant
      Parsers.parseTopics(
        "<top><num>9</num><feedback><doc docno=\"d-1\"/></feedback></top>")
    }
    intercept[IllegalArgumentException] { // invalid relevant value
      Parsers.parseTopics(
        "<top><num>9</num><feedback><doc relevant=\"yes\" docno=\"d-1\"/></feedback></top>")
    }
  }

  test("dataset-level trec reader round-trips through spark") {
    val dir = TestSpark.tmpDir("trec")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "a.trec"), trecFixture)
    val df = Parsers.readTrecCorpus(TestSpark.spark, dir)
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("fix-doc-1", "fix-doc-2"))
  }
}
