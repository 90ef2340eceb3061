package graft.corpus

import graft.search.Feedback.FeedbackDoc
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.regex.Pattern

/** Ingest parsers replicating the reference's `FileParser` semantics for
  * fixture-format corpora. The north-rule corpus is already one row per
  * document, so these matter only for TREC/WARC/plain-file ingest parity
  * (SURVEY.md §2.1). Tag-stripping approximates Jsoup's `.text()`
  * (tags removed, entities decoded, whitespace collapsed) and is
  * fixture-locked in ParserSpec.
  */
object Parsers {

  final case class ParsedDoc(docno: String, content: String)

  /** Approximate Jsoup `Element.text()`: strip tags/comments, decode the
    * common entities, collapse whitespace.
    */
  def stripTags(html: String): String = {
    val noComments = html.replaceAll("(?s)<!--.*?-->", " ")
    val noTags = noComments.replaceAll("(?s)<[^>]*>", " ")
    val decoded = noTags
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&nbsp;", " ").replace("&amp;", "&")
    decoded.split("\\s+").filter(_.nonEmpty).mkString(" ")
  }

  private def firstTagText(block: String, tag: String): Option[String] = {
    val m = Pattern
      .compile(s"(?is)<$tag[^>]*>(.*?)</$tag>")
      .matcher(block)
    if (m.find()) Some(stripTags(m.group(1)).trim) else None
  }

  private def tagTexts(block: String, tag: String): Seq[String] = {
    val m = Pattern.compile(s"(?is)<$tag[^>]*>(.*?)</$tag>").matcher(block)
    val out = Seq.newBuilder[String]
    while (m.find()) out += stripTags(m.group(1))
    out.result()
  }

  /** TREC multi-doc file → docs. Marker matching is the reference's exact
    * line-scan — a line must be literally `<DOC>` / `</DOC>`
    * (`FileParser.java:193-198`); docno = first `<DOCNO>` text trimmed
    * (`:201`); content = configured tags' text joined, or the whole
    * tag-stripped block (`:206-217`).
    */
  def parseTrec(fileText: String, fieldsToIndex: Seq[String] = Nil): Seq[ParsedDoc] = {
    val out = Seq.newBuilder[ParsedDoc]
    var current: StringBuilder = null
    fileText.split("\n", -1).foreach { line =>
      if (line == "<DOC>" && current == null) {
        current = new StringBuilder
        current.append(line).append('\n')
      } else if (line == "</DOC>" && current != null) {
        current.append(line)
        val block = current.toString
        val docno = firstTagText(block, "DOCNO").getOrElse("")
        val wantContents = fieldsToIndex.isEmpty || fieldsToIndex.contains("contents")
        val fieldText = fieldsToIndex.filterNot(_ == "contents")
          .flatMap(f => tagTexts(block, f))
        val contents =
          (if (wantContents) Seq(stripTags(block)) else Nil) ++ fieldText
        out += ParsedDoc(docno, contents.mkString(" "))
        current = null
      } else if (current != null) {
        current.append(line).append('\n')
      }
    }
    out.result()
  }

  /** WARC file → docs: keep only records with `WARC-Type: response` AND a
    * `WARC-TREC-ID` (= docno) (`FileParser.java:266-276`); content is the
    * HTTP payload with markup INCLUDED — the reference indexes
    * `soup.outerHtml()` when no field list is configured (`:298`), unlike
    * the TREC parser's tag-stripped text.
    */
  def parseWarc(fileText: String): Seq[ParsedDoc] = {
    val records = fileText.split("(?m)^WARC/\\d+\\.\\d+\\s*$").toSeq.drop(1)
    records.flatMap { rec =>
      val headerEnd = rec.indexOf("\r\n\r\n") match {
        case -1 => rec.indexOf("\n\n")
        case i  => i
      }
      if (headerEnd < 0) None
      else {
        val headers = rec.substring(0, headerEnd)
        def header(name: String): Option[String] =
          headers.linesIterator
            .find(_.toLowerCase.startsWith(name.toLowerCase + ":"))
            .map(_.split(":", 2)(1).trim)
        (header("WARC-Type"), header("WARC-TREC-ID")) match {
          case (Some("response"), Some(id)) =>
            val body = rec.substring(headerEnd).trim
            // skip the HTTP response headers to the payload
            val payloadStart = body.indexOf("\r\n\r\n") match {
              case -1 => body.indexOf("\n\n")
              case i  => i
            }
            val payload = if (payloadStart >= 0) body.substring(payloadStart).trim else body
            Some(ParsedDoc(id, payload))
          case _ => None
        }
      }
    }
  }

  /** Simple file = one doc; docno = file base name; lines concatenated
    * WITHOUT separators — the reference appends `readLine()` results
    * directly (`FileParser.java:154-155`).
    */
  def parseSimple(fileText: String, filename: String): ParsedDoc = {
    val base = {
      val n = filename.substring(filename.lastIndexOf('/') + 1)
      val dot = n.lastIndexOf('.')
      if (dot > 0) n.substring(0, dot) else n
    }
    ParsedDoc(base, fileText.split("\n", -1).mkString(""))
  }

  // -- topic (query) file ----------------------------------------------------

  final case class ParsedTopic(
      qid: String,
      text: String,
      feedbackDocs: Seq[FeedbackDoc],
      topTermsToKeep: Int,
      preprocessor: Option[String],
      postprocessor: Option[String])

  /** Parse a TREC topics file: `<top>` blocks (case-insensitive), qid =
    * `<num>` trimmed, text = `<text>`; optional `<feedback>` +
    * per-query processor declarations (`BatchSearch.java:193-233`,
    * `example/queries.txt`).
    */
  def parseTopics(fileText: String): Seq[ParsedTopic] = {
    val topM = Pattern.compile("(?is)<top>(.*?)</top>").matcher(fileText)
    val out = Seq.newBuilder[ParsedTopic]
    while (topM.find()) {
      val block = topM.group(1)
      val qid = firstTagText(block, "num").getOrElse("")
      val text = firstTagText(block, "text").getOrElse("")
      val fb = Pattern.compile("(?is)<feedback>(.*?)</feedback>").matcher(block)
      val (docs, keep) =
        if (fb.find()) {
          val fblock = fb.group(1)
          // self-closing <doc attrs/> OR <doc attrs>inline content</doc> —
          // the reference accepts a docno attribute OR node text as the
          // document content ("Text is ignored if docno is provided"), and
          // errors when neither is present
          // (`ExplicitFeedbackM1PreProcessor.java:226-240`).
          val docM = Pattern.compile(
            "(?is)<doc\\b([^>]*?)/>|<doc\\b([^>]*?)>(.*?)</doc>").matcher(fblock)
          val ds = Seq.newBuilder[FeedbackDoc]
          while (docM.find()) {
            val selfClosing = docM.group(1) != null
            val attrs = if (selfClosing) docM.group(1) else docM.group(2)
            val body = if (selfClosing) "" else stripTags(docM.group(3)).trim
            def attr(name: String): Option[String] = {
              val am = Pattern.compile(s"""(?i)$name\\s*=\\s*"([^"]*)"""").matcher(attrs)
              if (am.find()) Some(am.group(1)) else None
            }
            val rel = attr("relevant").getOrElse(throw new IllegalArgumentException(
              s"Feedback <doc> missing 'relevant' attribute: $attrs"))
            if (rel != "true" && rel != "false")
              throw new IllegalArgumentException(
                s"Feedback <doc> 'relevant' attribute value invalid: $rel")
            val docno = attr("docno")
            if (docno.isEmpty && body.isEmpty)
              throw new IllegalArgumentException(
                "Feedback <doc>s must have either a 'docno' attribute or " +
                  "contain text to use as the document contents")
            ds += FeedbackDoc(
              relevant = rel == "true",
              docno = docno,
              content = if (docno.nonEmpty) None else Some(body))
          }
          (ds.result(), firstTagText(fblock, "topTermsToKeep").map(_.toInt).getOrElse(-1))
        } else (Nil, -1)
      def classAttr(tag: String): Option[String] = {
        val m = Pattern.compile(s"""(?is)<$tag\\s+class\\s*=\\s*"([^"]*)"""").matcher(block)
        if (m.find()) Some(m.group(1)) else None
      }
      out += ParsedTopic(qid, text, docs, keep,
        classAttr("preprocessor"), classAttr("postprocessor"))
    }
    out.result()
  }

  // -- Dataset-level readers ---------------------------------------------------

  /** Read a directory of TREC files into a corpus DataFrame — the
    * distributed replacement for the reference's file-tree walk
    * (`IndexTREC.java:108-141`): Spark's text reader handles the directory
    * recursion and gz/bz2 codecs natively (≙ compression sniffing,
    * `FileParser.java:85-98`).
    */
  def readTrecCorpus(spark: SparkSession, path: String,
                     fieldsToIndex: Seq[String] = Nil,
                     recursive: Boolean = false): DataFrame = {
    import spark.implicits._
    // recursive = walk the whole tree under `path` (preferred over a
    // `path/*` glob: Spark's listing probes the literal glob string first
    // and logs a spurious handled FileNotFoundException per query)
    spark.read.option("wholetext", "true")
      .option("recursiveFileLookup", recursive.toString)
      .textFile(path)
      .flatMap(parseTrec(_, fieldsToIndex))
      .toDF("docno", "content")
  }

  def readWarcCorpus(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").textFile(path)
      .flatMap(parseWarc(_))
      .toDF("docno", "content")
  }

  def readSimpleCorpus(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .select(col("value"), input_file_name().as("file"))
      .as[(String, String)]
      .map { case (text, file) =>
        val d = parseSimple(text, file)
        (d.docno, d.content)
      }
      .toDF("docno", "content")
  }
}
