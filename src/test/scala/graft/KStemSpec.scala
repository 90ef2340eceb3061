package graft

import graft.analysis.KStemmer
import org.scalatest.funsuite.AnyFunSuite

/** KStem (Krovetz) fixtures: the classic irregulars the exception tables
  * must handle, the dictionary-mediated -ves plural, and the inflectional
  * rule engine with head-word guards.
  */
class KStemSpec extends AnyFunSuite {

  test("classic irregular plurals conflate via the exception tables") {
    assert(KStemmer.stem("calves") == "calf")
    assert(KStemmer.stem("indices") == "index")
    assert(KStemmer.stem("matrices") == "matrix")
    assert(KStemmer.stem("vertices") == "vertex")
    assert(KStemmer.stem("wives") == "wife")
    assert(KStemmer.stem("children") == "child")
    assert(KStemmer.stem("feet") == "foot")
    assert(KStemmer.stem("teeth") == "tooth")
    assert(KStemmer.stem("mice") == "mouse")
    assert(KStemmer.stem("geese") == "goose")
    assert(KStemmer.stem("men") == "man")
    assert(KStemmer.stem("women") == "woman")
    assert(KStemmer.stem("oxen") == "ox")
    assert(KStemmer.stem("criteria") == "criterion")
    assert(KStemmer.stem("phenomena") == "phenomenon")
    assert(KStemmer.stem("analyses") == "analysis")
    assert(KStemmer.stem("hypotheses") == "hypothesis")
    assert(KStemmer.stem("corpora") == "corpus")
    assert(KStemmer.stem("schemata") == "schema")
  }

  test("dictionary-mediated -ves plural rule (beyond the direct table)") {
    // wolves is in the direct table; the rule itself also fires for any
    // lexicon f/fe head word
    assert(KStemmer.stem("wolves") == "wolf")
    assert(KStemmer.stem("shelves") == "shelf")
    assert(KStemmer.stem("knives") == "knife")
    // a regular -ves word whose stem is a lexicon '-ve' head word is NOT
    // mangled: curves → curve (plain s-drop), never "curf"
    assert(KStemmer.stem("curves") == "curve")
    assert(KStemmer.stem("serves") == "serve")
  }

  test("irregular -ing/-ies verbs from the direct-conflation table") {
    assert(KStemmer.stem("dying") == "die")
    assert(KStemmer.stem("lying") == "lie")
    assert(KStemmer.stem("tying") == "tie")
    assert(KStemmer.stem("aging") == "age")
    assert(KStemmer.stem("going") == "go")
    assert(KStemmer.stem("goes") == "go")
  }

  test("head words exit untouched (lexicon guards)") {
    for (w <- Seq("series", "species", "news", "class", "process", "during",
                  "thing", "being", "morning", "hundred", "sacred", "data",
                  "analysis", "index", "people"))
      assert(KStemmer.stem(w) == w, w)
  }

  test("inflectional rules with e-restoration and doubling undo") {
    assert(KStemmer.stem("tables") == "table")
    assert(KStemmer.stem("queries") == "query")
    assert(KStemmer.stem("joined") == "join")
    assert(KStemmer.stem("merging") == "merge")
    assert(KStemmer.stem("running") == "run")
    assert(KStemmer.stem("stopped") == "stop")
    assert(KStemmer.stem("churches") == "church")
    assert(KStemmer.stem("boxes") == "box")
    assert(KStemmer.stem("indexes") == "index")
  }

  test("undouble and e-restore are mutually exclusive (review regression)") {
    // a doubled consonant proves no 'e' was dropped — these must NOT be
    // captured by the lexicon's '-e' head words
    assert(KStemmer.stem("hopped") == "hop")
    assert(KStemmer.stem("tapped") == "tap")
    assert(KStemmer.stem("sitting") == "sit")
    assert(KStemmer.stem("robbed") == "rob")
    assert(KStemmer.stem("pinned") == "pin")
    // plural of an -ing head word still conflates through the s-drop
    assert(KStemmer.stem("strings") == "string")
    assert(KStemmer.stem("kings") == "king")
  }

  test("lexicon coverage over the gate corpus vocabulary is measured and bounded") {
    // The full Krovetz dictionary is unreachable in this sandbox (zero
    // egress, no Lucene jars on the classpath — verified), so the stand-in
    // lexicon's EXPOSURE is quantified instead of hand-waved: a stemming
    // decision is "dictionary-confirmed" when the word or its stem passes
    // through the exception/lexicon tables; a REWRITE (stem ≠ word) that
    // no table confirms is where a real KStem run could diverge. The gate
    // corpus must keep that exposed-rewrite share of the token mass small,
    // and this test prints the real numbers for the record.
    val spark = TestSpark.spark
    import spark.implicits._
    val an = new graft.analysis.Analyzer(graft.Engine.OracleAnalyzer)
    val vocab: Map[String, Long] = corpusVocab(spark, an)
    val total = vocab.values.sum.toDouble
    var confirmedMass = 0L
    var exposedMass = 0L
    var exposedTypes = 0
    vocab.foreach { case (w, n) =>
      val s = KStemmer.stem(w)
      val confirmed = KStemmer.DirectConflations.contains(w) ||
        KStemmer.Lexicon.contains(w) || KStemmer.Lexicon.contains(s)
      if (confirmed) confirmedMass += n
      else if (s != w) { exposedMass += n; exposedTypes += 1 }
    }
    info(f"corpus types=${vocab.size} tokens=${total.toLong} " +
      f"dict-confirmed=${confirmedMass / total * 100}%.1f%% " +
      f"exposed-rewrites=${exposedMass / total * 100}%.1f%% ($exposedTypes types)")
    // the 100%-coverage RATCHET: every gate stemming decision must be
    // table-backed — if the corpus drifts (or the lexicon regresses) this
    // fails loudly, naming the uncovered words
    val uncovered = vocab.keys.filter { w =>
      val s = KStemmer.stem(w)
      !(KStemmer.DirectConflations.contains(w) ||
        KStemmer.Lexicon.contains(w) || KStemmer.Lexicon.contains(s))
    }.toSeq.sorted
    assert(uncovered.isEmpty,
      s"gate vocabulary outside the KStem tables: ${uncovered.mkString(", ")}")
    assert(exposedMass == 0L && confirmedMass.toDouble == total)
    assert(vocab.nonEmpty && total > 0)
  }

  private def corpusVocab(spark: org.apache.spark.sql.SparkSession,
                          an: graft.analysis.Analyzer): Map[String, Long] = {
    import spark.implicits._
    graft.corpus.Corpus.fromDocuments(spark, "/root/testdata/sf0.001")
      .select("content").as[String].collect()
      .iterator.flatMap(an.analyze)
      .foldLeft(Map.empty[String, Long]) { (m, t) =>
        m.updated(t, m.getOrElse(t, 0L) + 1)
      }
  }
}
