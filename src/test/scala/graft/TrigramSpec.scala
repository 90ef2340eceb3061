package graft

import graft.index.TrigramIndex
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Trigram substring index: gram extraction, build/resume, df table, and
  * the candidate-intersect + verify query path against a brute-force
  * contains() oracle — including a constructed false-positive corpus (all
  * needle grams present, never contiguous) that must die in verification.
  */
class TrigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("grams: distinct char trigrams in first-occurrence order") {
    assert(TrigramIndex.grams("abcd").toSeq == Seq("abc", "bcd"))
    assert(TrigramIndex.grams("aaaa").toSeq == Seq("aaa"))
    assert(TrigramIndex.grams("ab").isEmpty)
    assert(TrigramIndex.grams("").isEmpty)
    assert(TrigramIndex.grams("ababa").toSeq == Seq("aba", "bab"))
  }

  private val corpus = Seq(
    ("d-01", "abc def ghi"),
    ("d-02", "abc bc c de def"), // false positive for "abc def": every gram, not contiguous
    ("d-03", "xyz abc def abc def"), // two non-overlapping hits
    ("d-04", "unrelated words only"),
    ("d-05", "def abc"), // grams of both words but wrong order for the needle
    ("d-06", "zz")) // shorter than a trigram: posts nothing

  private def builtTable() = {
    import spark.implicits._
    val dir = TestSpark.tmpDir("trigram")
    TrigramIndex.build(corpus.toDF("docno", "content"), dir) -> dir
  }

  test("build + df: the gram table is the distinct per-doc trigram set") {
    val (gt, dir) = builtTable()
    val brute: Map[String, Long] = corpus
      .flatMap { case (d, c) => TrigramIndex.grams(c).map(_ -> d) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size.toLong }
    val engine = TrigramIndex.gramDf(gt).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(engine == brute)

    // resume: a second build over the same corpus must reuse the
    // completed checkpoint (manifest mtime untouched)
    import spark.implicits._
    val manifest = new java.io.File(dir, "_graft_manifest.json")
    val before = manifest.lastModified()
    TrigramIndex.build(corpus.toDF("docno", "content"), dir)
    assert(manifest.lastModified() == before, "resume rebuilt a completed stage")
  }

  test("substringTopK: trigram candidates + verify ≡ brute contains scan") {
    import spark.implicits._
    val (gt, _) = builtTable()
    val needles = Seq(("q1", "abc def"), ("q2", "def"), ("q3", "zzz"))
    val got = TrigramIndex.substringTopK(
        corpus.toDF("docno", "content"), gt, needles, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))

    def count(c: String, n: String): Long = {
      var i = 0; var h = 0L
      while ({ i = c.indexOf(n, i); i >= 0 }) { h += 1; i += n.length }
      h
    }
    val brute = needles.flatMap { case (qid, n) =>
      corpus.map { case (d, c) => (qid, d, count(c, n)) }
        .filter(_._3 > 0)
        .sortBy { case (_, d, h) => (-h, d) }
        .zipWithIndex.map { case ((q, d, h), r) => (q, d, h, r.toLong) }
    }.sortBy(t => (t._1, t._4))
    assert(got.toSeq == brute)
    // the false-positive doc carried every gram of "abc def" yet must not match
    assert(!got.exists(t => t._1 == "q1" && t._2 == "d-02"))
    // and it genuinely was a candidate: it posts all 5 needle grams
    val needleGrams = TrigramIndex.grams("abc def").toSet
    assert(needleGrams.subsetOf(TrigramIndex.grams("abc bc c de def").toSet))
  }

  test("expandAlternation: literal branches in pattern order") {
    assert(TrigramIndex.expandAlternation("abc").toSeq == Seq("abc"))
    assert(TrigramIndex.expandAlternation("a(b|c)d").toSeq == Seq("abd", "acd"))
    assert(TrigramIndex.expandAlternation("(a|b) (c|d)").toSeq ==
      Seq("a c", "a d", "b c", "b d"))
    intercept[IllegalArgumentException] {
      TrigramIndex.expandAlternation("a(b|(c|d))")
    }
    intercept[IllegalArgumentException] {
      TrigramIndex.expandAlternation("a|b)")
    }
  }

  test("alternationHits: leftmost-first non-overlapping (RE2 semantics)") {
    // at a tied position the FIRST branch wins, scan resumes after it —
    // the probes DuckDB RE2 answered: 'ababc' ~ (ab|abc) -> 2 matches
    assert(TrigramIndex.alternationHits("ababc", Array("ab", "abc")) == 2L)
    assert(TrigramIndex.alternationHits("abcabc", Array("abc", "ab")) == 2L)
    assert(TrigramIndex.alternationHits("xxabcxx", Array("abc")) == 1L)
    assert(TrigramIndex.alternationHits("", Array("abc")) == 0L)
    assert(TrigramIndex.alternationHits("aaaa", Array("aa")) == 2L)
  }

  test("regexTopK: OR-of-branches candidates + verify ≡ brute scan") {
    import spark.implicits._
    val (gt, _) = builtTable()
    val patterns = Seq(("g1", "abc (def|ghi)"), ("g2", "(abc|def)"))
    val got = TrigramIndex.regexTopK(
        corpus.toDF("docno", "content"), gt, patterns, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    val brute = patterns.flatMap { case (qid, p) =>
      val lits = TrigramIndex.expandAlternation(p).toArray
      corpus.map { case (d, c) => (qid, d, TrigramIndex.alternationHits(c, lits)) }
        .filter(_._3 > 0)
        .sortBy { case (_, d, h) => (-h, d) }
        .zipWithIndex.map { case ((q, d, h), r) => (q, d, h, r.toLong) }
    }.sortBy(t => (t._1, t._4))
    assert(got.toSeq == brute)
    // d-02 posts all grams of both g1 branches but contains neither
    // contiguously — a candidate that must die in verification
    assert(!got.exists(t => t._1 == "g1" && t._2 == "d-02"))
  }

  test("grepSearch: lang filter + per-repo collapse over verified hits") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat_ws, lit}
    val rich = Seq(
      // (docno, repo, lang, content)
      ("g-1", "r1", "en", "abc def abc def"), // 2 hits, repo r1 winner
      ("g-2", "r1", "en", "abc def"),         // 1 hit, shadowed by g-1
      ("g-3", "r2", "en", "abc def"),         // repo r2 winner
      ("g-4", "r3", "de", "abc def abc def abc def"), // filtered out by lang
      ("g-5", "r3", "en", "nothing here"))
      .toDF("docno", "repo", "lang", "content")
    val dir = TestSpark.tmpDir("grepsearch")
    val gt = TrigramIndex.build(rich.select("docno", "content"), dir)
    val got = TrigramIndex.grepSearch(rich, gt,
        Seq(("q", "abc def")), k = 10, lang = Some("en"))
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._4)
    assert(got.toSeq == Seq(("g-1", "r1", 2L, 0L), ("g-3", "r2", 1L, 1L)))
    // no lang filter: the de doc wins its repo and the global top spot
    val all = TrigramIndex.grepSearch(rich, gt,
        Seq(("q", "abc def")), k = 10)
      .collect().map(r => (r.getString(1), r.getLong(4))).sortBy(_._2)
    assert(all.head._1 == "g-4")
  }

  test("fuzz: random corpora and needles match the brute scan") {
    import spark.implicits._
    val rnd = new Random(41)
    val alphabet = "ab ".toIndexedSeq
    val docs = (0 until 30).map { i =>
      val n = 3 + rnd.nextInt(20)
      (f"f-$i%02d", (0 until n).map(_ => alphabet(rnd.nextInt(3))).mkString)
    }
    val dir = TestSpark.tmpDir("trigram_fuzz")
    val gt = TrigramIndex.build(docs.toDF("docno", "content"), dir)
    val needles = Seq("aba", "ab a", "a b", "bbb").zipWithIndex
      .map { case (n, i) => (s"q$i", n) }
    val got = TrigramIndex.substringTopK(docs.toDF("docno", "content"), gt,
        needles, k = 50)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    def count(c: String, n: String): Long = {
      var i = 0; var h = 0L
      while ({ i = c.indexOf(n, i); i >= 0 }) { h += 1; i += n.length }
      h
    }
    val brute = needles.flatMap { case (q, n) =>
      docs.map { case (d, c) => (q, d, count(c, n)) }.filter(_._3 > 0)
    }.toSet
    assert(got == brute)
  }
}
