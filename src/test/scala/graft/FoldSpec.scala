package graft

import graft.analysis.{Analyzer, AnalyzerConfig, AsciiFold}
import org.scalatest.funsuite.AnyFunSuite

/** ASCII folding ([[analysis.AsciiFold]] ≙ ASCIIFoldingFilter on the
  * Latin-1 Supplement / Latin Extended-A subset) and its chain slot
  * (lowercase → fold → stop → stem).
  */
class FoldSpec extends AnyFunSuite {

  test("pure-ASCII input returns the same instance (fast path)") {
    val s = "plain ascii text_123"
    assert(AsciiFold.fold(s) eq s)
  }

  test("single-char and multi-char folds") {
    assert(AsciiFold.fold("café") == "cafe")
    assert(AsciiFold.fold("łódź") == "lodz")
    assert(AsciiFold.fold("straße") == "strasse")
    assert(AsciiFold.fold("cœur") == "coeur")
    assert(AsciiFold.fold("ĳs") == "ijs")
    assert(AsciiFold.fold("þorn") == "thorn")
    assert(AsciiFold.fold("ñandú") == "nandu")
  }

  test("unmapped non-ASCII passes through unchanged") {
    assert(AsciiFold.fold("δx") == "δx") // Greek is outside the table
  }

  test("chain: uppercase accents lowercase THEN fold; thé stops post-fold") {
    val an = new Analyzer(AnalyzerConfig(
      stopWords = Set("a", "the"), foldAscii = true))
    assert(an.analyze("Café NAÏVE Łódź").toSeq ==
      Seq("cafe", "naive", "lodz"))
    // "thé" folds to the stop word "the" and must vanish — fold runs
    // BEFORE the stop filter
    assert(an.analyze("thé word").toSeq == Seq("word"))
    // fold off: accents survive and thé is not stopped
    val plain = new Analyzer(AnalyzerConfig(stopWords = Set("a", "the")))
    assert(plain.analyze("thé café").toSeq == Seq("thé", "café"))
  }

  test("positions unaffected by folding; folded stop leaves a gap") {
    val an = new Analyzer(AnalyzerConfig(
      stopWords = Set("a", "the"), foldAscii = true))
    // "thé" occupies position 1 but is stopped → gap, like any stop word
    assert(an.analyzeWithPositions("café thé cœur").toSeq ==
      Seq(("cafe", 0), ("coeur", 2)))
  }

  test("single-table invariants: no ASCII keys, targets are ASCII") {
    (AsciiFold.Single.map(_._1) ++ AsciiFold.Multi.map(_._1)).foreach { c =>
      assert(c >= 0x80, s"fold key must be non-ASCII: $c")
    }
    AsciiFold.Single.foreach { case (_, to) => assert(to < 0x80) }
    AsciiFold.Multi.foreach { case (_, to) => assert(to.forall(_ < 0x80)) }
    // keys unique across both tables
    val keys = AsciiFold.Single.map(_._1) ++ AsciiFold.Multi.map(_._1)
    assert(keys.distinct.size == keys.size)
  }
}
