package graft

import graft.analysis.PorterStemmer
import org.scalatest.funsuite.AnyFunSuite

/** Fixtures hand-derived from the published algorithm (Porter 1980), using
  * the paper's own worked examples plus full-pipeline derivations.
  */
class PorterSpec extends AnyFunSuite {
  private val fixtures = Seq(
    // step 1a (paper examples)
    "caresses" -> "caress",
    "ponies" -> "poni",
    "ties" -> "ti",
    "caress" -> "caress",
    "cats" -> "cat",
    // step 1b
    "feed" -> "feed",
    "agreed" -> "agre", // eed→ee then... (see derivation note below)
    "plastered" -> "plaster",
    "bled" -> "bled",
    "motoring" -> "motor",
    "sing" -> "sing",
    "conflated" -> "conflat",
    "troubled" -> "troubl",
    "sized" -> "size",
    "hopping" -> "hop",
    "tanned" -> "tan",
    "falling" -> "fall",
    "hissing" -> "hiss",
    "fizzed" -> "fizz",
    "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi",
    "sky" -> "sky",
    // step 2 + downstream
    "relational" -> "relat",
    "conditional" -> "condit",
    "rational" -> "ration",
    "valenci" -> "valenc",
    "digitizer" -> "digit",
    "operator" -> "oper",
    "feudalism" -> "feudal",
    // step 3
    "hopeful" -> "hope",
    "goodness" -> "good",
    "formalize" -> "formal",
    "electrical" -> "electr",
    // step 4
    "adjustable" -> "adjust",
    "irritant" -> "irrit",
    "replacement" -> "replac",
    "adoption" -> "adopt",
    "effective" -> "effect",
    "activate" -> "activ",
    // step 5
    "probate" -> "probat",
    "rate" -> "rate",
    "cease" -> "ceas",
    "controlling" -> "control",
    "rolling" -> "roll",
    // guards
    "a" -> "a",
    "is" -> "is",
    "be" -> "be"
  )

  test("porter stemmer fixtures") {
    fixtures.foreach { case (in, want) =>
      assert(PorterStemmer.stem(in) == want, s"stem($in)")
    }
  }

  test("porter stemmer is idempotent-safe on already-stemmed short words") {
    // stems never grow and stemming is total (no exceptions) over a sweep
    val words = Seq("the", "of", "and", "query", "queries", "querying",
      "index", "indexes", "indexing", "indexed", "search", "searches",
      "searched", "searching", "relevance", "relevant")
    words.foreach { w =>
      val s = PorterStemmer.stem(w)
      assert(s.nonEmpty && s.length <= w.length)
    }
    // families collapse
    assert(PorterStemmer.stem("searching") == PorterStemmer.stem("searched"))
    assert(PorterStemmer.stem("indexing") == PorterStemmer.stem("indexed"))
  }
}
