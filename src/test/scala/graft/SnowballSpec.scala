package graft

import graft.analysis.{KStemmer, SnowballStemmer, Stemmer}
import org.scalatest.funsuite.AnyFunSuite

/** Porter2/Snowball fixtures hand-traced from the published algorithm
  * (exception lists, R1/R2 regions, short-syllable rule), plus registry
  * coverage of all four reference stemmer names.
  */
class SnowballSpec extends AnyFunSuite {
  private def s(w: String) = SnowballStemmer.stem(w)

  test("exception lists") {
    assert(s("skis") == "ski")
    assert(s("skies") == "sky")
    assert(s("dying") == "die")
    assert(s("idly") == "idl")
    assert(s("gently") == "gentl")
    assert(s("news") == "news")
    assert(s("sky") == "sky")
    assert(s("atlas") == "atlas")
    // exception2 (post step-1a stop words)
    assert(s("exceed") == "exceed")
    assert(s("inning") == "inning")
    assert(s("proceed") == "proceed")
  }

  test("step 0/1a: possessives and plural forms") {
    assert(s("dog's") == "dog")
    assert(s("ties") == "tie")
    assert(s("cries") == "cri")
    assert(s("gas") == "gas")     // no vowel before the pre-s position
    assert(s("gaps") == "gap")
    assert(s("kiwis") == "kiwi")
    assert(s("glass") == "glass") // ss untouched
  }

  test("step 1b: ed/ing with double-undo, e-restore, short-word rule") {
    assert(s("running") == "run")    // nn double removed
    assert(s("hopping") == "hop")
    assert(s("hoping") == "hope")    // short word → +e
    assert(s("conflated") == "conflat") // at→ate, then step-5 e drop in R2
    assert(s("agreed") == "agre")    // eed→ee in R1, final e dropped (R1, non-short)
    assert(s("sized") == "size")     // iz→ize, e kept (not in R2, short stem)
  }

  test("step 1c: y→i after a non-initial consonant") {
    assert(s("happy") == "happi")
    assert(s("cry") == "cri")
    assert(s("by") == "by")
    assert(s("say") == "say")
  }

  test("steps 2-5: derivational chains") {
    assert(s("vietnamization") == "vietnam") // ization→ize, ize dropped in R2
    assert(s("predication") == "predic")     // ation→ate, icate→ic
    assert(s("congratulations") == "congratul")
    assert(s("generously") == "generous")    // gener- R1 prefix rule
    assert(s("cheerfully") == "cheer")       // fulli→ful, ful→∅
    assert(s("knightly") == "knight")        // li after valid li-ending
    assert(s("generate") == "generat")
    assert(s("cement") == "cement")          // ement matched, not in R2 → no shorter try
  }

  test("registry resolves all four reference stemmer names") {
    assert(Stemmer.byName("PorterStemFilter").name == "porter")
    assert(Stemmer.byName("KStemFilter").name == "kstem")
    assert(Stemmer.byName("SnowballFilter").name == "snowball")
    assert(Stemmer.byName("EnglishMinimalStemFilter").name == "minimal_english")
    assert(Stemmer.byName("none").name == "none")
  }

  test("reflective FQCN fallback loads plugin classes like the reference") {
    import graft.analysis.Tokenizer
    // Scala object by its $ class name (≙ Class.forName in TrecAnalyzer)
    assert(Stemmer.byName("graft.analysis.PorterStemmer$").name == "porter")
    // plain class with a no-arg constructor
    assert(Tokenizer.byName("graft.analysis.ClassicLikeTokenizer").name == "classic")
    assert(graft.search.Scorer.byName("graft.search.Bm25Scorer$").name == "bm25")
    intercept[IllegalArgumentException](Stemmer.byName("no.such.Class"))
    // wrong trait → rejected, not a runtime surprise later
    intercept[IllegalArgumentException](
      Stemmer.byName("graft.analysis.ClassicLikeTokenizer"))
  }

  test("kstem: inflectional rules with embedded-lexicon guards") {
    assert(KStemmer.stem("tables") == "table")
    assert(KStemmer.stem("queries") == "query")
    assert(KStemmer.stem("joined") == "join")
    assert(KStemmer.stem("merging") == "merge")   // e-restore via lexicon
    assert(KStemmer.stem("running") == "run")     // double undo
    assert(KStemmer.stem("news") == "news")       // lexicon invariant
    assert(KStemmer.stem("this") == "this")
    assert(KStemmer.stem("string") == "string")   // lexicon guard on -ing
  }
}
