package graft

import graft.analysis._
import org.scalatest.funsuite.AnyFunSuite

class AnalyzerSpec extends AnyFunSuite {

  private def analyzer(stop: Set[String] = Set.empty, stem: String = "none",
                       tok: String = "whitespace") =
    new Analyzer(AnalyzerConfig(tokenizer = tok, stopWords = stop, stemmer = stem))

  test("whitespace tokenizer splits on unicode whitespace, keeps punctuation") {
    val t = new WhitespaceTokenizer()
    assert(t.tokenize("This is some sample text.").toList ==
      List("This", "is", "some", "sample", "text."))
    assert(t.tokenize("  leading\t\ttabs\nand\r\nnewlines  ").toList ==
      List("leading", "tabs", "and", "newlines"))
    assert(t.tokenize("").toList == Nil)
    assert(t.tokenize("   ").toList == Nil)
    assert(t.tokenize("one").toList == List("one"))
    // non-breaking space U+00A0 is NOT Java whitespace — stays attached,
    // like Lucene's Character.isWhitespace-based tokenizer
    assert(t.tokenize("a b c").toList == List("a b", "c"))
  }

  test("whitespace tokenizer splits over-long tokens at 255 chars") {
    val long = "x" * 600
    val t = new WhitespaceTokenizer()
    assert(t.tokenize(long).toList == List("x" * 255, "x" * 255, "x" * 90))
  }

  test("classic discards leave position gaps that compose with stop gaps") {
    val long = "Y" * 300
    val a = analyzer(stop = Set("the"), tok = "classic")
    // positions: cat=0, [the stopped @1], [Y*300 discarded @2], mat=3
    assert(a.analyzeWithPositions(s"cat the $long mat").toList ==
      List(("cat", 0), ("mat", 3)))
    // dl counts emitted terms only — neither stopped nor discarded tokens
    val (tfs, dl) = a.termFreqsWithPositions(s"cat the $long mat")
    assert(dl == 2 && tfs.map(t => (t._1, t._3.toList)).toList ==
      List(("cat", List(0)), ("mat", List(3))))
  }

  test("lowercase is applied before stopping (stop list is case-insensitive on input)") {
    val a = analyzer(stop = Set("the", "a"))
    assert(a.analyze("The THE a A tHe dog").toList == List("dog"))
  }

  test("stopword filter drops tokens, reducing doc length (norm semantics)") {
    val a = analyzer(stop = Set("a", "the"))
    val (tfs, dl) = a.termFreqs("the cat sat on a mat the end")
    assert(dl == 5) // cat sat on mat end
    assert(tfs.toMap == Map("cat" -> 1, "sat" -> 1, "on" -> 1, "mat" -> 1, "end" -> 1))
  }

  test("stemming applies after stop filtering") {
    val a = analyzer(stop = Set("running"), stem = "porter")
    // "running" is stopped before stemming would turn it into "run"
    assert(a.analyze("running jumps").toList == List("jump"))
  }

  test("term frequencies count duplicates within a doc") {
    val a = analyzer()
    val (tfs, dl) = a.termFreqs("cat cat dog Cat")
    assert(dl == 4)
    assert(tfs.toMap == Map("cat" -> 3, "dog" -> 1))
  }

  test("empty and null-ish inputs") {
    val a = analyzer()
    assert(a.analyze("").isEmpty)
    assert(a.analyze(null).isEmpty)
    assert(a.termFreqs("")._2 == 0)
  }

  test("minimal english stemmer (Harman S-stemmer) fixtures") {
    val s = MinimalEnglishStemmer
    assert(s.stem("cats") == "cat")
    assert(s.stem("queries") == "query")
    assert(s.stem("ponies") == "pony")
    assert(s.stem("caress") == "caress") // -ss kept
    assert(s.stem("corpus") == "corpus") // -us kept
    assert(s.stem("is") == "is")         // too short
    assert(s.stem("goes") == "goes")     // e preceded by o
    assert(s.stem("tables") == "table")
  }

  test("classic-like tokenizer keeps emails, hosts, acronyms, apostrophes") {
    val t = new ClassicLikeTokenizer()
    assert(t.tokenize("mail bob.smith@example.com today").toList ==
      List("mail", "bob.smith@example.com", "today"))
    assert(t.tokenize("bob@example.com").toList == List("bob@example.com"))
    assert(t.tokenize("visit www.example.com now").toList ==
      List("visit", "www.example.com", "now"))
    assert(t.tokenize("the U.S.A. flag").toList == List("the", "U.S.A.", "flag"))
    assert(t.tokenize("O'Neil's car").toList == List("O'Neil's", "car"))
    assert(t.tokenize("foo-bar baz_qux").toList == List("foo", "bar", "baz", "qux"))
    assert(t.tokenize("semi;colon, comma. done!").toList ==
      List("semi", "colon", "comma", "done"))
  }

  test("classic-like tokenizer keeps JFlex NUM forms intact") {
    val t = new ClassicLikeTokenizer()
    // the Lucene Classic grammar's documented number cases
    assert(t.tokenize("paid 1,000 dollars").toList == List("paid", "1,000", "dollars"))
    assert(t.tokenize("serial 2-3-4 ok").toList == List("serial", "2-3-4", "ok"))
    assert(t.tokenize("part a-1-b here").toList == List("part", "a-1-b", "here"))
    assert(t.tokenize("R2D2 c3po").toList == List("R2D2", "c3po"))
    assert(t.tokenize("version 1.2,3").toList == List("version", "1.2,3"))
    assert(t.tokenize("ref 12_34/56").toList == List("ref", "12_34/56"))
    // digit-free separators still split (NUM needs a digit every other seg)
    assert(t.tokenize("foo-bar a-b-1").toList == List("foo", "bar", "a", "b-1"))
    // trailing punctuation never joins
    assert(t.tokenize("1,000, then").toList == List("1,000", "then"))
  }

  test("stop list parsing is a whitespace token scan") {
    assert(Analyzer.parseStopWords("a\nthe\tthat  ") == Set("a", "the", "that"))
    assert(Analyzer.parseStopWords("") == Set.empty)
  }
}
