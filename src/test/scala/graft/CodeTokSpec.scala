package graft

import graft.analysis.CodeTokenizer
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** CodeTokenizer: the 3-char-window boundary scanner must be exactly the
  * regex chain the DuckDB oracle replays — four global boundary
  * insertions then a separator split. The chain's faithfulness rests on
  * the four rules being pairwise non-overlapping (an inserted space can
  * never create or destroy a later boundary); the fuzz battery proves
  * the equivalence over the full composition space.
  */
class CodeTokSpec extends AnyFunSuite {

  private def regexChain(s: String): Seq[String] =
    s.replaceAll("([a-z])([A-Z])", "$1 $2")
      .replaceAll("([A-Z])([A-Z][a-z])", "$1 $2")
      .replaceAll("([A-Za-z])([0-9])", "$1 $2")
      .replaceAll("([0-9])([A-Za-z])", "$1 $2")
      .split("[^A-Za-z0-9]+").toSeq.filter(_.nonEmpty)

  private def engine(s: String): Seq[String] =
    new CodeTokenizer().tokenize(s).toSeq

  test("fixtures: the canonical identifier shapes") {
    assert(engine("getHTTPResponse2xml_fooBar") ==
      Seq("get", "HTTP", "Response", "2", "xml", "foo", "Bar"))
    assert(engine("XMLHttpRequest") == Seq("XML", "Http", "Request"))
    assert(engine("snake_case_id") == Seq("snake", "case", "id"))
    assert(engine("__init__") == Seq("init"))
    assert(engine("Baz99qux v2Max a1b2") ==
      Seq("Baz", "99", "qux", "v", "2", "Max", "a", "1", "b", "2"))
    assert(engine("IOError") == Seq("IO", "Error"))
    assert(engine("ALLCAPS loweronly Capitalized x") ==
      Seq("ALLCAPS", "loweronly", "Capitalized", "x"))
    assert(engine("some.path/Name") == Seq("some", "path", "Name"))
    assert(engine("") == Nil)
    assert(engine("--- !! ---") == Nil)
  }

  test("fuzz: scanner ≡ the oracle's regex chain") {
    val alphabet = "abzABZ019_ .-/".toIndexedSeq
    val rnd = new Random(23)
    for (trial <- 0 until 6000) {
      val n = rnd.nextInt(24)
      val s = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
      assert(engine(s) == regexChain(s), s"trial $trial input=$s")
    }
  }

  test("registry resolves the code tokenizer by name and FQCN") {
    import graft.analysis.Tokenizer
    assert(Tokenizer.byName("code").tokenize("aB").toSeq == Seq("a", "B"))
    assert(Tokenizer.byName("graft.analysis.CodeTokenizer")
      .tokenize("aB").toSeq == Seq("a", "B"))
  }
}
