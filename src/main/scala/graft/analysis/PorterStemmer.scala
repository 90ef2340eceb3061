package graft.analysis

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3) 1980) including the author's two published
  * refinements (-bli→-ble for -abli→-able, and the -logi→-log rule) — i.e.
  * the same observable behavior as the classic reference implementations
  * Lucene's `PorterStemFilter` wraps (the stemmer the reference selects via
  * `stemmer: PorterStemFilter`, `TrecAnalyzer.java:78-103`,
  * `example/settings.hjson`). Pure Scala, implemented from the published
  * algorithm.
  *
  * Input is assumed already lowercased (the analyzer chain lowercases before
  * stemming, `TrecAnalyzer.java:72-73`).
  */
object PorterStemmer extends Stemmer {
  val name = "porter"

  def stem(word: String): String = {
    if (word.length <= 2) return word
    val s = new State(word.toCharArray)
    s.step1ab(); s.step1c(); s.step2(); s.step3(); s.step4(); s.step5()
    new String(s.b, 0, s.k + 1)
  }

  private final class State(val b: Array[Char]) {
    var k: Int = b.length - 1 // index of last char of current word
    var j: Int = 0            // index of last char of candidate stem

    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !cons(i - 1)
      case _ => true
    }

    /** m(): number of vowel-consonant sequences in b[0..j], i.e. the m of
      * the paper's [C](VC)^m[V] decomposition.
      */
    private def m(): Int = {
      var n = 0
      var i = 0
      var brk = false
      while (!brk) { // skip optional initial consonant run [C]
        if (i > j) return n
        if (!cons(i)) brk = true else i += 1
      }
      i += 1
      while (true) {
        brk = false
        while (!brk) { // vowel run
          if (i > j) return n
          if (cons(i)) brk = true else i += 1
        }
        i += 1
        n += 1
        brk = false
        while (!brk) { // consonant run
          if (i > j) return n
          if (!cons(i)) brk = true else i += 1
        }
        i += 1
      }
      n // unreachable
    }

    private def vowelInStem(): Boolean = {
      var i = 0
      while (i <= j) { if (!cons(i)) return true; i += 1 }
      false
    }

    private def doublec(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)

    /** cvc(i): b[i-2..i] is consonant-vowel-consonant and the final
      * consonant is not w, x or y (restores e after e.g. hop(p) → hope).
      */
    private def cvc(i: Int): Boolean = {
      if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) false
      else b(i) != 'w' && b(i) != 'x' && b(i) != 'y'
    }

    private def ends(s: String): Boolean = {
      val l = s.length
      val o = k - l + 1
      if (o < 0) return false
      var i = 0
      while (i < l) { if (b(o + i) != s.charAt(i)) return false; i += 1 }
      j = k - l
      true
    }

    private def setTo(s: String): Unit = {
      val l = s.length
      val o = j + 1
      var i = 0
      while (i < l) { b(o + i) = s.charAt(i); i += 1 }
      k = j + l
    }

    private def r(s: String): Unit = if (m() > 0) setTo(s)

    /** Step 1ab: plurals and -ed / -ing. */
    def step1ab(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setTo("i")
        else if (b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) { if (m() > 0) k -= 1 }
      else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setTo("ate")
        else if (ends("bl")) setTo("ble")
        else if (ends("iz")) setTo("ize")
        else if (doublec(k)) {
          k -= 1
          val ch = b(k)
          if (ch == 'l' || ch == 's' || ch == 'z') k += 1
        } else if (m() == 1 && cvc(k)) setTo("e")
      }
    }

    /** Step 1c: terminal y → i when there is another vowel in the stem. */
    def step1c(): Unit =
      if (ends("y") && vowelInStem()) b(k) = 'i'

    /** Step 2: double to single suffixes (requires m > 0). */
    def step2(): Unit = {
      if (k == 0) return
      b(k - 1) match {
        case 'a' =>
          if (ends("ational")) r("ate")
          else if (ends("tional")) r("tion")
        case 'c' =>
          if (ends("enci")) r("ence")
          else if (ends("anci")) r("ance")
        case 'e' =>
          if (ends("izer")) r("ize")
        case 'l' =>
          if (ends("bli")) r("ble")
          else if (ends("alli")) r("al")
          else if (ends("entli")) r("ent")
          else if (ends("eli")) r("e")
          else if (ends("ousli")) r("ous")
        case 'o' =>
          if (ends("ization")) r("ize")
          else if (ends("ation")) r("ate")
          else if (ends("ator")) r("ate")
        case 's' =>
          if (ends("alism")) r("al")
          else if (ends("iveness")) r("ive")
          else if (ends("fulness")) r("ful")
          else if (ends("ousness")) r("ous")
        case 't' =>
          if (ends("aliti")) r("al")
          else if (ends("iviti")) r("ive")
          else if (ends("biliti")) r("ble")
        case 'g' =>
          if (ends("logi")) r("log")
        case _ =>
      }
    }

    /** Step 3: -ic-, -full, -ness etc. (requires m > 0). */
    def step3(): Unit = b(k) match {
      case 'e' =>
        if (ends("icate")) r("ic")
        else if (ends("ative")) r("")
        else if (ends("alize")) r("al")
      case 'i' =>
        if (ends("iciti")) r("ic")
      case 'l' =>
        if (ends("ical")) r("ic")
        else if (ends("ful")) r("")
      case 's' =>
        if (ends("ness")) r("")
      case _ =>
    }

    /** Step 4: strip -ant, -ence etc. in context <c>vcvc<v> (m > 1). */
    def step4(): Unit = {
      if (k == 0) return
      val matched: Boolean = b(k - 1) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' => (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) || ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _ => false
      }
      if (matched && m() > 1) k = j
    }

    /** Step 5: remove final -e (5a) and double -l (5b) under m conditions. */
    def step5(): Unit = {
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      if (b(k) == 'l' && doublec(k) && m() > 1) k -= 1
    }
  }
}
