package graft.analysis

/** The English (Porter2) Snowball stemmer, implemented from the published
  * algorithm description (M.F. Porter, snowballstem.org "The English
  * stemming algorithm") — the same observable behavior as Lucene's
  * `SnowballFilter(new EnglishStemmer())`, which the reference selects via
  * `stemmer: SnowballFilter` (`TrecAnalyzer.java:78-91`; stemmer list
  * `NOTES.txt:45-48`). Pure Scala, no Snowball-generated code.
  *
  * Input is assumed already lowercased (the analyzer chain lowercases
  * before stemming, `TrecAnalyzer.java:72-73`).
  */
object SnowballStemmer extends Stemmer {
  val name = "snowball"

  // Rule tables are private[graft] so graft.SnowballSql (the generated
  // DuckDB oracle replay) reads the SAME data — engine and oracle cannot
  // drift.
  private[graft] val Exception1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    // invariants
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private[graft] val Exception2: Set[String] = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  // Ordered longest-match rule lists for steps 2-4 (order is semantic:
  // `find` takes the first matching suffix).
  private[graft] val Step2Rules: Seq[(String, String)] = Seq(
    "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
    "ousness" -> "ous", "iveness" -> "ive", "tional" -> "tion",
    "biliti" -> "ble", "lessli" -> "less", "entli" -> "ent",
    "ation" -> "ate", "alism" -> "al", "aliti" -> "al", "ousli" -> "ous",
    "iviti" -> "ive", "fulli" -> "ful", "enci" -> "ence",
    "anci" -> "ance", "abli" -> "able", "izer" -> "ize", "ator" -> "ate",
    "alli" -> "al", "bli" -> "ble")

  private[graft] val Step3Rules: Seq[(String, String)] = Seq(
    "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
    "icate" -> "ic", "iciti" -> "ic", "ical" -> "ic",
    "ness" -> "", "ful" -> "")

  private[graft] val Step4Sufs: Seq[String] = Seq(
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "al", "er", "ic")

  private val Doubles =
    Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val LiEnding = "cdeghkmnrt".toSet

  private def isVowel(c: Char): Boolean = c match {
    case 'a' | 'e' | 'i' | 'o' | 'u' | 'y' => true
    case _ => false
  }
  // 'Y' marks a consonant y; everything non-aeiouy is a consonant
  private def isV(c: Char): Boolean = isVowel(c) && c != 'Y'

  def stem(word0: String): String = {
    if (word0.length <= 2) return word0
    var w = if (word0.startsWith("'")) word0.substring(1) else word0
    Exception1.get(w) match {
      case Some(s) => return s
      case None =>
    }
    if (w.length <= 2) return w

    // mark consonant y's: initial y, or y after a vowel
    {
      val sb = new StringBuilder(w)
      var i = 0
      while (i < sb.length) {
        if (sb.charAt(i) == 'y' && (i == 0 || isV(sb.charAt(i - 1))))
          sb.setCharAt(i, 'Y')
        i += 1
      }
      w = sb.toString
    }

    // R1/R2 start offsets
    def regionAfterVC(s: String, from: Int): Int = {
      var i = from
      while (i < s.length && !isV(s.charAt(i))) i += 1 // to first vowel
      while (i < s.length && isV(s.charAt(i))) i += 1  // through vowel run
      // i is now at the first non-vowel after a vowel; region starts after it
      if (i >= s.length) s.length else i + 1
    }
    def r1Of(s: String): Int =
      if (s.startsWith("gener")) 5
      else if (s.startsWith("commun")) 6
      else if (s.startsWith("arsen")) 5
      else regionAfterVC(s, 0)
    def r2Of(s: String): Int = regionAfterVC(s, r1Of(s))

    def inR1(s: String, sufLen: Int): Boolean = s.length - sufLen >= r1Of(s)
    def inR2(s: String, sufLen: Int): Boolean = s.length - sufLen >= r2Of(s)

    // a short syllable: (vowel, non-vowel other than w/x/Y, preceded by a
    // non-vowel) or (vowel at position 0 followed by a non-vowel)
    def endsShortSyllable(s: String): Boolean = {
      val n = s.length
      if (n == 2) isV(s.charAt(0)) && !isV(s.charAt(1))
      else if (n >= 3) {
        val c = s.charAt(n - 1); val v = s.charAt(n - 2); val p = s.charAt(n - 3)
        isV(v) && !isV(c) && c != 'w' && c != 'x' && c != 'Y' && !isV(p)
      } else false
    }
    def isShortWord(s: String): Boolean =
      endsShortSyllable(s) && r1Of(s) >= s.length
    def hasVowel(s: String, until: Int): Boolean =
      (0 until until).exists(i => isV(s.charAt(i)))

    // Step 0: longest of ' / 's / 's'
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // Step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies")) {
      w = if (w.length - 3 > 1) w.dropRight(2) else w.dropRight(1)
    } else if (w.endsWith("us") || w.endsWith("ss")) ()
    else if (w.endsWith("s")) {
      // delete if the preceding part contains a vowel NOT immediately
      // before the s
      if (hasVowel(w, w.length - 2)) w = w.dropRight(1)
    }

    if (Exception2.contains(w)) return w.replace('Y', 'y')

    // Step 1b
    val eedly = w.endsWith("eedly"); val eed = w.endsWith("eed")
    if (eedly || eed) {
      val sufLen = if (eedly) 5 else 3
      if (inR1(w, sufLen)) w = w.dropRight(sufLen - 2) + "" // eed(ly) → ee
    } else {
      val suf =
        if (w.endsWith("ingly")) 5
        else if (w.endsWith("edly")) 4
        else if (w.endsWith("ing")) 3
        else if (w.endsWith("ed")) 2
        else 0
      if (suf > 0 && hasVowel(w, w.length - suf)) {
        w = w.dropRight(suf)
        if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
        else if (w.length >= 2 && Doubles.contains(w.takeRight(2))) w = w.dropRight(1)
        else if (isShortWord(w)) w += "e"
      }
    }

    // Step 1c: y/Y → i if preceded by a non-vowel which is not the first
    // letter of the word
    if (w.length > 2 && (w.endsWith("y") || w.endsWith("Y")) &&
        !isV(w.charAt(w.length - 2)))
      w = w.dropRight(1) + "i"

    // Step 2 (longest suffix, conditions in R1)
    {
      Step2Rules.find { case (s, _) => w.endsWith(s) } match {
        case Some((s, r)) => if (inR1(w, s.length)) w = w.dropRight(s.length) + r
        case None =>
          if (w.endsWith("ogi")) {
            if (inR1(w, 3) && w.length > 3 && w.charAt(w.length - 4) == 'l')
              w = w.dropRight(1)
          } else if (w.endsWith("li")) {
            if (inR1(w, 2) && w.length > 2 && LiEnding.contains(w.charAt(w.length - 3)))
              w = w.dropRight(2)
          }
      }
    }

    // Step 3 (longest suffix, conditions in R1; ative needs R2)
    {
      if (w.endsWith("ative")) {
        if (inR1(w, 5) && inR2(w, 5)) w = w.dropRight(5)
      } else Step3Rules.find { case (s, _) => w.endsWith(s) } match {
        case Some((s, r)) => if (inR1(w, s.length)) w = w.dropRight(s.length) + r
        case None =>
      }
    }

    // Step 4 (longest suffix, delete if in R2)
    {
      if (w.endsWith("ion")) {
        if (inR2(w, 3) && w.length > 3 &&
            (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't'))
          w = w.dropRight(3)
      } else Step4Sufs.find(w.endsWith) match {
        case Some(s) => if (inR2(w, s.length)) w = w.dropRight(s.length)
        case None =>
      }
    }

    // Step 5
    if (w.endsWith("e")) {
      if (inR2(w, 1)) w = w.dropRight(1)
      else if (inR1(w, 1) && !endsShortSyllable(w.dropRight(1))) w = w.dropRight(1)
    } else if (w.endsWith("l")) {
      if (inR2(w, 1) && w.length > 1 && w.charAt(w.length - 2) == 'l')
        w = w.dropRight(1)
    }

    w.replace('Y', 'y')
  }
}
