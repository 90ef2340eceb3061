package graft.analysis

/** Suffix-stripping stemmer strategy — the reference loads these by class
  * name (`TrecAnalyzer.java:78-103`; options listed in `NOTES.txt:45-48`):
  * Porter, Krovetz (dictionary-based; rule subset here — see [[KStemmer]]),
  * Snowball/Porter2 ([[SnowballStemmer]]) and the minimal English
  * S-stemmer. Default is none (`LTRSettings.java:23`).
  */
trait Stemmer extends Serializable {
  def name: String
  def stem(word: String): String
}

object NoStemmer extends Stemmer {
  val name = "none"
  def stem(word: String): String = word
}

/** Harman S-stemmer — observable behavior of Lucene's
  * `EnglishMinimalStemFilter` (published algorithm: strip plural -s with
  * the -ies→-y and -Ves guards).
  */
object MinimalEnglishStemmer extends Stemmer {
  val name = "minimal_english"
  def stem(w: String): String = {
    val len = w.length
    if (len < 3 || w.charAt(len - 1) != 's') return w
    w.charAt(len - 2) match {
      case 'u' | 's' => w
      case 'e' =>
        if (len > 3 && w.charAt(len - 3) == 'i' &&
            w.charAt(len - 4) != 'a' && w.charAt(len - 4) != 'e')
          w.substring(0, len - 3) + "y"
        else if (w.charAt(len - 3) == 'i' || w.charAt(len - 3) == 'a' ||
                 w.charAt(len - 3) == 'o' || w.charAt(len - 3) == 'e')
          w
        else w.substring(0, len - 1)
      case _ => w.substring(0, len - 1)
    }
  }
}

object Stemmer {
  /** All four reference stemmer names resolve (`TrecAnalyzer.java:78-103`,
    * list `NOTES.txt:45-48`), plus the no-op default.
    */
  def byName(name: String): Stemmer = name.toLowerCase match {
    case "none"                                          => NoStemmer
    case "porter" | "porterstemfilter"                   => PorterStemmer
    case "minimal" | "englishminimalstemfilter"          => MinimalEnglishStemmer
    case "snowball" | "snowballfilter" | "porter2"       => SnowballStemmer
    case "kstem" | "kstemfilter" | "krovetz"             => KStemmer
    // reflective FQCN fallback ≙ TrecAnalyzer.java:78-103 Class.forName
    case _ => Reflective.instance[Stemmer](name, "stemmer")
  }
}
