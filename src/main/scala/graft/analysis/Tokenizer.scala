package graft.analysis

/** Splits field text into raw tokens. The reference plugs tokenizers in by
  * class name (`TrecAnalyzer.java:55-70`), defaulting to whitespace
  * (`LTRSettings.java:20`); we mirror that as a small serializable strategy
  * used inside Dataset transformations.
  */
trait Tokenizer extends Serializable {
  def name: String
  def tokenize(text: String): Iterator[String]

  /** (token, positionIncrement) pairs — Lucene TokenStream semantics: the
    * increment is 1 plus the number of source positions discarded since
    * the previous emitted token (`ClassicTokenizer.incrementToken`'s
    * `skippedPositions + 1`). Default covers tokenizers that never discard
    * a token, where every increment is 1.
    */
  def tokenizeWithIncrements(text: String): Iterator[(String, Int)] =
    tokenize(text).map((_, 1))
}

/** Whitespace tokenization: maximal runs of non-whitespace characters
  * (Unicode `Character.isWhitespace`), with over-long tokens split at
  * `maxTokenLen` chars — the observable behavior of Lucene's
  * `WhitespaceTokenizer` the reference defaults to.
  */
final class WhitespaceTokenizer(maxTokenLen: Int = 255) extends Tokenizer {
  val name = "whitespace"
  def tokenize(text: String): Iterator[String] = new Iterator[String] {
    private var i = 0
    private val n = text.length
    private def skipWs(): Unit = { while (i < n && Character.isWhitespace(text.charAt(i))) i += 1 }
    skipWs()
    def hasNext: Boolean = i < n
    def next(): String = {
      val start = i
      var len = 0
      while (i < n && len < maxTokenLen && !Character.isWhitespace(text.charAt(i))) { i += 1; len += 1 }
      val tok = text.substring(start, i)
      skipWs()
      tok
    }
  }
}

/** Re-implementation of Lucene's `ClassicTokenizer` (the JFlex grammar in
  * `ClassicTokenizerImpl.jflex` behind the reference's
  * `tokenizer: ClassicTokenizer` option, `TrecAnalyzer.java:57-59`): words,
  * NUM forms (numbers with internal `,./-_` punctuation — "1,000",
  * serials), apostrophe forms, acronyms, emails, hosts and company names
  * survive as single tokens; CJ codepoints tokenize one char at a time
  * (the grammar's CJ rule); tokens whose raw match is longer than
  * `maxTokenLen` chars are DISCARDED, not split (ClassicTokenizer's
  * `yylength() <= maxTokenLength` skip — unlike WhitespaceTokenizer's
  * chunking).
  *
  * The scanner is a hand-rolled maximal-munch engine ([[ClassicScan]]):
  * at each position every grammar rule advances as a parallel state
  * machine and the LONGEST accepting prefix wins, ties broken by the
  * grammar's rule listing order — exactly the JFlex scanner discipline.
  * This erases the three behavioral deviations the previous ordered-
  * alternation implementation documented:
  *  - leftmost-longest across rules ("a.b2.c.d" is one HOST token);
  *  - NUM is the grammar's exact six-alternative union, strict digit
  *    parity included ("a.b1-0.cd" → "a.b1-0" + "cd", not one token);
  *  - the deprecated ACRONYM_DEP rule is present ("wow.com." consumes
  *    the trailing dot and emits "wow.com", Lucene's post-match trim).
  * Character classes are faithful too: LETTER = `[:letter:]` minus CJ
  * minus KOREAN, with KOREAN re-included in ALPHANUM only — so Hangul
  * words stay whole but never participate in ALPHA-only forms
  * (apostrophe/acronym/company), matching the grammar's macros.
  *
  * Discarded over-long tokens leave a position GAP: the next emitted
  * token's positionIncrement is 1 + the number of discards since the
  * previous emission, exactly `ClassicTokenizer.incrementToken`'s
  * `skippedPositions + 1`. (Skips trailing the LAST emitted token are
  * observable in Lucene only through `end()`'s final increment — a
  * multi-valued-field gap this single-valued data model has no seam for.)
  *
  * Zero-deviation parity is fuzz-proved in ClassicFuzzSpec against a
  * brute-force longest-prefix scanner built straight from the published
  * grammar; fixtures in AnalyzerSpec lock the canonical forms.
  */
final class ClassicLikeTokenizer(maxTokenLen: Int) extends Tokenizer {
  def this() = this(255) // no-arg ctor: the FQCN reflective seam needs it
  val name = "classic"
  def tokenize(text: String): Iterator[String] =
    tokenizeWithIncrements(text).map(_._1)
  override def tokenizeWithIncrements(text: String): Iterator[(String, Int)] =
    new Iterator[(String, Int)] {
      private var i = 0
      private val n = text.length
      private var tok: String = null
      private var inc = 1
      private def advance(): Unit = {
        tok = null
        inc = 1
        while (tok == null && i < n) {
          val cp = text.codePointAt(i)
          if (ClassicScan.isCJ(cp)) {
            val w = Character.charCount(cp)
            tok = text.substring(i, i + w)
            i += w
          } else if (ClassicScan.isAlnum(cp)) {
            val lm = ClassicScan.longestMatch(text, i)
            val end = (lm >>> 3).toInt
            val rule = (lm & 7).toInt
            val rawLen = end - i
            val t =
              if (rule == ClassicScan.RAcronymDep) text.substring(i, end - 1)
              else text.substring(i, end)
            i = end
            // the length gate is on the RAW match (yylength), before the
            // ACRONYM_DEP dot-trim, like ClassicTokenizer.incrementToken
            if (rawLen <= maxTokenLen) tok = t
            else inc += 1 // skippedPositions++
          } else i += Character.charCount(cp)
        }
      }
      advance()
      def hasNext: Boolean = tok != null
      def next(): (String, Int) = { val t = (tok, inc); advance(); t }
    }
}

/** The maximal-munch scanner behind [[ClassicLikeTokenizer]]: the eight
  * non-CJ grammar rules of `ClassicTokenizerImpl.jflex` run as parallel
  * constant-space state machines over one forward pass; the longest
  * accepting prefix wins, ties broken by rule listing order (ALPHANUM,
  * APOSTROPHE, ACRONYM, COMPANY, EMAIL, HOST, NUM, ACRONYM_DEP — the only
  * visible tie is ACRONYM vs ACRONYM_DEP, where ACRONYM's keep-the-dots
  * action must win, e.g. "a.b.c."). No allocation, no regex: one branchy
  * loop, ~equally fast on ASCII and non-ASCII input.
  */
private[graft] object ClassicScan {
  final val RAlphanum = 0
  final val RApostrophe = 1
  final val RAcronym = 2
  final val RCompany = 3
  final val REmail = 4
  final val RHost = 5
  final val RNum = 6
  final val RAcronymDep = 7

  // The grammar's CJ ranges (ClassicTokenizerImpl.jflex): kana, bopomofo,
  // CJK ideographs/compat/halfwidth forms — one token per codepoint.
  // 0x3040-0x309f + 0x30a0-0x30ff + 0x3100-0x312f coalesce to one range.
  def isCJ(cp: Int): Boolean =
    (cp >= 0x3040 && cp <= 0x312f) || (cp >= 0x31f0 && cp <= 0x31ff) ||
    (cp >= 0x3300 && cp <= 0x337f) || (cp >= 0x3400 && cp <= 0x4dbf) ||
    (cp >= 0x4e00 && cp <= 0x9fff) || (cp >= 0xf900 && cp <= 0xfaff) ||
    (cp >= 0xff65 && cp <= 0xff9f)

  // KOREAN macro: Hangul syllables + jamo; in ALPHANUM but NOT in LETTER
  def isKorean(cp: Int): Boolean =
    (cp >= 0xac00 && cp <= 0xd7af) || (cp >= 0x1100 && cp <= 0x11ff)

  // LETTER = [:letter:] minus CJ minus KOREAN
  def isLetter(cp: Int): Boolean =
    Character.isLetter(cp) && !isCJ(cp) && !isKorean(cp)

  def isDigit(cp: Int): Boolean = Character.isDigit(cp) // \p{Nd}

  def isAlnum(cp: Int): Boolean =
    isLetter(cp) || isDigit(cp) || isKorean(cp)

  /** Longest match over the eight rules starting at `start`, which must
    * index an alphanumeric codepoint (so ALPHANUM accepts at least one
    * codepoint and a match always exists). Returns `(endExclusive << 3) |
    * ruleId`. NUM acceptance tracks the six-alternative union exactly: a
    * P-joined segment run of length ≥ 2 matches iff some parity class
    * (all odd-indexed or all even-indexed segments) is fully digit-
    * bearing, with the current partial segment's digits-so-far standing
    * in for its completion.
    */
  def longestMatch(text: String, start: Int): Long = {
    val n = text.length
    var bestEnd = -1
    var bestRule = 0
    // per-rule states; -1 = dead
    var sAl = 0 // ALPHANUM: 0 in run
    var sAp = 0 // APOSTROPHE: 0 seg0, 1 after quote, 2 seg k>=1
    var sAc = 0 // ACRONYM: 0 want L, 1 want dot1, 2 want L, 3 want dot, 4 got dot k>=2
    var sCo = 0 // COMPANY: 0 seg0, 1 after joint, 2 seg1
    var sEm = 0 // EMAIL: 0 local, 1 after local joiner, 2 after @, 3 dom0, 4 after dom joiner, 5 dom k>=1
    var sHo = 0 // HOST: 0 seg0, 1 after dot, 2 seg k>=1
    var sDp = 0 // ACRONYM_DEP: 0 seg0, 1 dot1, 2 seg k, 3 dot k>=2
    var numAlive = true
    var numInSeg = true
    var numSegIdx = 0
    var numCurDigit = false
    var numOddOk = true
    var numEvenOk = true
    var j = start
    var anyAlive = true
    while (anyAlive && j < n) {
      val c = text.charAt(j)
      val cp =
        if (Character.isHighSurrogate(c) && j + 1 < n) text.codePointAt(j)
        else c.toInt
      val end = j + Character.charCount(cp)
      val l = isLetter(cp)
      val d = !l && isDigit(cp)
      val an = l || d || isKorean(cp)
      val dot = cp == '.'
      val pch = dot || cp == '_' || cp == '-' || cp == '/' || cp == ','

      // ALPHANUM
      if (sAl == 0) {
        if (an) { if (end > bestEnd) { bestEnd = end; bestRule = RAlphanum } }
        else sAl = -1
      }
      // APOSTROPHE — ALPHA-only segments joined by single quotes
      if (sAp == 0) { if (l) () else if (cp == '\'') sAp = 1 else sAp = -1 }
      else if (sAp == 1) {
        if (l) {
          sAp = 2
          if (end > bestEnd) { bestEnd = end; bestRule = RApostrophe }
        } else sAp = -1
      }
      else if (sAp == 2) {
        if (l) { if (end > bestEnd) { bestEnd = end; bestRule = RApostrophe } }
        else if (cp == '\'') sAp = 1
        else sAp = -1
      }
      // ACRONYM — single letters, accepts ON each dot from the 2nd on
      if (sAc == 0) { if (l) sAc = 1 else sAc = -1 }
      else if (sAc == 1) { if (dot) sAc = 2 else sAc = -1 }
      else if (sAc == 2) { if (l) sAc = 3 else sAc = -1 }
      else if (sAc == 3) {
        if (dot) {
          sAc = 4
          if (end > bestEnd) { bestEnd = end; bestRule = RAcronym }
        } else sAc = -1
      }
      else if (sAc == 4) { if (l) sAc = 3 else sAc = -1 }
      // COMPANY — exactly one & or @ joint between ALPHA runs
      if (sCo == 0) { if (l) () else if (cp == '&' || cp == '@') sCo = 1 else sCo = -1 }
      else if (sCo == 1) {
        if (l) {
          sCo = 2
          if (end > bestEnd) { bestEnd = end; bestRule = RCompany }
        } else sCo = -1
      }
      else if (sCo == 2) {
        if (l) { if (end > bestEnd) { bestEnd = end; bestRule = RCompany } }
        else sCo = -1
      }
      // EMAIL
      if (sEm == 0) {
        if (an) ()
        else if (dot || cp == '_' || cp == '-') sEm = 1
        else if (cp == '@') sEm = 2
        else sEm = -1
      }
      else if (sEm == 1) { if (an) sEm = 0 else sEm = -1 }
      else if (sEm == 2) { if (an) sEm = 3 else sEm = -1 }
      else if (sEm == 3) {
        if (an) () else if (dot || cp == '-') sEm = 4 else sEm = -1
      }
      else if (sEm == 4) {
        if (an) {
          sEm = 5
          if (end > bestEnd) { bestEnd = end; bestRule = REmail }
        } else sEm = -1
      }
      else if (sEm == 5) {
        if (an) { if (end > bestEnd) { bestEnd = end; bestRule = REmail } }
        else if (dot || cp == '-') sEm = 4
        else sEm = -1
      }
      // HOST
      if (sHo == 0) { if (an) () else if (dot) sHo = 1 else sHo = -1 }
      else if (sHo == 1) {
        if (an) {
          sHo = 2
          if (end > bestEnd) { bestEnd = end; bestRule = RHost }
        } else sHo = -1
      }
      else if (sHo == 2) {
        if (an) { if (end > bestEnd) { bestEnd = end; bestRule = RHost } }
        else if (dot) sHo = 1
        else sHo = -1
      }
      // NUM — exact six-alternative union via parity feasibility
      if (numAlive) {
        if (numInSeg) {
          if (an) {
            if (d) numCurDigit = true
            if (numSegIdx >= 1) {
              val accOdd = numOddOk && ((numSegIdx & 1) == 0 || numCurDigit)
              val accEven = numEvenOk && ((numSegIdx & 1) == 1 || numCurDigit)
              if ((accOdd || accEven) && end > bestEnd) {
                bestEnd = end; bestRule = RNum
              }
            }
          } else if (pch) {
            if ((numSegIdx & 1) == 1) numOddOk &&= numCurDigit
            else numEvenOk &&= numCurDigit
            if (!numOddOk && !numEvenOk) numAlive = false
            else { numInSeg = false; numCurDigit = false }
          } else numAlive = false
        } else {
          if (an) {
            numInSeg = true
            numSegIdx += 1
            numCurDigit = d
            val accOdd = numOddOk && ((numSegIdx & 1) == 0 || numCurDigit)
            val accEven = numEvenOk && ((numSegIdx & 1) == 1 || numCurDigit)
            if ((accOdd || accEven) && end > bestEnd) {
              bestEnd = end; bestRule = RNum
            }
          } else numAlive = false
        }
      }
      // ACRONYM_DEP — alnum dotted run WITH trailing dot; listed last, so
      // it only wins strictly-longer (the ACRONYM tie goes to ACRONYM)
      if (sDp == 0) { if (an) () else if (dot) sDp = 1 else sDp = -1 }
      else if (sDp == 1) { if (an) sDp = 2 else sDp = -1 }
      else if (sDp == 2) {
        if (an) ()
        else if (dot) {
          sDp = 3
          if (end > bestEnd) { bestEnd = end; bestRule = RAcronymDep }
        } else sDp = -1
      }
      else if (sDp == 3) { if (an) sDp = 2 else sDp = -1 }

      anyAlive = sAl == 0 || sAp >= 0 || sAc >= 0 || sCo >= 0 ||
        sEm >= 0 || sHo >= 0 || numAlive || sDp >= 0
      j = end
    }
    (bestEnd.toLong << 3) | bestRule.toLong
  }
}

object ClassicLikeTokenizer {
  /** Per-rule anchored regex sources for the DuckDB oracle's exact
    * longest-match replay (SparkEntry's recursive-CTE scanner computes
    * each rule's anchored match length at the cursor and takes the max —
    * the same discipline as [[ClassicScan]], so the oracle cannot drift).
    * Parameterized over the LETTER/DIGIT/ALPHANUM classes (the oracle
    * passes ASCII classes; the corpus is verified pure ASCII). Anchored
    * GREEDY matching of each individual rule equals that rule's longest
    * match — fuzz-proved in ClassicFuzzSpec — which is what makes the
    * per-rule max a faithful longest-match scanner in RE2. NUM is split
    * into two strict-phase closed forms (digits at all odd / all even
    * segment indices) whose pointwise max equals the grammar's six-
    * alternative union; the naive factored form is a strict superset and
    * is NOT used.
    */
  final case class Rules(email: String, acronym: String, acronymDep: String,
                         numOdd: String, numEven: String, host: String,
                         company: String, apostrophe: String, alphanum: String) {
    /** In the grammar's listing order (ALPHANUM, APOSTROPHE, ACRONYM,
      * COMPANY, EMAIL, HOST, NUM-odd, NUM-even, ACRONYM_DEP last).
      */
    def ordered: Seq[String] =
      Seq(alphanum, apostrophe, acronym, company, email, host,
        numOdd, numEven, acronymDep)
  }
  private[graft] def rules(l: String, d: String, an: String): Rules = {
    val hd = s"$an*$d$an*"
    val p = """[_\-/.,]"""
    Rules(
      email = s"$an+(?:[._\\-]$an+)*@$an+(?:[.\\-]$an+)+",
      acronym = s"$l\\.(?:$l\\.)+",
      acronymDep = s"$an+\\.(?:$an+\\.)+",
      numOdd = s"$an+(?:$p$hd$p$an+)*$p$hd(?:$p$an+)?",
      numEven = s"$hd(?:$p$an+$p$hd)*$p$an+(?:$p$hd)?",
      host = s"$an+(?:\\.$an+)+",
      company = s"$l+[&@]$l+",
      apostrophe = s"$l+(?:'$l+)+",
      alphanum = s"$an+")
  }
}

object Tokenizer {
  /** Registry mirroring the reference's by-name tokenizer selection, with a
    * reflective FQCN fallback (≙ `TrecAnalyzer.java:63-70` Class.forName):
    * any class on the classpath implementing [[Tokenizer]] with a no-arg
    * constructor loads by its fully-qualified name.
    */
  def byName(name: String): Tokenizer = name.toLowerCase match {
    case "whitespace" | "whitespacetokenizer" => new WhitespaceTokenizer()
    case "classic" | "classictokenizer"       => new ClassicLikeTokenizer()
    case "code" | "codetokenizer"             => new CodeTokenizer()
    case _ => Reflective.instance[Tokenizer](name, "tokenizer")
  }
}

/** Shared Class.forName loader for the three extension seams — the engine
  * analog of the reference's reflective plugin loading
  * (`TrecAnalyzer.java:63-70,78-103`, `BatchSearch.java:155-158`).
  */
private[graft] object Reflective {
  def instance[T](name: String, kind: String)(implicit ct: scala.reflect.ClassTag[T]): T =
    try {
      val cls = Class.forName(name)
      val obj =
        try cls.getField("MODULE$").get(null) // Scala object
        catch { case _: NoSuchFieldException =>
          cls.getDeclaredConstructor().newInstance()
        }
      ct.runtimeClass.cast(obj).asInstanceOf[T]
    } catch {
      case e: ClassNotFoundException =>
        throw new IllegalArgumentException(s"unknown $kind: $name", e)
      case e: ClassCastException =>
        throw new IllegalArgumentException(
          s"$kind class $name does not implement ${ct.runtimeClass.getName}", e)
    }
}
