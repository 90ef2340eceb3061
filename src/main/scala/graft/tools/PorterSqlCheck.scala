package graft.tools

import graft.PorterSql
import graft.analysis.PorterStemmer

/** Dumps a validation corpus for the generated SQL Porter stemmer
  * ([[graft.PorterSql]]): a battery of suffix forms + y-edge cases +
  * the corpus vocabulary, each with the Scala stemmer's output, plus the
  * SQL that DuckDB should run to reproduce it. `scripts/porter_sql_check`
  * executes the compare (word-for-word equality).
  */
object PorterSqlCheck {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/porter_check")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    val bases = Seq(
      "relate", "conflate", "troubl", "siz", "hopp", "hop", "tann", "fall",
      "fail", "fil", "feed", "agree", "plaster", "bled", "motor", "sing",
      "controll", "roll", "happy", "sky", "cry", "say", "enjoy", "syzygy",
      "relational", "conditional", "rational", "valenci", "hesitanci",
      "digitizer", "conformabli", "radicalli", "differentli", "vileli",
      "analogousli", "vietnamization", "predication", "operator",
      "feudalism", "decisiveness", "hopefulness", "callousness",
      "formaliti", "sensitiviti", "sensibiliti", "triplicate", "formative",
      "formalize", "electriciti", "electrical", "hopeful", "goodness",
      "revival", "allowance", "inference", "airliner", "gyroscopic",
      "adjustable", "defensible", "irritant", "replacement", "adjustment",
      "dependent", "adoption", "homologou", "communism", "activate",
      "angulariti", "homologous", "effective", "bowdlerize", "probate",
      "rate", "cease", "control", "roll", "oscillate", "generalization",
      "organization", "organize", "doom", "boom", "room", "need", "ski",
      "die", "lie", "tie", "index", "matrix", "query", "tables", "archive",
      "archives", "caresses", "ponies", "ties", "caress", "cats", "feed",
      "agreed", "plastered", "motoring", "sings", "conflated", "troubled",
      "sized", "hopping", "tanned", "falling", "hissing", "fizzed",
      "failing", "filing", "happy", "abilli", "yyyy", "vy", "cyyyyyyyyyyyyy")
    val suffixes = Seq(
      "", "s", "es", "ies", "sses", "ss", "ed", "eed", "ing", "y",
      "ational", "tional", "enci", "anci", "izer", "bli", "alli", "entli",
      "eli", "ousli", "ization", "ation", "ator", "alism", "iveness",
      "fulness", "ousness", "aliti", "iviti", "biliti", "logi",
      "icate", "ative", "alize", "iciti", "ical", "ful", "ness",
      "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
      "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive",
      "ize", "e", "ll", "l")
    val words = (bases ++ (for (b <- bases; s <- suffixes) yield b + s))
      .filter(_.nonEmpty).distinct.sorted

    val tsv = words.map(w => s"$w\t${PorterStemmer.stem(w)}").mkString("\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/words.tsv"), tsv)
    val sql =
      s"""WITH raw AS (
         |  SELECT column0 AS term FROM read_csv('$outDir/words.tsv',
         |    delim = '\t', header = false, columns = {'column0': 'VARCHAR', 'column1': 'VARCHAR'})
         |),
         |pwords AS (SELECT DISTINCT term FROM raw),
         |${PorterSql.ctes}
         |SELECT term, stem FROM porter ORDER BY term""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/porter.sql"), sql)
    println(s"wrote ${words.size} words to $outDir")
  }
}
