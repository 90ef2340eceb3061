package graft.tools

import graft.SnowballSql
import graft.analysis.SnowballStemmer

/** Dumps a validation corpus for the generated SQL Snowball/Porter2 stemmer
  * ([[graft.SnowballSql]]): a battery of suffix forms, the algorithm's own
  * exception words, y-marking edge cases and apostrophe forms, each with
  * the Scala stemmer's output, plus the SQL DuckDB should run to reproduce
  * it. `scripts/snowball_sql_check` executes the word-for-word compare.
  */
object SnowballSqlCheck {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/snowball_check")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    val bases = Seq(
      // exception words + near-misses
      "skis", "skies", "dying", "lying", "tying", "idly", "gently", "ugly",
      "early", "only", "singly", "sky", "news", "howe", "atlas", "cosmos",
      "bias", "andes", "skiing", "newsy", "biases",
      "inning", "outing", "canning", "herring", "earring", "proceed",
      "exceed", "succeed", "innings", "proceeding", "exceeded",
      // special R1 prefixes
      "generate", "generates", "generalization", "generous", "communism",
      "communities", "communal", "arsenal", "arsenic",
      // y-marking shapes
      "yyy", "yoyo", "syzygy", "sprayed", "crying", "flying", "saying",
      "enjoying", "say", "cry", "by", "trying", "gypsy", "gray", "ayy",
      "byya", "vy", "yes", "youth",
      // short-word / double / at-bl-iz fixups
      "hop", "hopped", "hopping", "hoping", "hope", "hoped", "sized",
      "sizing", "tanned", "falling", "failing", "filing", "conflated",
      "troubled", "disabled", "matting", "mating", "meeting", "meetings",
      "milling", "messing", "luxuriated", "luxuriating",
      // eed / eedly / ingly / edly
      "agreed", "agreedly", "feed", "freed", "need", "needly", "speed",
      "interestingly", "reportedly", "markedly", "supposedly",
      // plural forms
      "caresses", "ponies", "ties", "tied", "cries", "gas", "gaps",
      "kiwis", "dress", "focus", "analysis", "crises",
      // step 2/3/4 batteries
      "relational", "conditional", "rational", "valency", "hesitancy",
      "digitizer", "comfortably", "radically", "differently", "vilely",
      "analogously", "vietnamization", "predication", "operator",
      "feudalism", "decisiveness", "hopefulness", "callousness",
      "formality", "sensitivity", "sensibility", "triplicate", "formative",
      "formalize", "electricity", "electrical", "hopeful", "goodness",
      "revival", "allowance", "inference", "airliner", "gyroscopic",
      "adjustable", "defensible", "irritant", "replacement", "adjustment",
      "dependent", "adoption", "communication", "activate", "angularity",
      "homologous", "effective", "bowdlerize", "probate", "rate", "cease",
      "control", "roll", "controlling", "rolled", "fully", "blessedly",
      "mercilessly", "seriously", "usefully", "lastly", "biology",
      "geology", "archaeology", "tautology", "neatly", "apply", "supply",
      // step 5
      "create", "debate", "bake", "bathe", "breathe", "excite", "plane",
      "plain", "gene", "care", "core", "die", "lie", "tie", "tree", "free",
      // apostrophes
      "dog's", "dogs'", "o'clock", "'twas", "james'", "children's")
    val suffixes = Seq(
      "", "s", "es", "ies", "ied", "sses", "ss", "us", "ed", "eed", "ing",
      "eedly", "ingly", "edly", "y", "'s", "'s'", "'",
      "ization", "ational", "fulness", "ousness", "iveness", "tional",
      "biliti", "lessli", "entli", "ation", "alism", "aliti", "ousli",
      "iviti", "fulli", "enci", "anci", "abli", "izer", "ator", "alli",
      "bli", "ogi", "li",
      "alize", "icate", "iciti", "ical", "ness", "ful", "ative",
      "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
      "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
      "e", "l", "ll")
    val words = (bases ++ (for (b <- bases; s <- suffixes) yield b + s))
      .filter(_.nonEmpty).distinct.sorted

    val tsv = words.map(w => s"$w\t${SnowballStemmer.stem(w)}").mkString("\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/words.tsv"), tsv)
    val sql =
      s"""WITH raw AS (
         |  SELECT column0 AS term FROM read_csv('$outDir/words.tsv',
         |    delim = '\t', header = false, columns = {'column0': 'VARCHAR', 'column1': 'VARCHAR'})
         |),
         |swords AS (SELECT DISTINCT term FROM raw),
         |${SnowballSql.ctes}
         |SELECT term, stem FROM snowball ORDER BY term""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/snowball.sql"), sql)
    println(s"wrote ${words.size} words to $outDir")
  }
}
