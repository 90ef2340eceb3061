package graft.tools

import graft.KStemSql
import graft.analysis.KStemmer

/** Dumps a validation corpus for the generated SQL KStem replay
  * ([[graft.KStemSql]]): every direct-conflation and lexicon word, plus
  * inflected forms over a rule-edge battery, each with the Scala stemmer's
  * output. `scripts/kstem_sql_check` executes the word-for-word compare.
  */
object KStemSqlCheck {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/kstem_check")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    val bases =
      KStemmer.DirectConflations.keys.toSeq ++
      KStemmer.DirectConflations.values.toSeq ++
      KStemmer.Lexicon.toSeq ++ Seq(
        // rule-edge shapes outside both tables
        "hop", "hopped", "hopping", "hoping", "hoped", "moved", "moving",
        "taped", "tapped", "tapping", "sized", "sizing", "merged",
        "merging", "queried", "queries", "babies", "boxes", "churches",
        "wishes", "quizzes", "fizzes", "buses", "gases", "classes",
        "glasses", "caresses", "cats", "dogs", "runs", "plans", "scans",
        "joins", "sorts", "rows", "keys", "areas", "ideas", "seas",
        "yes", "its", "letters", "winning", "winged", "stringed",
        "needing", "feeding", "seeded", "reddened", "bedded", "foxes",
        "axes", "mixes", "fixes", "pushes", "rushes", "watches",
        "patches", "leaves", "loaves", "wolves", "shelves", "scarves",
        "waves", "caves", "gives", "lives", "drives", "moves", "groves",
        "solves", "serves", "curves", "carves")
    val suffixes = Seq("", "s", "es", "ies", "ied", "ed", "ing", "ves",
      "sses", "xes", "ches", "shes", "zes")
    val words = (bases ++ (for (b <- bases; s <- suffixes) yield b + s))
      .filter(_.nonEmpty).distinct.sorted
      .filterNot(_.contains("'"))

    val tsv = words.map(w => s"$w\t${KStemmer.stem(w)}").mkString("\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/words.tsv"), tsv)
    val sql =
      s"""WITH raw AS (
         |  SELECT column0 AS term FROM read_csv('$outDir/words.tsv',
         |    delim = '\t', header = false, columns = {'column0': 'VARCHAR', 'column1': 'VARCHAR'})
         |),
         |kwords AS (SELECT DISTINCT term FROM raw),
         |${KStemSql.ctes}
         |SELECT term, stem FROM kstem ORDER BY term""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/kstem.sql"), sql)
    println(s"wrote ${words.size} words to $outDir")
  }
}
