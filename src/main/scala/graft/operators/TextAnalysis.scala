package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-corpus analysis for training-data pipelines: token metrics,
  * language-ID heuristic, quality scoring, content fingerprinting.
  *
  * Everything is built from codegen'd built-ins and kept
  * engine-portable (pure length/replace arithmetic and md5) so results
  * are bit-identical across engines — see SURVEY.md §3.
  */
object TextAnalysis {

  /** Number of single-space-separated tokens. */
  def tokenCount(text: Column): Column =
    when(length(text) === 0, lit(0))
      .otherwise(length(text) - length(replace(text, lit(" "), lit(""))) + 1)

  def words(text: Column): Column = split(text, " ")

  /** Count of tokens equal to `w`. */
  def tokenOccurrences(text: Column, w: String): Column =
    size(filter(words(text), t => t === lit(w)))

  /** Per-doc token metrics: n_tokens, n_distinct, avg_token_len. */
  def tokens(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val n = tokenCount(t)
    df.withColumn("n_tokens", n)
      .withColumn("n_distinct", size(array_distinct(words(t))))
      .withColumn("avg_token_len",
        round((length(t) - (n - 1)).cast("double") / n, 4))
  }

  /** Stopword-profile language scorer: score per language = occurrences
    * of that language's marker tokens / n_tokens; predicted language =
    * argmax with deterministic lexicographic tie-break.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die"),
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("el", "la", "y"),
    "fr" -> Seq("le", "la", "et"))

  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    // materialize the token array once: twelve marker counters over an
    // inlined split() would re-split every document twelve times
    // (CollapseProject keeps a multiply-referenced non-cheap alias in
    // its own projection, so this stays a single evaluation)
    val withWords = df.withColumn("__w", words(t))
    def occ(w: String) = size(filter(col("__w"), x => x === lit(w)))
    val n = tokenCount(t).cast("double")
    val scored = LangMarkers.foldLeft(withWords) { case (d, (lang, markers)) =>
      d.withColumn(s"score_$lang",
        round(markers.map(occ).reduce(_ + _) / n, 4))
    }
    val best = LangMarkers
      .map { case (lang, _) => struct(col(s"score_$lang").as("s"), lit(lang).as("l")) }
      .reduce((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    scored
      .withColumn("lang_pred",
        when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und")))
      .drop("__w")
  }

  /** Composite quality score in [0,1]:
    * 0.4·min(n_tokens/100, 1) + 0.3·distinct-ratio + 0.3·(1 − stopword-ratio).
    */
  def quality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val n = tokenCount(t).cast("double")
    val stop = tokenOccurrences(t, "the") + tokenOccurrences(t, "a")
    df.withColumn("quality",
      round(
        lit(0.4) * least(n / 100, lit(1.0)) +
          lit(0.3) * (size(array_distinct(words(t))).cast("double") / n) +
          lit(0.3) * (lit(1.0) - stop.cast("double") / n),
        4))
  }

  /** Content fingerprint (md5 hex). */
  def fingerprint(df: DataFrame, textCol: String = "text", out: String = "fp"): DataFrame =
    df.withColumn(out, md5(col(textCol)))
}
