package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evidence-dating primitives mirroring the reference's
  * timestamp_evidence.py pipeline: per-source lookup joins to attach
  * candidate years, a priority coalesce to choose the best one, and
  * anti-join + unionByName recovery so undated rows are never lost.
  */
object Dating {

  /** Best-date selection: first non-null year across a priority list of
    * candidate columns. Reference: select_best_date
    * (/root/reference/timestamp_evidence.py:285–310) —
    * `coalesce(studyYear, curationYear, publicationYear, pubmedYear)`.
    */
  def bestDate(df: DataFrame, priority: Seq[String], out: String = "year"): DataFrame =
    df.withColumn(out, coalesce(priority.map(col): _*))

  /** Recover rows of `all` that did not make it into `dated` (per-source
    * processing may drop or fail) and union them back, tolerating
    * missing columns. Reference: date_pubmed / select_best_date
    * (/root/reference/timestamp_evidence.py:251–305) — anti-join on id
    * + `unionByName(allowMissingColumns=True)`.
    */
  def recoverUndated(dated: DataFrame, all: DataFrame, idCol: String): DataFrame =
    dated.unionByName(
      all.join(dated.select(idCol), Seq(idCol), "left_anti"),
      allowMissingColumns = true)

  /** Dated-vs-total evidence counts per source. Reference:
    * count_dated_evidence (/root/reference/timestamp_evidence.py:331–356).
    */
  def datedCounts(
      ev: DataFrame,
      source: String = "datasourceId",
      year: String = "year"): DataFrame =
    ev.groupBy(source)
      .agg(
        count(lit(1)).as("n_evidence"),
        count(col(year)).as("n_dated"))
}
