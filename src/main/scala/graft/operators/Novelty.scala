package graft.operators

import graft.GraftConf
import graft.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Novelty of association scores over time: detect score "peaks"
  * (year-over-year increases) and decay them with a logistic curve.
  *
  * Capability parity with the reference's
  * `get_association_novelty_by_overall_dated` /
  * `get_association_novelty_by_datasource_dated`
  * (/root/reference/timeseries.py:530–634, 733–837). The windows are
  * partitioned by the (high-cardinality) association keys, so the
  * shuffle is balanced at scale; peak rows (sparse) are the only rows
  * exploded by the decay window.
  *
  * Matching the reference: the first scaffold year has lag=NULL, so an
  * association's initial score at the very first calendar year is not
  * a peak; novelty defaults to 0.0 where no peak's decay window covers
  * the year; undated rows travel through the surrogate year.
  */
object Novelty {

  /** Year-over-year score increases. Input must be dense per key
    * (output of [[AssociationScore]]). Output: keys, peakYear, peak.
    */
  def peaks(dense: DataFrame, keys: Seq[String], lastYear: Int = GraftConf.LastYear): DataFrame = {
    val surrogate = lastYear + 1
    val w = Window.partitionBy(keys.map(col): _*).orderBy("year")
    dense
      .withColumn("year", coalesce(col("year"), lit(surrogate)))
      .withColumn("score0", coalesce(col("score"), lit(0.0)))
      .select(
        keys.map(col) :+
          col("year").as("peakYear") :+
          (col("score0") - lag("score0", 1).over(w)).as("peak"): _*)
      .filter(col("peak") > 0)
  }

  /** Attach novelty to a dense score frame. Output: keys, year, score
    * (rounded 4dp), novelty (rounded 3dp, 0.0 where none).
    */
  def attach(
      dense: DataFrame,
      keys: Seq[String],
      lastYear: Int = GraftConf.LastYear,
      scale: Double = GraftConf.NoveltyScale,
      shift: Double = GraftConf.NoveltyShift,
      window: Int = GraftConf.NoveltyWindow): DataFrame = {
    val surrogate = lastYear + 1
    val withSurrogate = dense.withColumn("year", coalesce(col("year"), lit(surrogate)))

    val decayed = peaks(dense, keys, lastYear)
      .select(
        (keys.map(col) :+ col("peak")) :+
          posexplode(sequence(col("peakYear"), col("peakYear") + window))
            .as(Seq("delta", "year")): _*)
      .groupBy(keys.map(col) :+ col("year"): _*)
      .agg(round(max(logisticNovelty(col("peak"), col("delta"), scale, shift)), 3)
        .as("novelty"))

    decayed
      .join(withSurrogate, keys :+ "year", "right")
      .withColumn("year", when(col("year") === surrogate, lit(null)).otherwise(col("year")))
      .withColumn("novelty", coalesce(col("novelty"), lit(0.0)))
      .select(keys.map(col) :+ col("year") :+
        round(col("score"), 4).as("score") :+ col("novelty"): _*)
  }
}
