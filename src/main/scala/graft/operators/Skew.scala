package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for pathological hot keys (SURVEY.md §5).
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime; these
  * operators cover the two cases AQE does not: aggregation skew (one
  * group receiving most rows) and broadcast-infeasible skewed joins
  * where the hot side must be salted explicitly.
  */
object Skew {

  /** Two-phase ("salted") aggregation: rows are spread over
    * `saltBuckets` sub-groups per key, partially aggregated, then
    * combined — so a hot key's rows land on `saltBuckets` reducers
    * instead of one.
    *
    * The caller supplies both phases, e.g.
    * {{{
    * Skew.saltedAgg(events, Seq("event_type"), 16)(
    *   partial = Seq(sum("value").as("s"), count(lit(1)).as("c")),
    *   combine = Seq(sum("s").as("sum_value"), sum("c").as("n")))
    * }}}
    * Any aggregate with an associative combine (sum/count/min/max,
    * sketches) fits; AVG must be decomposed into sum+count.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int)(
      partial: Seq[Column], combine: Seq[Column]): DataFrame = {
    require(saltBuckets >= 1)
    val salted = df.withColumn("__salt",
      pmod(hash(monotonically_increasing_id(), spark_partition_id()), lit(saltBuckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(combine.head, combine.tail: _*)
  }

  /** Salted equi-join for a skewed left side against a small-but-not-
    * broadcastable right side: left rows get a random salt in
    * [0, saltBuckets); the right side is replicated `saltBuckets`
    * times; the join key becomes (keys..., salt), so one hot key
    * spreads over `saltBuckets` tasks.
    */
  /** Pre-flight join blow-up forecast — the skew diagnosis you run
    * BEFORE a 100 TB join: per join key, |A_k|·|B_k| is exactly the
    * key's output cardinality, so the top-k keys by that product are
    * the keys that will dominate (or OOM) the join. Feeds the
    * saltBuckets choice for [[saltedJoin]].
    *
    * Scale shape: two map-side-combined key-count aggregates (never
    * the join itself), an equi-join of the two COUNT tables, and a
    * TakeOrdered top-k — no global sort, no window.
    */
  def joinBlowupForecast(
      a: DataFrame,
      b: DataFrame,
      aKey: String,
      bKey: String,
      k: Int = 20): DataFrame = {
    val ca = a.groupBy(col(aKey).as("key")).agg(count(lit(1)).as("n_left"))
    val cb = b.groupBy(col(bKey).as("key")).agg(count(lit(1)).as("n_right"))
    ca.join(cb, "key")
      .withColumn("out_rows", col("n_left") * col("n_right"))
      .orderBy(col("out_rows").desc, col("key"))
      .limit(k)
  }

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets >= 1)
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(monotonically_increasing_id(), spark_partition_id()), lit(saltBuckets)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft
      .join(replicatedRight, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
