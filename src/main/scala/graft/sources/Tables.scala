package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed access to the driver-provided parquet tables plus the derived
  * domain views (evidence / ontology / weights) that realize the
  * reference's data model on the TPC-H-ish testdata (see SURVEY.md §3).
  */
final case class Tables(spark: SparkSession, dir: String) {

  def table(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem: DataFrame = table("lineitem")
  def orders: DataFrame = table("orders")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def nation: DataFrame = table("nation")
  def region: DataFrame = table("region")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects; read nanos as long and convert to a microsecond
    * timestamp (integer division — ns since epoch exceeds 2^53, so
    * double math would lose precision).
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table("events").withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Evidence view — the reference's
    * (diseaseId, targetId, datasourceId, score, year) grain
    * (cf. /root/reference/timeseries.py evidence_dated schema).
    */
  def evidence: DataFrame = lineitem.select(
    col("l_suppkey").as("diseaseId"),
    col("l_partkey").as("targetId"),
    col("l_returnflag").as("datasourceId"),
    (col("l_discount") * 10).as("score"),
    year(col("l_shipdate")).cast("int").as("year"))

  /** Two-level "disease ontology": supplier s has ancestors
    * [100 + s_nationkey, 200 + r_regionkey]. Mirrors the reference's
    * disease table (id, ancestors) used for indirect-evidence
    * propagation (timeseries.py:342–368).
    */
  def ontology: DataFrame = supplier
    .join(nation, col("s_nationkey") === col("n_nationkey"))
    .select(
      col("s_suppkey").cast("long").as("id"),
      array(
        (col("s_nationkey") + 100).cast("long"),
        (col("n_regionkey") + 200).cast("long")).as("ancestors"))

  /** Datasource weight dimension (broadcast-sized). */
  def weights: DataFrame = {
    import spark.implicits._
    GraftConfWeights.df(spark)
  }
}

private[sources] object GraftConfWeights {
  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.GraftConf.Weights.toDF("datasourceId", "weight")
  }
}
