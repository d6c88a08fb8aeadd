package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for each left row, the latest right row with
  * the same key and rightTime ≤ leftTime.
  *
  * Spark-first design: instead of a point-in-interval range join (which
  * explodes into a cartesian per key) this tags and unions both sides,
  * sorts once per key by (time, side) and carries the last right
  * payload forward with a window — one shuffle, O(n log n) per key,
  * no fan-out. This is the scalable pattern for 100 TB event streams.
  */
object AsOfJoin {

  /** @param left       probe side; all its columns survive
    * @param right      build side; its payload appears as `payloadCols`
    * @param keys       equi-join keys
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param payloadCols columns of `right` to carry (must not clash)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.filterNot(c => keys.contains(c) || c == leftTime).toSeq
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("_ts"), lit(2).as("_side"),
          lit(null).cast(right.select(payloadCols.map(col): _*).schema.toDDL.pipe(ddl =>
            org.apache.spark.sql.types.StructType.fromDDL(ddl))).as("_payload")) ++
        leftCols.map(col): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("_ts"), lit(1).as("_side"),
          struct(payloadCols.map(col): _*).as("_payload")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_matched", last("_payload", ignoreNulls = true).over(w))
      .filter(col("_side") === 2)
      .select(
        keys.map(col) ++ Seq(col("_ts").as(leftTime)) ++ leftCols.map(col) ++
          payloadCols.map(p => col("_matched").getField(p).as(p)): _*)
  }

  private implicit class Piped[A](private val a: A) extends AnyVal {
    def pipe[B](f: A => B): B = f(a)
  }
}
