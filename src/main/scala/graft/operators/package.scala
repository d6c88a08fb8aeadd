package graft

import org.apache.spark.sql.DataFrame

package object operators {

  /** Ensure at least `defaultParallelism` partitions before a
    * compute-heavy per-row stage (hashing, signatures, dot products).
    *
    * Small inputs often arrive as a single parquet row group — one Spark
    * partition — which would serialize the whole stage on one core. At
    * cluster scale inputs already have many partitions and this is a
    * no-op (no shuffle is added). The partition count probe only forces
    * physical planning, not execution.
    */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
