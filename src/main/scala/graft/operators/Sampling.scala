package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / partition assignment for training-data
  * pipelines: hash-based train/val/test splits and per-stratum
  * hash-rate sampling.
  *
  * Both are pure per-row decisions from an md5-derived bucket — no
  * shuffle, no global state, reproducible across runs and engines, and
  * stable under corpus growth (a document's split never changes when
  * other documents are added or the corpus is repartitioned, unlike
  * `randomSplit`/`sample`, which are partition-order dependent).
  */
object Sampling {

  /** Bucket in [0, 100) from the first 6 hex nibbles of
    * md5(id ":" salt) — engine-portable (any engine with md5 can
    * reproduce it) and independent of row order or partitioning.
    */
  def hashBucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 6), 16, 10)
      .cast("long") % 100

  /** Deterministic train/val/test assignment: bucket < trainPct →
    * "train", < trainPct+valPct → "val", else "test". Adds `bucket`
    * and `split` columns. Scale shape: projection only, no shuffle,
    * codegen-friendly.
    */
  def hashSplit(
      df: DataFrame,
      idCol: String = "doc_id",
      salt: String = "split",
      trainPct: Int = 80,
      valPct: Int = 10): DataFrame =
    df.withColumn("bucket", hashBucket(col(idCol), salt))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))

  /** Per-stratum hash-rate sampling: keep a row iff its hash bucket is
    * below the stratum's sampling percentage. `rates` is a small
    * (stratum, pct) dimension, broadcast — so the whole operator is a
    * broadcast join plus a scan-local filter: zero shuffles of the
    * corpus, the only 100 TB-safe shape for sampling (a per-stratum
    * `row_number` window would funnel each stratum through one task).
    */
  def stratifiedHashSample(
      df: DataFrame,
      rates: DataFrame,
      stratumCol: String,
      idCol: String = "doc_id",
      salt: String = "strat"): DataFrame =
    df.join(broadcast(rates), Seq(stratumCol))
      .withColumn("bucket", hashBucket(col(idCol), salt))
      .filter(col("bucket") < col("pct"))
}
