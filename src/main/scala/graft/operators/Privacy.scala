package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk auditing for release pipelines (the structured
  * counterpart to TextAnalysis.piiRedact's free-text scrubbing):
  * k-anonymity — every quasi-identifier combination must describe at
  * least k records — and l-diversity — each combination must carry at
  * least l distinct sensitive values, or the group's sensitive
  * attribute is inferable even when k holds (Sweeney 2002; Machanavajjhala
  * et al. 2007).
  *
  * Scale shape: one map-side-combined groupBy on the quasi-identifier
  * key; the distinct-sensitive count is exact (Expand-based distinct
  * aggregation) at the group grain, never a second scan.
  */
object Privacy {

  /** Per quasi-identifier group: size, sensitive diversity, and the
    * k/l verdicts. Output: quasiCols ++ (n, l_div, k_anonymous,
    * l_diverse).
    */
  def kAnonymity(
      df: DataFrame,
      quasiCols: Seq[Column],
      sensitive: Column,
      k: Int,
      l: Int): DataFrame =
    df.groupBy(quasiCols: _*)
      .agg(
        count(lit(1)).as("n"),
        countDistinct(sensitive).as("l_div"))
      .withColumn("k_anonymous", col("n") >= k)
      .withColumn("l_diverse", col("l_div") >= l)

  /** Cumulative 24-bit integer thresholds for the discrete (two-sided
    * geometric) Laplace distribution P(k) ∝ α^|k|, α = e^−ε, with
    * the tail mass beyond ±cap folded into the endpoints (Ghosh,
    * Roughgarden & Sundararajan 2009 — the geometric mechanism, the
    * integer-valued DP noise that needs no float sampling). Computed
    * once driver-side; the draw itself is pure integer comparison
    * (the q173 Poisson-bootstrap pattern), so any engine replays it
    * bit-for-bit. The k for a 24-bit draw b is the first entry whose
    * threshold exceeds b.
    */
  def dpThresholds(eps: Double, cap: Int): Seq[(Int, Long)] = {
    require(eps > 0 && cap > 0)
    val alpha = math.exp(-eps)
    val tail = math.pow(alpha, cap + 1) / (1 + alpha)
    var c = 0.0
    (-cap to cap).map { k =>
      c += (1 - alpha) / (1 + alpha) * math.pow(alpha, math.abs(k)) +
        (if (math.abs(k) == cap) tail else 0.0)
      k -> math.min((c * (1 << 24)).toLong, 1L << 24)
    }
  }

  /** The same draw as a DuckDB CASE over `bucketExpr` (a 24-bit
    * integer) — rendered from [[dpThresholds]] so the oracle's
    * constants are identical by construction.
    */
  def dpNoiseSql(bucketExpr: String, eps: Double, cap: Int): String = {
    val thr = dpThresholds(eps, cap)
    thr.init.map { case (k, t) => s"WHEN $bucketExpr < $t THEN ($k)" }
      .mkString("CASE ", " ", s" ELSE (${thr.last._1}) END")
  }

  /** Differentially-private group counts via the geometric mechanism:
    * exact counts per key get integer noise k ~ DiscreteLaplace(ε)
    * (sensitivity 1 for counting queries), clamped at 0 on release
    * (post-processing preserves ε-DP). The aggregate-release
    * counterpart to k-anonymity's audit: instead of refusing small
    * groups, every group's count is perturbed just enough that one
    * individual's presence is ε-deniable.
    *
    * Determinism: the noise draw inverts the discrete-Laplace CDF on
    * a 24-bit md5 integer of the group key — seeded, engine-portable,
    * and all-integer (the house q173 contract). A REAL release would
    * swap the md5 for a secret-keyed PRF draw per release; the
    * mechanism and the plan shape are identical.
    *
    * Scale shape: one map-side-combined groupBy; the noise is a pure
    * projection on the GROUP table. Output: keys ++ (noisy_n,
    * epsilon).
    */
  def dpCounts(
      df: DataFrame,
      keys: Seq[String],
      eps: Double = 0.5,
      cap: Int = 8,
      salt: String = "dp"): DataFrame = {
    val thr = dpThresholds(eps, cap)
    val keyStr = concat_ws("|", keys.map(c => col(c).cast("string")): _*)
    val bucket = conv(substring(md5(concat(keyStr, lit(":" + salt))), 1, 6), 16, 10)
      .cast("long")
    val noise = thr.init.foldLeft(Option.empty[Column]) { case (acc, (k, t)) =>
      Some(acc.fold(when(bucket < t, k))(_.when(bucket < t, k)))
    }.get.otherwise(thr.last._1).cast("long")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .select(keys.map(col) :+
        greatest(col("__n") + noise, lit(0L)).as("noisy_n") :+
        lit(eps).as("epsilon"): _*)
  }
}
