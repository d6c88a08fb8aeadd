package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed-series screens split out of [[Rollups]] (shard hygiene — the
  * RollupsEval pattern): randomness/efficiency ratios, drawdown
  * accounting, structural breaks, seasonal trend tests, partial
  * autocorrelation, cointegration. Mixed into the `Rollups` object so
  * call sites read `Rollups.<op>` like every other rollup.
  *
  * All series arrive pre-quantized to INTEGER units (daily counts,
  * cent sums — the D-family contract): every moment below is exact in
  * long/decimal(38,0), and each statistic is ONE pinned double chain.
  */
private[operators] trait RollupsSeries {

  /** Bartels rank test of randomness per keyed series (D41) — the
    * rank von Neumann ratio: RVN = Σ(R_t − R_{t+1})² / Σ(R_t − R̄)²
    * over the time-ordered ranks. E[RVN] = 2 under exchangeability;
    * RVN ≪ 2 means neighboring observations rank close (positive
    * serial dependence), RVN ≫ 2 alternation. The rank-based cousin
    * of D17's Durbin–Watson (whose 0–4 geometry it shares), robust to
    * any monotone transform of the level.
    *
    * Exactness: doubled midranks (2·rank + ties − 1, the spearman
    * carrier) make both sums exact integers — Σ(R2_t) = n(n+1)
    * exactly, so the centered denominator collapses to
    * ΣR2² − n(n+1)² with no mean rounding; the 4× scale cancels in
    * the ratio. z = (RVN − 2)/√(4(n−2)/((n+1)(n−1))), 4dp.
    *
    * Scale shape: the rank window and the successor window ride the
    * SAME (keys) exchange; one key-grain combine. O(1) window state.
    *
    * Output: keys ++ (n, rvn, z) — null rvn/z for constant series.
    */
  def bartelsRank(
      df: DataFrame,
      keys: Seq[String],
      tCol: String,
      valCol: String): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val dec = "decimal(38,0)"
    val wRank = Window.partitionBy(keys.map(col): _*).orderBy("__x")
    val wTies = Window.partitionBy((keys :+ "__x").map(col): _*)
    val wNext = Window.partitionBy(keys.map(col): _*).orderBy("__t")
    val base = df.select(keys.map(col) ++ Seq(
      col(tCol).cast("long").as("__t"), col(valCol).cast("long").as("__x")): _*)
      .withColumn("__r2",
        lit(2L) * rank().over(wRank) + count(lit(1)).over(wTies) - 1L)
      .withColumn("__r2n", lead("__r2", 1).over(wNext))
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__r2").cast(dec) * col("__r2").cast(dec)).as("__ss"),
        sum(when(col("__r2n").isNotNull,
          (col("__r2") - col("__r2n")).cast(dec) *
            (col("__r2") - col("__r2n")).cast(dec)).otherwise(lit(0L).cast(dec)))
          .as("__sd"))
      .withColumn("__den",
        col("__ss") - col("n").cast(dec) * (col("n") + 1L).cast(dec) *
          (col("n") + 1L).cast(dec))
      .withColumn("__rvn", when(col("__den") > 0, d(col("__sd")) / d(col("__den"))))
      .select(keys.map(col) ++ Seq(col("n"),
        round(col("__rvn"), 4).as("rvn"),
        round(when(col("n") > 2L,
          (col("__rvn") - 2.0) /
            sqrt(lit(4.0) * d(col("n") - 2L) /
              (d(col("n") + 1L) * d(col("n") - 1L)))), 4).as("z")): _*)
  }

  /** Lo–MacKinlay variance ratio per keyed series (D42) — is the
    * series a random walk? VR(q) = Var(q-step diffs)/(q·Var(1-step
    * diffs)): 1 under a random walk, < 1 mean reversion, > 1
    * momentum. The finance-standard efficiency screen beside D40's
    * unit-root τ (DF asks "is there ANY mean reversion", VR measures
    * HOW MUCH at horizon q).
    *
    * Exactness: both diff families pair by TIME ARITHMETIC (t−1,
    * t−q — the ljungBox gap-proof convention, never position lag);
    * each variance is the exact multiply-through m·Σd² − (Σd)², and
    * VR = (vq·m1²)/(q·v1·mq²) is ONE double ratio of exact decimals.
    * z uses the iid-null asymptotic √(2(2q−1)(q−1)/(3q·m1)).
    *
    * Output: keys ++ (n1, nq, vr, z) — null when either variance
    * degenerates.
    */
  def varianceRatio(
      df: DataFrame,
      keys: Seq[String],
      tCol: String,
      valCol: String,
      q: Int = 5): DataFrame = {
    require(q >= 2)
    val d = (c: Column) => c.cast("double")
    val dec = "decimal(38,0)"
    val base = df.select(keys.map(col) ++ Seq(
      col(tCol).cast("long").as("__t"), col(valCol).cast("long").as("__x")): _*)
      .localCheckpoint() // feeds both diff joins
    val part = base.select(
      (keys.map(col) :+ col("__t").as("__tp") :+ col("__x").as("__xp")): _*)
    def diffs(k: Int, tag: String): DataFrame = base
      .withColumn("__tp", col("__t") - k.toLong)
      .join(part, (keys :+ "__tp").toSeq)
      .withColumn("__d", col("__x") - col("__xp"))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(s"__m$tag"),
        sum(col("__d").cast(dec)).as(s"__s$tag"),
        sum(col("__d").cast(dec) * col("__d").cast(dec)).as(s"__ss$tag"))
    val v1 = col("__m1").cast(dec) * col("__ss1") - col("__s1") * col("__s1")
    val vq = col("__mq").cast(dec) * col("__ssq") - col("__sq") * col("__sq")
    diffs(1, "1").join(diffs(q, "q"), keys)
      .withColumn("__vr",
        when(v1 > 0 && col("__mq") > 1L,
          d(vq * col("__m1").cast(dec) * col("__m1").cast(dec)) /
            (lit(q.toDouble) * d(v1 * col("__mq").cast(dec) *
              col("__mq").cast(dec)))))
      .select(keys.map(col) ++ Seq(
        col("__m1").as("n1"), col("__mq").as("nq"),
        round(col("__vr"), 4).as("vr"),
        round((col("__vr") - 1.0) /
          sqrt(lit(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q)) / d(col("__m1"))), 4)
          .as("z")): _*)
  }

  /** Seasonal Mann–Kendall trend test per keyed series (D45, Hirsch &
    * Slack 1984) — D23's S statistic computed WITHIN each season
    * (t mod `period`) and pooled: S = ΣS_s, Var = ΣVar_s. A weekly
    * cycle turns plain MK into noise (every Monday→Sunday comparison
    * votes on the cycle, not the trend); comparing only
    * like-with-like days removes the cycle without estimating it —
    * the trend gate to run when D11/D24 say seasonality exists.
    *
    * Exactness: the D23 contract per (keys, season) — exact ±1 pair
    * fold over the sorted per-season array, exact tie-corrected
    * variance sums, one continuity-corrected z, 4dp.
    *
    * Scale shape: series live at key grain; the pair fold is in-row
    * over per-season arrays (day-grain bounded); one (keys, season)
    * combine then a key-grain reduce.
    *
    * Output: keys ++ (n_points, n_seasons, s_stat, var_s, z).
    */
  def seasonalMannKendall(
      df: DataFrame,
      keys: Seq[String],
      tCol: String,
      valCol: String,
      period: Int = 7): DataFrame = {
    require(period >= 2)
    val d = (c: Column) => c.cast("double")
    val s0 = df
      .select((keys.map(col) :+ col(tCol).cast("long").as("__x") :+
        col(valCol).cast("long").as("__y")): _*)
      .withColumn("__season", pmod(col("__x"), lit(period.toLong)))
      .localCheckpoint() // feeds the pair fold AND the tie rollup
    val sk = keys :+ "__season"
    val arr = s0
      .groupBy(sk.map(col): _*)
      .agg(sort_array(collect_list(struct(col("__x").as("x"), col("__y").as("y"))))
        .as("__a"), count(lit(1)).as("__np"))
      .withColumn("__s", aggregate(
        flatten(transform(col("__a"), (p, i) =>
          transform(slice(col("__a"), i + lit(2), size(col("__a"))), q =>
            signum(q.getField("y") - p.getField("y")).cast("long")))),
        lit(0L), (acc, x) => acc + x))
    val ties = s0
      .groupBy((sk :+ "__y").map(col): _*)
      .agg(count(lit(1)).as("__t"))
      .groupBy(sk.map(col): _*)
      .agg(sum(col("__t") * (col("__t") - 1L) * (lit(2L) * col("__t") + 5L))
        .as("__tsum"))
    arr.join(ties, sk)
      .groupBy(keys.map(col): _*)
      .agg(sum("__np").as("n_points"), count(lit(1)).as("n_seasons"),
        sum("__s").as("s_stat"),
        sum(col("__np") * (col("__np") - 1L) * (lit(2L) * col("__np") + 5L) -
          col("__tsum")).as("__vn"))
      .select(keys.map(col) ++ Seq(col("n_points"), col("n_seasons"),
        col("s_stat"),
        round(d(col("__vn")) / 18.0, 4).as("var_s"),
        round(when(col("__vn") <= 0, lit(null))
          .otherwise(when(col("s_stat") > 0, d(col("s_stat") - 1L))
            .when(col("s_stat") < 0, d(col("s_stat") + 1L))
            .otherwise(lit(0.0)) / sqrt(d(col("__vn")) / 18.0)), 4)
          .as("z")): _*)
  }

  /** Maximum drawdown per keyed equity curve (D43) — the worst
    * peak-to-trough fall of the cumulative series: depth (exact
    * integer units), the trough date, the peak it fell from, and the
    * relative depth. The risk number every backtest (D18/D21/D27
    * forecasts, F23 bandits) reports next to its mean return.
    *
    * Exactness: the running peak and drawdown are EXACT integers on
    * one cumulative window; the argmax trough picks the EARLIEST
    * trough of the deepest fall via one struct max (dd, −t, peak) —
    * deterministic on both engines. Only dd_frac divides, 4dp.
    *
    * Scale shape: one (keys) exchange carries the cumulative sum,
    * running max, and the final combine. O(1) window state.
    *
    * Output: keys ++ (n, final_level, max_dd, peak_at_trough,
    * trough_t, dd_frac).
    */
  def maxDrawdown(
      df: DataFrame,
      keys: Seq[String],
      tCol: String,
      flowCol: String): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val wCum = Window.partitionBy(keys.map(col): _*).orderBy("__t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df.select(keys.map(col) ++ Seq(
      col(tCol).cast("long").as("__t"), col(flowCol).cast("long").as("__f")): _*)
      .withColumn("__cum", sum("__f").over(wCum))
      .withColumn("__peak", max("__cum").over(wCum))
      .withColumn("__dd", col("__peak") - col("__cum"))
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        max(struct(col("__t"), col("__cum"))).getField("__cum")
          .as("final_level"),
        max("__dd").as("max_dd"),
        max(struct(col("__dd"), (-col("__t")).as("__nt"), col("__peak")))
          .as("__am"))
      .select(keys.map(col) ++ Seq(col("n"), col("final_level"),
        col("max_dd"),
        col("__am").getField("__peak").as("peak_at_trough"),
        (-col("__am").getField("__nt")).as("trough_t"),
        round(when(col("__am").getField("__peak") > 0,
          d(col("max_dd")) / d(col("__am").getField("__peak"))), 4)
          .as("dd_frac")): _*)
  }
}
