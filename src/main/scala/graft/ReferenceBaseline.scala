package graft

import graft.functions.harmonicScoreHof
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The REFERENCE's own formulation of per-datasource cumulative
  * association scoring, reproduced plan-for-plan so the 2× bench
  * criterion is falsifiable at the same scale on the same engine
  * (see BASELINE.md).
  *
  * Shape follows /root/reference/timeseries.py:371–527 exactly:
  *   1. undated evidence filled with `lastYear+1` surrogate,
  *   2. a (distinct datasource × calendar year) scaffold,
  *      `repartition(400, "year")` included,
  *   3. scaffold left-joined to distinct pairs, then left-joined back
  *      to evidence on (pair, source, year) — the 28× evidence-grain
  *      row expansion graft designs out,
  *   4. per-year `collect_list(score)` then a cumulative
  *      `flatten(collect_list(...))` over a rangeBetween window — the
  *      cumulative score MULTISET materialized per (pair, source,
  *      year) row,
  *   5. the filter/sort-desc/slice-50/zip-divide/aggregate harmonic
  *      chain (higher-order functions, as the reference writes it),
  *   6. surrogate year reset to null.
  *
  * This is the measurement stick, not the engine: graft's
  * [[graft.operators.AssociationScore.byDatasource]] computes the same
  * result with one evidence scan, active-year-only harmonic work, and
  * O(K) window state (SURVEY.md §4). An equivalence spec pins
  * result-identity; [[BaselineBench]] times both.
  */
object ReferenceBaseline {

  def byDatasourceScaffold(
      evidence: DataFrame,
      firstYear: Int = GraftConf.FirstYear,
      lastYear: Int = GraftConf.LastYear,
      topK: Int = GraftConf.TopK,
      maxScore: Double = GraftConf.MaxScore): DataFrame = {
    val spark = evidence.sparkSession
    val surrogate = lastYear + 1

    val data = evidence
      .withColumn("year", coalesce(col("year").cast("int"), lit(surrogate)))

    // timeseries.py:441–458 — datasource × all calendar years (incl.
    // surrogate), with the reference's own repartition(400, "year").
    val years = spark.range(firstYear, surrogate + 1)
      .select(col("id").cast("int").as("year"))
    val sourceVsYear = data.select("datasourceId").distinct()
      .crossJoin(years)
      .repartition(400, col("year"))

    // timeseries.py:460–474 — scaffold × distinct pairs, then left join
    // evidence at (pair, source, year) grain.
    val scaffolded = sourceVsYear
      .join(data.select("diseaseId", "targetId", "datasourceId").distinct(),
        Seq("datasourceId"), "left")
      .join(data, Seq("diseaseId", "targetId", "datasourceId", "year"), "left")

    // timeseries.py:476–486 — cumulative multiset via flatten(collect_list)
    // over an unbounded-preceding range window.
    val cumWin = Window
      .partitionBy("diseaseId", "targetId", "datasourceId")
      .orderBy("year")
      .rangeBetween(Window.unboundedPreceding, 0)

    scaffolded
      .groupBy("diseaseId", "targetId", "datasourceId", "year")
      .agg(collect_list("score").as("cum_scores"))
      .withColumn("cum_scores", flatten(collect_list("cum_scores").over(cumWin)))
      // timeseries.py:487–510 — the HOF harmonic chain (filter NaN, sort
      // desc, top-50, /idx², sum, /max_score), matching the reference's
      // expr-by-expr formulation.
      .withColumn("score", harmonicScoreHof(col("cum_scores"), topK, maxScore))
      // timeseries.py:512–524 — recover non-dated evidence.
      .withColumn("year",
        when(col("year") === surrogate, lit(null)).otherwise(col("year")))
      .select("diseaseId", "targetId", "datasourceId", "year", "score")
  }

  /** The reference's novelty formulation
    * (/root/reference/timeseries.py:530–634) over an already-scored
    * dense frame, expr-by-expr:
    *   1. surrogate year + 0.0 score fill,
    *   2. peak = score − lag(score) over (pair, source) by year,
    *      filter > 0,
    *   3. posexplode(sequence(peakYear, peakYear+window)) decay range,
    *   4. groupBy (pair, source, year):
    *      round(max(peak / (1 + e^{scale·(Δ−shift)})), 3),
    *   5. RIGHT join back onto the whole scored frame (the reference
    *      re-joins the full dense table rather than attaching on the
    *      window partitioning — graft's [[graft.operators.Novelty]]
    *      designs that join out of the hot path),
    *   6. surrogate reset to null, null novelty → 0.
    *
    * Two deliberate alignments at the undated edge (plan shape and
    * data volumes untouched): the reference's literal chain joins back
    * its pre-fill frame, so surrogate-year novelty drops on the null
    * year and null scores ride through as 0.0 from the earlier
    * fillna — here the join-back frame carries the surrogate year
    * (novelty attaches to undated rows, as graft and the oracle
    * define) and the raw score nulls, keeping result-identity with
    * [[graft.operators.Novelty.attach]] pinned by spec.
    */
  def noveltyScaffold(
      scored: DataFrame,
      lastYear: Int = GraftConf.LastYear,
      scale: Double = GraftConf.NoveltyScale,
      shift: Double = GraftConf.NoveltyShift,
      window: Int = GraftConf.NoveltyWindow): DataFrame = {
    val surrogate = lastYear + 1
    val part = Window.partitionBy("diseaseId", "targetId", "datasourceId")
      .orderBy("year")
    val withSurrogate = scored
      .withColumn("year", coalesce(col("year"), lit(surrogate)))
    val data = withSurrogate
      .withColumn("score0", coalesce(col("score"), lit(0.0)))
    data
      .select(col("diseaseId"), col("targetId"), col("datasourceId"),
        col("year").as("peakYear"),
        (col("score0") - lag("score0", 1).over(part)).as("peak"))
      .filter(col("peak") > 0)
      .select(col("*"),
        posexplode(sequence(col("peakYear"), col("peakYear") + window))
          .as(Seq("year-peakYear", "year")))
      .groupBy("diseaseId", "targetId", "datasourceId", "year")
      .agg(round(max(col("peak") /
          (lit(1.0) + exp(lit(scale) * (col("year-peakYear") - lit(shift))))), 3)
        .as("novelty"))
      .join(withSurrogate, Seq("diseaseId", "targetId", "datasourceId", "year"), "right")
      .withColumn("year",
        when(col("year") === surrogate, lit(null)).otherwise(col("year")))
      .withColumn("novelty", coalesce(col("novelty"), lit(0.0)))
      .select("diseaseId", "targetId", "datasourceId", "year", "score", "novelty")
  }
}

/** Times the reference formulation against graft's on the same data,
  * same session, same engine. Emits one JSON line per variant; numbers
  * land in BASELINE.md.
  */
object BaselineBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-baseline-bench")
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.sources.Tables(spark, sfDir)

    // noop write, not count(): count() lets Catalyst prune the score
    // columns, so the harmonic chain itself would go untimed (and
    // unevenly so across variants — the novelty prefix cannot prune
    // what the scaffold variant can). noop materializes every column.
    def time(fn: () => DataFrame): Double = {
      val df = fn()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Untimed warmup of both code paths (JIT, parquet footer cache).
    ReferenceBaseline.byDatasourceScaffold(t.evidence.limit(1000)).count()
    operators.AssociationScore.byDatasource(t.evidence.limit(1000)).count()

    val noveltyKeys = Seq("diseaseId", "targetId", "datasourceId")
    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_REPS").flatMap(_.toIntOption).getOrElse(2))
    val variants = Seq[(String, () => DataFrame)](
      "reference_scaffold" ->
        (() => ReferenceBaseline.byDatasourceScaffold(t.evidence)),
      "graft" ->
        (() => operators.AssociationScore.byDatasource(t.evidence)),
      // the full scoring→novelty chain, reference formulation vs graft
      "reference_novelty" ->
        (() => ReferenceBaseline.noveltyScaffold(
          ReferenceBaseline.byDatasourceScaffold(t.evidence))),
      "graft_novelty" ->
        (() => operators.Novelty.attach(
          operators.AssociationScore.byDatasource(t.evidence), noveltyKeys)))
    val results = variants.map { case (name, fn) =>
      val runs = (1 to reps).map(_ => time(fn))
      (name, runs.min, fn().count())
    }
    results.foreach { case (name, sec, rows) =>
      println(s"""{"variant":"$name","sec":$sec,"rows":$rows,"sf":"$sfDir"}""")
    }
    def ratio(g: String, r: String): Double =
      results.find(_._1 == g).get._2 / results.find(_._1 == r).get._2
    println(s"""{"metric":"graft_over_reference","value":${ratio("graft", "reference_scaffold")}}""")
    println(s"""{"metric":"graft_over_reference_novelty","value":${ratio("graft_novelty", "reference_novelty")}}""")
    spark.stop()
  }
}
