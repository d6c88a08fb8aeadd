package graft

import graft.operators.{AssociationScore, Novelty}
import org.apache.spark.sql.Row

class AssociationScoreSpec extends SparkSpec {
  import spark.implicits._

  private val M = GraftConf.MaxScore
  private def h(scores: Double*): Double =
    scores.sorted.reverse.take(50).zipWithIndex
      .map { case (s, i) => s / ((i + 1).toLong * (i + 1)) }.sum / M

  test("byDatasource: cumulative harmonic with densify, carry-forward, undated surrogate") {
    val ev = Seq(
      (1L, 1L, "A", 0.5, Some(1996)),
      (1L, 1L, "A", 0.3, Some(1996)),
      (1L, 1L, "A", 0.4, Some(1998)),
      (1L, 1L, "A", 0.2, None)) // undated
      .toDF("diseaseId", "targetId", "datasourceId", "score", "year")
    val out = AssociationScore.byDatasource(ev, firstYear = 1995, lastYear = 1998)
      .collect()
      .map(r => (Option(r.get(3)).map(_.asInstanceOf[Int]), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out(Some(1995)).isEmpty, "pre-evidence year must be NULL")
    assert(math.abs(out(Some(1996)).get - h(0.5, 0.3)) < 1e-12)
    assert(math.abs(out(Some(1997)).get - h(0.5, 0.3)) < 1e-12, "carry-forward year")
    assert(math.abs(out(Some(1998)).get - h(0.5, 0.3, 0.4)) < 1e-12)
    assert(math.abs(out(None).get - h(0.5, 0.3, 0.4, 0.2)) < 1e-12, "undated bucket")
    assert(out.size == 5)
  }

  test("byDatasource accumulates evidence dated before the calendar range") {
    val ev = Seq((1L, 1L, "A", 0.9, Some(1980)))
      .toDF("diseaseId", "targetId", "datasourceId", "score", "year")
    val out = AssociationScore.byDatasource(ev, firstYear = 1995, lastYear = 1996)
      .collect()
      .map(r => (Option(r.get(3)).map(_.asInstanceOf[Int]), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap
    assert(math.abs(out(Some(1995)).get - h(0.9)) < 1e-12,
      "pre-range evidence must carry into the calendar (reference drops it; we keep it)")
  }

  test("ReferenceBaseline scaffold formulation is result-identical to graft byDatasource") {
    // testdata years all fall inside the calendar range, the one regime
    // where the reference's scaffold left-join and graft's
    // accumulate-everything semantics agree (see spec above for the
    // deliberate pre-range divergence).
    import org.apache.spark.sql.functions._
    val t = sources.Tables(spark, sfDir)
    def keyed(df: org.apache.spark.sql.DataFrame, scoreAs: String) = df.select(
      col("diseaseId"), col("targetId"), col("datasourceId"),
      coalesce(col("year"), lit(9999)).as("y"), col("score").as(scoreAs))
    val ref = keyed(ReferenceBaseline.byDatasourceScaffold(t.evidence), "rs")
    val g = keyed(operators.AssociationScore.byDatasource(t.evidence), "gs")
    val joined = ref.join(g, Seq("diseaseId", "targetId", "datasourceId", "y"), "full_outer")
      .select("rs", "gs").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (rs, gs) = (Option(r.get(0)).map(_.asInstanceOf[Double]),
        Option(r.get(1)).map(_.asInstanceOf[Double]))
      assert(rs.isDefined == gs.isDefined, s"row present/null mismatch: $rs vs $gs")
      for (a <- rs; b <- gs)
        assert(math.abs(a - b) < 1e-9, s"score mismatch: $a vs $b")
    }
  }

  test("ReferenceBaseline novelty formulation is result-identical to Novelty.attach") {
    import org.apache.spark.sql.functions._
    val t = sources.Tables(spark, sfDir)
    val keys = Seq("diseaseId", "targetId", "datasourceId")
    val ref = ReferenceBaseline.noveltyScaffold(
        ReferenceBaseline.byDatasourceScaffold(t.evidence))
      .select(col("diseaseId"), col("targetId"), col("datasourceId"),
        coalesce(col("year"), lit(9999)).as("y"),
        col("score").as("rs"), col("novelty").as("rn"))
    val g = operators.Novelty.attach(
        operators.AssociationScore.byDatasource(t.evidence), keys)
      .select(col("diseaseId"), col("targetId"), col("datasourceId"),
        coalesce(col("year"), lit(9999)).as("y"),
        col("score").as("gs"), col("novelty").as("gn"))
    val joined = ref.join(g, keys :+ "y", "full_outer")
      .select("rs", "gs", "rn", "gn").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val rs = Option(r.get(0)).map(_.asInstanceOf[Double])
      val gs = Option(r.get(1)).map(_.asInstanceOf[Double])
      assert(rs.isDefined == gs.isDefined, s"row presence mismatch: $rs vs $gs")
      // graft rounds score at the final projection (4dp); the reference
      // formulation emits it raw — identity modulo that rounding
      for (a <- rs; b <- gs)
        assert(math.abs(a - b) <= 5e-5 + 1e-12, s"score mismatch: $a vs $b")
      // novelty is rounded to 3dp by BOTH formulations — exact equality
      assert(r.getDouble(2) == r.getDouble(3),
        s"novelty mismatch: ${r.getDouble(2)} vs ${r.getDouble(3)}")
    }
  }

  test("overall: weighted harmonic across sources, no re-accumulation") {
    val dense = Seq(
      (1L, 1L, "A", Some(1995), Some(0.6)),
      (1L, 1L, "N", Some(1995), Some(0.4)))
      .toDF("diseaseId", "targetId", "datasourceId", "year", "score")
    val weights = Seq(("A", 1.0), ("N", 0.5)).toDF("datasourceId", "weight")
    val out = AssociationScore.overall(dense, weights, lastYear = 1995)
      .collect().map(r => (Option(r.get(2)).map(_.asInstanceOf[Int]), r.getDouble(3))).toMap
    // weighted: A=0.6, N=0.2 → h(0.6, 0.2)
    assert(math.abs(out(Some(1995)) - h(0.6, 0.2)) < 1e-12)
  }

  test("novelty: peaks decay logistically and max wins") {
    val dense = Seq(
      (1L, 1L, Some(1995), Option.empty[Double]),
      (1L, 1L, Some(1996), Some(0.2)),
      (1L, 1L, Some(1997), Some(0.2)),
      (1L, 1L, Some(1998), Some(0.5)))
      .toDF("diseaseId", "targetId", "year", "score")
    val out = Novelty.attach(dense, Seq("diseaseId", "targetId"), lastYear = 1998)
      .collect()
      .map(r => (Option(r.get(2)).map(_.asInstanceOf[Int]), r.getDouble(4)))
      .toMap
    def nv(peak: Double, d: Int): Double = peak / (1 + math.exp(2.0 * (d - 2)))
    def r3(x: Double): Double = BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(Some(1995)) == 0.0, "no peak yet")
    assert(out(Some(1996)) == r3(nv(0.2, 0)))
    assert(out(Some(1997)) == r3(nv(0.2, 1)))
    assert(out(Some(1998)) == r3(math.max(nv(0.2, 2), nv(0.3, 0))))
  }
}
