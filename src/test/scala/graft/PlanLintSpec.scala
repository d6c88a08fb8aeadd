package graft

import graft.plans.PlanLint
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regression fixtures for the registry-wide scale lint (VERDICT r14
  * item 1): the two real sf1 catches (q12 33×, q13 52×) in their
  * PRE-FIX shapes must flag, their rewritten forms must not, and each
  * detector's sanction path (broadcast hint, bounded side, raise
  * guard, grain collapse) must hold. The enforcing sweep over every
  * registered query runs in QueriesSmokeSpec.
  */
class PlanLintSpec extends SparkSpec {

  private def ev = Tables(spark, sfDir).evidence

  private def rules(df: org.apache.spark.sql.DataFrame): Set[String] =
    PlanLint.lint(df).map(_.rule).toSet

  private def withConf(k: String, v: String)(f: => Unit): Unit = {
    val old = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try f
    finally old match {
      case Some(o) => spark.conf.set(k, o)
      case None => spark.conf.unset(k)
    }
  }

  private def q12Shape = ev.select(col("targetId"), col("datasourceId"),
      min("year").over(Window.partitionBy("targetId")).as("first_year"),
      round(max("score").over(
        Window.partitionBy("targetId", "datasourceId")), 4).as("max_score"))
    .distinct()

  test("pre-fix q12 shape (window-attach chain ending in distinct) flags") {
    // with the repair rule disabled the shape must still reach the
    // linter un-rewritten and flag
    withConf("spark.graft.rewriteDistinctOverWindow", "false") {
      assert(rules(q12Shape).contains("distinct-over-window"), rules(q12Shape))
    }
  }

  test("repair: pre-fix q12 optimizes into the keyGrainAttach join, results identical") {
    // default-ON RewriteDistinctOverWindow: the window stack collapses
    // into per-grain aggregates joined at the union grain — no Window
    // node survives, the lint is clean, and the rows are identical to
    // the un-rewritten plan (min/max are order-insensitive)
    val opt = q12Shape.queryExecution.optimizedPlan
    assert(opt.collectFirst {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.isEmpty, opt.treeString)
    assert(opt.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.nonEmpty, opt.treeString)
    assert(rules(q12Shape).isEmpty)
    val fixed = q12Shape.orderBy("targetId", "datasourceId")
      .collect().map(_.toString).toSeq
    withConf("spark.graft.rewriteDistinctOverWindow", "false") {
      val orig = q12Shape.orderBy("targetId", "datasourceId")
        .collect().map(_.toString).toSeq
      assert(fixed == orig)
    }
  }

  test("repair guard: data-grain references below the distinct block the rewrite") {
    // the q15-style self-filter (window value compared to a raw
    // column) references data grain — the rewrite must NOT fire
    val guarded = ev
      .withColumn("first_year", min("year").over(Window.partitionBy("targetId")))
      .filter(col("first_year") === col("year"))
      .select("targetId", "first_year").distinct()
    val opt = guarded.queryExecution.optimizedPlan
    assert(opt.collectFirst {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty, opt.treeString)
    // float sums are order-sensitive across the window→groupBy move —
    // the allowlist must also block those
    val floatSum = ev.select(col("targetId"),
        sum("score").over(Window.partitionBy("targetId")).as("s")).distinct()
    assert(floatSum.queryExecution.optimizedPlan.collectFirst {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty)
  }

  test("repair: multi-distinct decomposes into joined single-distinct aggregates when enabled") {
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    def shape = ev.groupBy("year", "datasourceId")
      .agg(countDistinct("targetId").as("n_targets"),
        countDistinct(concat_ws("|", col("diseaseId"), col("targetId")))
          .as("n_pairs"),
        sum(col("year").cast("long")).as("sy"))
    val orig = shape.orderBy("year", "datasourceId").collect().map(_.toString).toSeq
    withConf("spark.graft.rewriteMultiDistinct", "true") {
      val opt = shape.queryExecution.optimizedPlan
      // every optimized Aggregate carries at most ONE distinct group
      opt.foreach {
        case a: Aggregate =>
          val groups = a.aggregateExpressions.flatMap(_.collect {
            case ae: AggregateExpression if ae.isDistinct =>
              (ae.aggregateFunction.children.map(_.canonicalized),
                ae.filter.map(_.canonicalized))
          }).distinct
          assert(groups.size <= 1, a.treeString)
        case _ =>
      }
      assert(opt.collectFirst {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.nonEmpty, opt.treeString)
      val fixed = shape.orderBy("year", "datasourceId").collect().map(_.toString).toSeq
      assert(fixed == orig)
      // the detector reads the ANALYZED plan, so the finding stays
      // visible even when the repair is on — detection and repair are
      // independently testable
      assert(rules(shape).contains("multi-distinct-expand"))
    }
    // global (no grouping keys) decomposition: cross join of one-row
    // aggregates, still exact
    def global = ev.agg(countDistinct("targetId").as("nt"),
      countDistinct("diseaseId").as("nd"))
    val goff = global.collect().map(_.toString).toSeq
    withConf("spark.graft.rewriteMultiDistinct", "true") {
      assert(global.collect().map(_.toString).toSeq == goff)
    }
  }

  test("rewritten q12 (keyGrainAttach) and q13 (distinctCascade) are clean") {
    assert(rules(SparkEntry.queries("q12_first_year")(spark, sfDir)).isEmpty)
    assert(rules(SparkEntry.queries("q13_distinct_rollup")(spark, sfDir)).isEmpty)
  }

  test("pre-fix q13 shape (two countDistincts in one aggregate) flags") {
    val w13 = ev.groupBy("year", "datasourceId")
      .agg(countDistinct("targetId").as("n_targets"),
        countDistinct(concat_ws("|", col("diseaseId"), col("targetId")))
          .as("n_pairs"))
    assert(rules(w13) == Set("multi-distinct-expand"), rules(w13))
    // one distinct aggregate (even next to plain aggs) plans WITHOUT
    // an Expand — must not flag
    val one = ev.groupBy("year")
      .agg(countDistinct("targetId").as("n_targets"), sum("score").as("s"))
    assert(rules(one).isEmpty, rules(one))
  }

  test("single-partition funnel flags; bounded input passes") {
    val docs = Tables(spark, sfDir).documents
    assert(rules(docs.coalesce(1)) == Set("single-partition-funnel"))
    assert(rules(docs.repartition(1)) == Set("single-partition-funnel"))
    assert(rules(docs.agg(count(lit(1)).as("n")).coalesce(1)).isEmpty)
  }

  test("cartesian flags unless a side is bounded or broadcast-hinted") {
    val docs = Tables(spark, sfDir).documents
    assert(rules(docs.crossJoin(docs.select(col("doc_id").as("b")))) ==
      Set("cartesian"))
    // one-row global aggregate side: provably bounded
    assert(rules(docs.crossJoin(docs.agg(count(lit(1)).as("n")))).isEmpty)
    // author-declared broadcast side: sanctioned intent
    assert(rules(docs.crossJoin(
      broadcast(docs.select(col("doc_id").as("b"))))).isEmpty)
  }

  test("non-equi join flags unless broadcast-hinted") {
    val a = ev.select(col("targetId").as("ta"))
    val b = ev.select(col("targetId").as("tb"))
    assert(rules(a.join(b, col("ta") < col("tb"))) == Set("non-equi-join"))
    assert(rules(a.join(broadcast(b), col("ta") < col("tb"))).isEmpty)
    // an equi conjunct makes it hash-partitionable — clean
    assert(rules(a.join(b, col("ta") === col("tb") && col("ta") < lit(10)))
      .isEmpty)
  }

  test("global window flags on data grain; aggregate input or raise guard sanctions") {
    val raw = ev.withColumn("rk",
      row_number().over(Window.orderBy(col("score"))))
    assert(rules(raw) == Set("unbounded-global-window"), rules(raw))
    // value-grain: the window rides a groupBy collapse
    val collapsed = ev.groupBy("year").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(Window.orderBy(col("year"))))
    assert(rules(collapsed).isEmpty, rules(collapsed))
    // raise-guarded (the grainGuarded / ValueGrainCap contract): the
    // cap raises before an oversized input reaches the window
    val guarded = ev
      .withColumn("__gg",
        when(row_number().over(Window.orderBy(col("score"))) > 1000000,
          raise_error(lit("cap"))).otherwise(lit(0)))
      .filter(col("__gg") === 0).drop("__gg")
      .withColumn("cum", sum("score").over(
        Window.orderBy(col("score"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(rules(guarded).isEmpty, rules(guarded))
  }
}
