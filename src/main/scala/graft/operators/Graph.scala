package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph measures over an edge list — the companion to
  * [[Dedup.clusters]]' connected components: where clusters answers
  * "which documents are duplicates of each other", PageRank answers
  * "which node is central" (e.g. the canonical member of a duplicate
  * cluster, or the hub of a citation/link graph).
  */
object Graph {

  /** Bounded-iteration synchronous PageRank: `iters` rounds of
    * rank(v) = (1−d)/N + d · Σ_{u→v} rank(u)/outdeg(u), from a
    * uniform 1/N start.
    *
    * Shapes: each round is two equi-joins on the (high-cardinality)
    * node key plus one map-side-combined sum — the standard
    * distributed formulation; nothing is ever collected and no window
    * appears. The node count is the only driver-side value (a
    * constant-size aggregate scalar, the same sanctioned shape as
    * `Dedup.clusters`' convergence probe). The returned frame is the
    * pure 8-round plan; a production run at 100 TB would persist or
    * checkpoint `ranks` every few rounds to cut lineage, which
    * changes nothing about the result.
    *
    * Fixed iteration count (not convergence-tested) keeps the result
    * deterministic and engine-replayable. Dangling nodes: with a
    * symmetrized edge list every node has out-degree ≥ 1, so no rank
    * mass is lost (callers with directed graphs should symmetrize or
    * accept the drop).
    */
  def pageRank(
      edges: DataFrame,
      iters: Int = 8,
      damping: Double = 0.85,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val n = nodes.count()
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum("c").as("csum"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit((1 - damping) / n) +
            lit(damping) * coalesce(col("csum"), lit(0.0))).as("rank"))
    }
    ranks
  }
}
