package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence analysis: which items appear together
  * in the same basket more often than chance predicts (Agrawal &
  * Srikant 1994's support framing with the lift measure).
  */
object Baskets {

  /** Pairwise co-occurrence lift: top-k unordered item pairs by
    * lift = P(a,b) / (P(a)·P(b)) with basket-level support ≥
    * `minSupport`, where every probability is a basket fraction.
    *
    * Scale shape: baskets collapse on ONE basket-keyed exchange to a
    * sorted distinct-item array; pairs are built in-row from that
    * array (index-aware transform over the tail — the blow-up is
    * |basket|², bounded by the basket width, never by the corpus),
    * then shrink map-side onto the item-pair key whose cardinality is
    * ≤ |items|². Item marginals ride the same collapsed table, the
    * basket total is a one-row broadcast, and the final top-k is a
    * TakeOrdered, never a global sort. Counts are exact integers;
    * doubles enter only in the final lift ratio, and the ordering key
    * is the ROUNDED lift so both engines rank the same set.
    *
    * Input: one row per (basket, item) observation (duplicates fine —
    * the collapse dedups). Output: (a, b, n_ab, lift), a < b, ties
    * broken by pair ascending.
    */
  def pairLift(
      df: DataFrame,
      basketCol: String = "basket",
      itemCol: String = "item",
      k: Int = 20,
      minSupport: Int = 5): DataFrame = {
    // The basket collapse feeds pairs, item marginals, AND the basket
    // total; without an eager cut each branch re-derives from the
    // corpus scan (4 scans observed). The checkpointed table is the
    // COLLAPSED corpus (distinct items per basket — far smaller than
    // the raw observations and spill-safe), so one scan + one
    // materialization beats three corpus passes at any scale.
    val baskets = df
      .groupBy(col(basketCol).as("__bk"))
      .agg(sort_array(collect_set(col(itemCol))).as("__items"))
      .localCheckpoint()
    val pairs = baskets
      .select(explode(flatten(transform(col("__items"), (x, i) =>
        transform(slice(col("__items"), i + lit(2), size(col("__items"))),
          y => struct(x.as("a"), y.as("b")))))).as("__p"))
      .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
      .agg(count(lit(1)).as("n_ab"))
    val items = baskets
      .select(explode(col("__items")).as("__it"))
      .groupBy("__it").agg(count(lit(1)).as("__n"))
    val total = broadcast(baskets.agg(count(lit(1)).as("__nb")))
    pairs
      .filter(col("n_ab") >= minSupport)
      .join(items.select(col("__it").as("a"), col("__n").as("__na")), Seq("a"))
      .join(items.select(col("__it").as("b"), col("__n").as("__nb2")), Seq("b"))
      .join(total)
      .select(col("a"), col("b"), col("n_ab"),
        round(col("n_ab").cast("double") * col("__nb").cast("double") /
          (col("__na").cast("double") * col("__nb2").cast("double")), 4)
          .as("lift"))
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Co-occurrence EDGE LIST — item pairs sharing at least
    * `minSupport` baskets, the graph substrate for the Graph.* family
    * (Adamic–Adar link prediction, clustering structure) over
    * co-purchase/co-view data. [[pairLift]]'s one-exchange basket
    * collapse + in-row bounded pair expansion, without the
    * marginals/ranking tail.
    *
    * Output: (src, dst, n_ab), src < dst.
    */
  def coPairs(
      df: DataFrame,
      basketCol: String = "basket",
      itemCol: String = "item",
      minSupport: Int = 2): DataFrame =
    df
      .groupBy(col(basketCol).as("__bk"))
      .agg(sort_array(collect_set(col(itemCol))).as("__items"))
      .select(explode(flatten(transform(col("__items"), (x, i) =>
        transform(slice(col("__items"), i + lit(2), size(col("__items"))),
          y => struct(x.as("a"), y.as("b")))))).as("__p"))
      .groupBy(col("__p.a").as("src"), col("__p.b").as("dst"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)

  /** Item–item cosine similarity from basket co-occurrence —
    * cos(a,b) = n_ab/√(n_a·n_b), the classic item-based
    * collaborative-filtering similarity (Sarwar et al. 2001):
    * [[pairLift]]'s probability-ratio asks "together more than
    * chance?", cosine asks "how aligned are their audiences?" and is
    * what a co-purchase recommender actually ranks by.
    *
    * Scale shape: identical to [[pairLift]] — ONE eager-cut basket
    * collapse feeds the in-row (basket-width-bounded) pair
    * expansion, the item marginals, and nothing else; counts exact,
    * the cosine one double expression; the keep test runs on the
    * 4dp-ROUNDED score so the threshold boundary is engine-portable.
    *
    * Output: (a, b, n_ab, cos), a < b, cos ≥ minCos.
    */
  def itemCosine(
      df: DataFrame,
      basketCol: String = "basket",
      itemCol: String = "item",
      minCos: Double = 0.2,
      minSupport: Int = 3): DataFrame = {
    val baskets = df
      .groupBy(col(basketCol).as("__bk"))
      .agg(sort_array(collect_set(col(itemCol))).as("__items"))
      .localCheckpoint()
    val pairs = baskets
      .select(explode(flatten(transform(col("__items"), (x, i) =>
        transform(slice(col("__items"), i + lit(2), size(col("__items"))),
          y => struct(x.as("a"), y.as("b")))))).as("__p"))
      .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
      .agg(count(lit(1)).as("n_ab"))
    val items = baskets
      .select(explode(col("__items")).as("__it"))
      .groupBy("__it").agg(count(lit(1)).as("__n"))
    pairs
      .filter(col("n_ab") >= minSupport)
      .join(items.select(col("__it").as("a"), col("__n").as("__na")), Seq("a"))
      .join(items.select(col("__it").as("b"), col("__n").as("__nb")), Seq("b"))
      .withColumn("cos", round(col("n_ab").cast("double") /
        sqrt(col("__na").cast("double") * col("__nb").cast("double")), 4))
      .filter(col("cos") >= minCos)
      .select(col("a"), col("b"), col("n_ab"), col("cos"))
  }

  /** Top-k item TRIPLES by support — the Apriori step beyond
    * [[pairLift]]'s pairs, without the candidate-generation scan
    * loop: every C(w,3) combination expands IN-ROW on the collapsed
    * basket (bounded by basket width cubed — a width-7 basket yields
    * 35 triples), so the whole mining pass is one combine over the
    * expansion. For the bundle/combo question pairs can't answer.
    *
    * Determinism: baskets are sorted distinct item lists, so triples
    * emit in (a < b < c) canonical order; the top-k is a TakeOrdered
    * heap on (support desc, a, b, c). Exact counts.
    *
    * Output: (a, b, c, n_abc), top k by support.
    */
  def tripleSupport(
      df: DataFrame,
      basketCol: String = "basket",
      itemCol: String = "item",
      k: Int = 20,
      minSupport: Int = 2): DataFrame = {
    val baskets = df
      .groupBy(col(basketCol).as("__bk"))
      .agg(sort_array(collect_set(col(itemCol))).as("__items"))
    baskets
      .select(explode(flatten(flatten(transform(col("__items"), (x, i) =>
        transform(slice(col("__items"), i + lit(2), size(col("__items"))), (y, j) =>
          transform(slice(col("__items"), i + j + lit(3), size(col("__items"))),
            z => struct(x.as("a"), y.as("b"), z.as("c")))))))).as("__t"))
      .groupBy(col("__t.a").as("a"), col("__t.b").as("b"), col("__t.c").as("c"))
      .agg(count(lit(1)).as("n_abc"))
      .filter(col("n_abc") >= minSupport)
      .orderBy(col("n_abc").desc, col("a"), col("b"), col("c"))
      .limit(k)
  }
}
