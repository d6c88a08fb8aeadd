package graft

import graft.operators._
import graft.sources.{Io, Tables}
import graft.streaming.{AssociationStream, EventStream, StreamQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import QueryHelpers._

/** Registry shard — relational + descriptive statistics: TPC-H-style
  * relational queries and the descriptive/rollup statistics family.
  *
  * Every query here has its DuckDB oracle co-located below with
  * IDENTICAL column names (the driver contract; see SparkEntry).
  */
private[graft] object StatsQueries {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q20_tpch_q1" -> ((s, dir) => {
      val t = Tables(s, dir)
      val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t.lineitem
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(disc), 2).as("sum_disc_price"),
          round(sum(disc * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),
    "q21_join_topk" -> ((s, dir) => {
      val t = Tables(s, dir)
      broadcast(t.customer.filter(col("c_mktsegment") === "BUILDING"))
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"), col("revenue"))
    }),
    "q22_asof" -> ((s, dir) => {
      val t = Tables(s, dir)
      val ev = t.events
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts")
        .agg(max("event_id").as("click_event_id"))
        .withColumn("click_ts", col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      AsOfJoin.asOf(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq("click_event_id", "click_ts"))
        .select(col("event_id"), col("user_id"), col("value"), col("click_event_id"),
          (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
    }),
    "q48_range_join" -> ((s, dir) => {
      // clicks landing inside a 2-hour window after each purchase of
      // the same user — the binned interval-join shape
      val t = Tables(s, dir)
      val ev = t.events
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("p_start"),
          timestamp_micros(unix_micros(col("ts")) + 7200L * 1000000L).as("p_end"))
      RangeJoin.binned(clicks, purchases, Seq("user_id"), "ts", "p_start", "p_end")
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          (unix_micros(col("ts")) - unix_micros(col("p_start"))).as("gap_us"))
    }),
    "q50_percentiles" -> ((s, dir) => {
      // exact interpolated percentiles per event type (both engines
      // use the same linear-interpolation definition)
      val t = Tables(s, dir)
      t.events.groupBy("event_type")
        .agg(percentile(col("value"), typedLit(Seq(0.5, 0.9, 0.99))).as("p"))
        .select(col("event_type"),
          round(element_at(col("p"), 1), 4).as("p50"),
          round(element_at(col("p"), 2), 4).as("p90"),
          round(element_at(col("p"), 3), 4).as("p99"))
    }),
    "q102_tpch_q3" -> ((s, dir) => {
      // TPC-H Q3 shape (shipping priority adapted to this schema):
      // segment-filtered customers, date-bracketed orders/lineitems,
      // revenue top-10
      val t = Tables(s, dir)
      val cutoff = lit("1997-06-01").cast("timestamp")
      t.customer.filter(col("c_mktsegment") === "BUILDING")
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < cutoff)
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > cutoff)
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("revenue"))
    }),
    "q327_tpch_q5" -> ((s, dir) => {
      // F70 TPC-H Q5 shape (local-supplier volume): revenue by nation
      // for same-nation customer+supplier pairs inside one region and
      // one order year. Nation⋈region prune BROADCASTS (dim-sized
      // forever); orders date-filter pushes to the scan; customer,
      // lineitem, supplier join on their natural high-cardinality
      // keys (AQE-sizable, never forced broadcast — they scale with
      // SF). Revenue quantized to per-row cents (identical double →
      // identical round both engines) so the nation sums are exact
      // longs — a million-row double fold would hash on ulp luck.
      val t = Tables(s, dir)
      val nr = broadcast(
        t.nation.join(t.region, col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .select(col("n_nationkey"), col("n_name")))
      t.orders
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(nr, col("c_nationkey") === col("n_nationkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100).cast("long")).as("revenue_cents"))
        .select(col("n_name"),
          round(col("revenue_cents").cast("double") / 100, 2).as("revenue"))
    }),
    "q346_tpch_q17" -> ((s, dir) => {
      // F76 TPC-H Q17 shape (small-quantity-order revenue): parts of
      // one brand, rows whose quantity is under 0.2× that part's
      // average — the correlated-subquery shape DECORRELATED into a
      // part-grain threshold dim re-joined to the fact (what a good
      // optimizer does; declared directly here). The threshold test
      // is EXACT integer arithmetic: q < 0.2·(S/n) ⇔ 5·q·n < S on
      // integral quantities — no double-average boundary to ulp-flip.
      // Revenue in exact cents; brand prune broadcasts.
      val t = Tables(s, dir)
      val pk = broadcast(t.part.filter(col("p_brand") === "Brand#11")
        .select("p_partkey"))
      val li = t.lineitem.join(pk, col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"))
        .localCheckpoint() // feeds the threshold dim AND the probe side
      val th = li.groupBy("l_partkey").agg(
        sum(col("l_quantity")).cast("long").as("__s"),
        count(lit(1)).as("__n"))
      li.join(broadcast(th), "l_partkey")
        .filter(col("l_quantity").cast("long") * lit(5L) * col("__n") <
          col("__s"))
        .agg(coalesce(sum(round(col("l_extendedprice") * 100).cast("long")),
          lit(0L)).as("__c"))
        .select(round(col("__c").cast("double") / 700.0, 4).as("avg_yearly"))
    }),
    "q347_tpch_q18" -> ((s, dir) => {
      // F77 TPC-H Q18 shape (large-volume customers): orders whose
      // total quantity exceeds 300, with customer attach — the
      // classic "HAVING subquery as semi-join dim" shape; quantity
      // totals exact longs, total order (price desc, date, orderkey)
      // so the top-100 cut is deterministic on both engines
      val t = Tables(s, dir)
      val big = t.lineitem.groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).cast("long").as("total_qty"))
        .filter(col("total_qty") > 300L)
      t.orders.join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate"),
          col("o_orderkey"))
        .limit(100)
    }),
    "q157_winsorize" -> ((s, dir) => {
      // heavy-tail clamping report: exact interpolated [p10, p90] per
      // event_type (thresholds rounded 4dp on BOTH engines before
      // clamping), then the clipped-count and mean shift
      val t = Tables(s, dir)
      Rollups.winsorize(t.events, Seq("event_type"), "value")
    }),
    "q158_cube" -> ((s, dir) => {
      // full CUBE lattice over (returnflag, linestatus) with an
      // explicit grouping id — completes the subtotal family next to
      // ROLLUP (q51) and disjoint GROUPING SETS (q134); one pass
      val t = Tables(s, dir)
      t.lineitem.cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("sum_qty"),
          (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
            .cast("int").as("gid"))
    }),
    "q167_percent_rank" -> ((s, dir) => {
      // cross-source score calibration: percent_rank of document
      // length within each source. Rank-exact rationals computed at
      // VALUE grain — min-rank(v) = 1 + rows-below-v, from cumulative
      // counts over the distinct (source, n_chars) table — then joined
      // back, so no per-source corpus sort ever runs (few sources ×
      // full-partition sort is the q174 scale-killer shape)
      val t = Tables(s, dir)
      val vals = t.documents.groupBy("source", "n_chars")
        .agg(count(lit(1)).as("_vc"))
      // NULLS LAST to match DuckDB percent_rank's default ordering
      // (Spark asc defaults to nulls-first); the join back is
      // null-SAFE so NULL source / n_chars rows survive exactly as
      // the oracle's window semantics keep them
      val ordered = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("n_chars").asc_nulls_last)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val whole = org.apache.spark.sql.expressions.Window.partitionBy("source")
      val ranked = vals
        .withColumn("_below", sum(col("_vc")).over(ordered) - col("_vc"))
        .withColumn("_n", sum(col("_vc")).over(whole))
        .select(col("source").as("_rsource"), col("n_chars").as("_rn"),
          when(col("_n") > 1,
            round(col("_below").cast("double")
              / (col("_n") - 1).cast("double"), 4))
            .otherwise(lit(0.0)).as("pr"))
      val docs = t.documents.select("doc_id", "source", "n_chars")
      docs.join(ranked,
          docs("source") <=> col("_rsource") && docs("n_chars") <=> col("_rn"))
        .select("doc_id", "source", "n_chars", "pr")
    }),
    "q169_mad" -> ((s, dir) => {
      // robust outlier report per event type: exact median/MAD (4dp
      // before any arithmetic) + 3σ-equivalent robust-z count
      val t = Tables(s, dir)
      Rollups.madSummary(t.events, Seq("event_type"), "value")
    }),
    "q134_grouping_sets" -> ((s, dir) => {
      // disjoint grouping sets (l_returnflag), (l_linestatus) in one
      // pass: cube + grouping_id pruning — the Expand emits each row
      // once per surviving set, never one shuffle per dimension
      val t = Tables(s, dir)
      t.lineitem.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping_id().as("gid"))
        .filter(col("gid").isin(1, 2))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"), col("n"), col("gid").cast("int").as("gid"))
    }),
    "q131_mode" -> ((s, dir) => {
      // most frequent language per source: O(1)-state max(struct)
      // mode, deterministic greatest-value tie-break, no window
      val t = Tables(s, dir)
      Rollups.modePerKey(t.documents, Seq("source"), "lang")
    }),
    "q133_time_weighted" -> ((s, dir) => {
      // duration-weighted average event value per user (step-function
      // holding semantics); exact cents x whole-seconds integers
      val t = Tables(s, dir)
      EventWindows.timeWeightedAvg(t.events)
    }),
    "q130_skyline" -> ((s, dir) => {
      // Pareto frontier of parts (minimize retail price AND size):
      // lossless bucket-local pruning, then one tiny global pass —
      // the raw table is never globally sorted
      val t = Tables(s, dir)
      Rollups.skyline2d(t.part, "p_retailprice", "p_size")
    }),
    "q94_hist_quantiles" -> ((s, dir) => {
      // constant-state approximate quantiles: 1024-bin histogram per
      // event type (state independent of row count — q50's exact
      // percentile sorts every value), linear interpolation in-bin
      val t = Tables(s, dir)
      Rollups.histogramQuantiles(t.events, "value", Seq("event_type"),
        ps = Seq(0.5, 0.9, 0.99), lo = 0.0, hi = 400.0)
    }),
    "q51_rollup" -> ((s, dir) => {
      // ROLLUP subtotals over (datasourceId, year): per-source-year,
      // per-source, and grand-total rows in one pass
      val t = Tables(s, dir)
      t.evidence.rollup("datasourceId", "year")
        .agg(count(lit(1)).as("n"), round(sum("score"), 4).as("sum_score"))
    }),
    "q174_weighted_median" -> ((s, dir) => {
      // F19 exact weighted median: value at which cumulative props.k
      // weight crosses half the total — all-integer crossing test on
      // one (event_type) exchange, zero interpolation
      val t = Tables(s, dir)
      val ev = t.events.withColumn("k",
        get_json_object(col("props"), "$.k").cast("long"))
      Rollups.weightedQuantile(ev, Seq("event_type"), "value", "k", "event_id")
        .withColumn("wq_value", round(col("wq_value"), 4))
    }),
    "q187_ucb1" -> ((s, dir) => {
      // F23 UCB1 bandit index per event_type arm over `value` rewards
      // — one arm-grain combine; ln/sqrt only in the 6dp projection
      val t = Tables(s, dir)
      Rollups.ucbArms(t.events, "event_type", "value")
    }),
    "q189_basket_lift" -> ((s, dir) => {
      // F24 market-basket pair lift over order baskets: in-row pair
      // expansion bounded by basket width, TakeOrdered top-20
      val t = Tables(s, dir)
      Baskets.pairLift(t.lineitem, "l_orderkey", "l_partkey",
        k = 20, minSupport = 3)
    }),
    "q217_gini" -> ((s, dir) => {
      // F35 corpus mass concentration: how unequally is character
      // mass spread across documents?
      val t = Tables(s, dir)
      Rollups.giniConcentration(t.documents, "n_chars")
    }),
    "q242_triples" -> ((s, dir) => {
      // F44 bundle mining: top item triples by support, in-row
      // C(w,3) expansion on the collapsed baskets
      val t = Tables(s, dir)
      Baskets.tripleSupport(t.lineitem, "l_orderkey", "l_partkey")
    }),
    "q243_outliers" -> ((s, dir) => {
      // F45 robust outlier listing: the |modified z| > 3.5 rows per
      // event type — F17's dispersion summary turned into the triage
      // list
      val t = Tables(s, dir)
      Rollups.madOutliers(t.events, Seq("event_type"), "value", "event_id")
    }),
    "q231_item_cosine" -> ((s, dir) => {
      // F40 item-based CF similarity: cosine of part audiences from
      // order-basket co-occurrence, threshold on the rounded score
      val t = Tables(s, dir)
      Baskets.itemCosine(t.lineitem, "l_orderkey", "l_partkey",
        minCos = 0.1)
    }),
    "q201_benford" -> ((s, dir) => {
      // F28 Benford first-digit audit of extended prices — the
      // synthetic-data/fraud detector; digit from the integer-cent
      // decimal string, nine-row digit table
      val t = Tables(s, dir)
      Profile.benfordAudit(t.lineitem, "l_extendedprice")
    }),
    "q312_key_skew" -> ((s, dir) => {
      // I31 shuffle-key skew advisor: would keying a shuffle on
      // user_id skew it — Gini over the per-key row counts plus the
      // hottest key's share, the numbers I1/I2's salting decision
      // reads (F35's machinery pointed at the key-count table)
      val t = Tables(s, dir)
      val counts = t.events.filter(col("user_id").isNotNull)
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      Rollups.giniConcentration(counts, "n")
        .crossJoin(broadcast(counts.agg(max("n").as("__mx"))))
        .select(col("n").as("n_keys"), col("total").as("n_rows"), col("gini"),
          round(col("__mx").cast("double") / col("total"), 6)
            .as("top_key_share"))
    }),
    "q356_tpch_q21" -> ((s, dir) => {
      // F83 TPC-H Q21 shape (suppliers who kept orders waiting): the
      // notorious correlated EXISTS / NOT EXISTS pair DECORRELATED
      // into one supplier-order-grain dedup plus one order-grain
      // aggregate — EXISTS(another supplier) ⇔ ns >= 2, NOT
      // EXISTS(another LATE supplier) ⇔ nl = 1 for a late supplier's
      // own row. No Expand, no countDistinct, every shuffle on a
      // collapsed grain (the distinctCascade discipline). The
      // testdata carries no receipt/commit dates, so late :=
      // shipped > 60 days after the order date, and numwait counts
      // qualifying ORDERS (the collapsed grain), not lineitems.
      val t = Tables(s, dir)
      val l1 = t.lineitem
        .join(t.orders.filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
      val os = l1.groupBy("l_orderkey", "l_suppkey")
        .agg(max(when(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1L)
          .otherwise(0L)).as("__late"))
        .localCheckpoint() // feeds the order stats AND the probe side
      val st = os.groupBy("l_orderkey")
        .agg(count(lit(1)).as("__ns"), sum("__late").as("__nl"))
      val dim = broadcast(t.supplier
        .join(broadcast(t.nation.filter(col("n_name").like("NATION_1%"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name")))
      os.filter(col("__late") === 1L)
        .join(st, "l_orderkey")
        .filter(col("__ns") >= 2 && col("__nl") === 1L)
        .groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
        .join(dim, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(100)
    }),
    "q357_tpch_q20" -> ((s, dir) => {
      // F84 TPC-H Q20 shape (dominant part suppliers): the nested
      // IN-subquery semi-join chain — suppliers whose shipped share
      // of some 'red' part exceeds twice the part's average supplier
      // share (the testdata has no partsupp/availqty, so the
      // availability predicate becomes a share threshold; same
      // decorrelated sp-grain-vs-part-grain integer comparison, same
      // final LEFT SEMI into the supplier dim). sq·ns > 2·tq is pure
      // long arithmetic — no ratio boundary to ulp-flip.
      val t = Tables(s, dir)
      val pp = broadcast(t.part.filter(col("p_name").like("red %"))
        .select("p_partkey"))
      val ps = t.lineitem
        .join(pp, col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("l_quantity").cast("long")).as("__sq"))
        .localCheckpoint() // feeds the part totals AND the probe side
      val pt = ps.groupBy("l_partkey")
        .agg(sum("__sq").as("__tq"), count(lit(1)).as("__ns"))
      val qual = ps.join(pt, "l_partkey")
        .filter(col("__sq") * col("__ns") > col("__tq") * 2)
        .select("l_suppkey").distinct()
      t.supplier
        .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),
    "q366_tpch_q6" -> ((s, dir) => {
      // F93 TPC-H Q6 shape (forecast-revenue scan): the pure
      // predicate-pushdown query — date range + discount band +
      // quantity cap must all reach the parquet scan (no join at
      // all); cents-exact one-row revenue.
      val t = Tables(s, dir)
      t.lineitem
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(coalesce(sum(round(col("l_extendedprice") * col("l_discount")
          * 100).cast("long")), lit(0L)).as("__c"))
        .select(round(col("__c").cast("double") / 100, 2).as("revenue"))
    }),
    "q367_tpch_q15" -> ((s, dir) => {
      // F94 TPC-H Q15 shape (top supplier view): supplier-grain
      // quarter revenue, the scalar max as a ONE-ROW broadcast, the
      // winners picked by EXACT long-cents equality (ties all kept,
      // as the spec requires), supplier dim broadcast-joined last.
      val t = Tables(s, dir)
      val rev = t.lineitem
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100).cast("long")).as("__c"))
        .localCheckpoint() // feeds the max scalar AND the winner filter
      rev.crossJoin(broadcast(rev.agg(max("__c").as("__mx"))))
        .filter(col("__c") === col("__mx"))
        .join(broadcast(t.supplier.select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("__c").cast("double") / 100, 2).as("total_revenue"))
        .orderBy("s_suppkey")
    }),
    "q358_tpch_q4" -> ((s, dir) => {
      // F85 TPC-H Q4 shape (order-priority checking): the correlated
      // EXISTS(late lineitem) as ONE LEFT SEMI join carrying the equi
      // orderkey conjunct plus the cross-side lateness predicate —
      // hash-partitionable, no decorrelation pass needed. late :=
      // shipped >60 days after the order date (the q356 convention;
      // no commit/receipt dates in the testdata).
      val t = Tables(s, dir)
      t.orders
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .join(t.lineitem.select("l_orderkey", "l_shipdate"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),
    "q359_tpch_q7" -> ((s, dir) => {
      // F86 TPC-H Q7 shape (volume shipping between two nations, both
      // directions, by ship year): nation prune lands on the DIMS
      // before any fact join (supplier list broadcast; customer side
      // semi-pruned by the broadcast two-nation dim), cents-exact
      // revenue, one (nation-pair, year) combine.
      val t = Tables(s, dir)
      val nn = broadcast(t.nation
        .filter(col("n_name").like("NATION_1%")))
      val sup = broadcast(t.supplier
        .join(nn, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation")))
      val cus = t.customer
        .join(nn, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100).cast("long")
      t.lineitem
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(t.orders.select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cus, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(cents).as("__c"))
        .select(col("supp_nation"), col("cust_nation"), col("l_year"),
          round(col("__c").cast("double") / 100, 2).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),
    "q360_tpch_q8" -> ((s, dir) => {
      // F87 TPC-H Q8 shape (national market share): PROMO-part volume
      // sold to ASIA customers by order year; share = NATION_2 cents
      // over all cents — exact-long numerator/denominator, ONE double
      // division at the final projection. Region membership is a
      // broadcast semi-join below the fact chain.
      val t = Tables(s, dir)
      val pp = broadcast(t.part.filter(col("p_type") === "PROMO")
        .select("p_partkey"))
      val asia = broadcast(t.nation
        .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("__cnk")))
      val sup = broadcast(t.supplier
        .join(broadcast(t.nation.select(col("n_nationkey").as("__snk"),
          col("n_name"))), col("s_nationkey") === col("__snk"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation")))
      val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100).cast("long")
      t.lineitem
        .join(pp, col("l_partkey") === col("p_partkey"))
        .join(t.orders.select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t.customer.select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(asia, col("c_nationkey") === col("__cnk"), "left_semi")
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_2", cents).otherwise(0L))
            .as("__num"),
          sum(cents).as("__den"))
        .select(col("o_year"),
          round(col("__num").cast("double") / col("__den"), 4).as("mkt_share"))
        .orderBy("o_year")
    }),
    "q361_tpch_q10" -> ((s, dir) => {
      // F88 TPC-H Q10 shape (returned-item reporting): the fact
      // collapses to customer grain BEFORE the customer/nation dims
      // attach (aggregate-then-join, never the reverse); top-20 by
      // revenue with the custkey tie-break.
      val t = Tables(s, dir)
      val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100).cast("long")
      t.lineitem.filter(col("l_returnflag") === "R")
        .join(t.orders
          .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey").agg(sum(cents).as("__c"))
        .join(t.customer.select("c_custkey", "c_name", "c_acctbal",
          "c_nationkey"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation.select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"),
          round(col("__c").cast("double") / 100, 2).as("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
    }),
    "q362_tpch_q13" -> ((s, dir) => {
      // F89 TPC-H Q13 shape (customer order-count distribution): LEFT
      // join so zero-order customers survive with c_count 0, then the
      // two-level count-of-counts; the o_comment NOT LIKE exclusion
      // becomes an order-priority exclusion (no comment column).
      val t = Tables(s, dir)
      t.customer.select("c_custkey")
        .join(t.orders.filter(!col("o_orderpriority").startsWith("4"))
          .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey").agg(count(col("o_custkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),
    "q363_tpch_q14" -> ((s, dir) => {
      // F90 TPC-H Q14 shape (promo revenue share for one month):
      // conditional-vs-total cents in ONE aggregate, one double
      // division; the part type dim broadcasts.
      val t = Tables(s, dir)
      val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100).cast("long")
      t.lineitem
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(broadcast(t.part.select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", cents).otherwise(0L)).as("__n"),
          sum(cents).as("__d"))
        .select(round(col("__n").cast("double") * 100 / col("__d"), 4)
          .as("promo_revenue"))
    }),
    "q364_tpch_q19" -> ((s, dir) => {
      // F91 TPC-H Q19 shape (three OR'd brand/size/quantity conjunct
      // groups): the partkey equi key survives as the join key with
      // the disjunction evaluated post-join — the classic CNF-
      // extraction test; one-row cents-exact revenue.
      val t = Tables(s, dir)
      val cents = round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100).cast("long")
      t.lineitem
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"))
        .join(broadcast(t.part.select("p_partkey", "p_brand", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(coalesce(sum(cents), lit(0L)).as("__c"))
        .select(round(col("__c").cast("double") / 100, 2).as("revenue"))
    }),
    "q365_tpch_q22" -> ((s, dir) => {
      // F92 TPC-H Q22 shape (global-average anti-join): positive-
      // balance customers above the positive average — the scalar
      // subquery as a one-row broadcast, compared in EXACT integer
      // cents (c_cents·n > Σcents: no double-average boundary to
      // ulp-flip) — with NO order since 2000 (LEFT ANTI; the
      // testdata's order history is dense, so the faithful
      // "never ordered" set is empty), grouped by nation.
      val t = Tables(s, dir)
      val cbal = round(col("c_acctbal") * 100).cast("long")
      val avgPos = broadcast(t.customer.filter(col("c_acctbal") > 0)
        .agg(sum(cbal).as("__s"), count(lit(1)).as("__n")))
      t.customer
        .crossJoin(avgPos)
        .filter(cbal * col("__n") > col("__s"))
        .join(t.orders
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(t.nation.select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("numcust"),
          round(sum(cbal).cast("double") / 100, 2).as("totacctbal"))
        .orderBy("n_name")
    }),
    "q368_tpch_q2" -> ((s, dir) => {
      // F95 TPC-H Q2 shape (minimum-cost supplier): the correlated
      // min-cost subquery DECORRELATED into a part-grain min dim
      // joined back by EXACT long-cents equality (ties all kept, as
      // the spec requires). No partsupp in the testdata, so the
      // supply relation derives from lineitem at (part, supplier)
      // grain with unit cost := min observed cents price; the region
      // predicate rides the broadcast supplier→nation→region dim.
      val t = Tables(s, dir)
      val cost = round(col("l_extendedprice") / col("l_quantity") * 100)
        .cast("long")
      val supply = t.lineitem.filter(col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey").agg(min(cost).as("__c"))
      val pp = broadcast(t.part
        .filter(col("p_size") === 15 && col("p_name").like("% bolt"))
        .select("p_partkey", "p_name"))
      val sd = broadcast(t.supplier
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region.filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name")))
      val qual = supply
        .join(pp, col("l_partkey") === col("p_partkey"))
        .join(sd, col("l_suppkey") === col("s_suppkey"))
        .localCheckpoint() // feeds the per-part min AND the winner filter
      val mn = qual.groupBy("p_partkey").agg(min("__c").as("__mn"))
      qual.join(mn, Seq("p_partkey"))
        .filter(col("__c") === col("__mn"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"),
          round(col("__c").cast("double") / 100, 2).as("supply_cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),
    "q369_tpch_q9" -> ((s, dir) => {
      // F96 TPC-H Q9 shape (product-type profit): the 5-way
      // multi-join with the LIKE prune pushed into a broadcast part
      // dim; profit in EXACT cents (revenue cents − cost cents;
      // p_retailprice stands in for the absent ps_supplycost as the
      // unit cost), grouped by supplier nation × order year. One
      // shuffle join (orders), everything else broadcast.
      val t = Tables(s, dir)
      val pp = broadcast(t.part.filter(col("p_name").like("%gear"))
        .select("p_partkey", "p_retailprice"))
      val sd = broadcast(t.supplier
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation")))
      val rev = round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100).cast("long")
      val cst = round(col("p_retailprice") * col("l_quantity") * 100)
        .cast("long")
      t.lineitem
        .join(pp, col("l_partkey") === col("p_partkey"))
        .join(sd, col("l_suppkey") === col("s_suppkey"))
        .join(t.orders.select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(rev - cst).as("__p"))
        .select(col("nation"), col("o_year"),
          round(col("__p").cast("double") / 100, 2).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),
    "q370_tpch_q11" -> ((s, dir) => {
      // F97 TPC-H Q11 shape (important stock): per-part value held
      // by one nation's suppliers vs the GLOBAL scalar total — the
      // HAVING share threshold as pure long arithmetic (value·n >
      // 2·total ⇔ share > 2× the average share — scale-invariant
      // where the spec's 0.0001/SF fraction is not), the one-row
      // total broadcast.
      val t = Tables(s, dir)
      val sd = broadcast(t.supplier
        .join(broadcast(t.nation.filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey"))
      val pv = t.lineitem
        .join(sd, col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("__v"))
        .localCheckpoint() // feeds the global total AND the HAVING filter
      pv.crossJoin(broadcast(pv.agg(sum("__v").as("__t"),
          count(lit(1)).as("__n"))))
        .filter(col("__v") * col("__n") > col("__t") * 2)
        .select(col("l_partkey").as("p_partkey"),
          round(col("__v").cast("double") / 100, 2).as("stock_value"))
        .orderBy(col("stock_value").desc, col("p_partkey"))
    }),
    "q371_tpch_q12" -> ((s, dir) => {
      // F98 TPC-H Q12 shape (shipping-priority buckets): the
      // two-bucket conditional aggregation — per mode (l_returnflag
      // stands in for the absent l_shipmode), count late-shipped
      // 1996 lineitems on high- vs low-priority orders; ONE shuffle
      // join on orderkey carrying the equi conjunct + the cross-side
      // lateness predicate (the q358 convention), CASE buckets fold
      // map-side.
      val t = Tables(s, dir)
      val hi = when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
        .otherwise(0L)
      t.lineitem
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(t.orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(sum(hi).as("high_line_count"),
          sum(lit(1L) - hi).as("low_line_count"))
        .orderBy("l_returnflag")
    }),
    "q372_tpch_q16" -> ((s, dir) => {
      // F99 TPC-H Q16 shape (parts/supplier relationship): NOT-IN
      // complaint suppliers as a broadcast ANTI join (negative
      // acctbal stands in for the absent comment scan), supply pairs
      // from lineitem (no partsupp), and the supplier count via the
      // distinctCascade discipline — dedup at (brand, type, size,
      // supplier) grain, then a plain count. No Expand, no
      // countDistinct.
      val t = Tables(s, dir)
      val pp = broadcast(t.part
        .filter(col("p_brand") =!= "Brand#1" &&
          !col("p_name").like("red %") &&
          col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 23))
        .select("p_partkey", "p_brand", "p_type", "p_size"))
      val bad = broadcast(t.supplier.filter(col("s_acctbal") < 0)
        .select("s_suppkey"))
      t.lineitem.select("l_partkey", "l_suppkey")
        .join(pp, col("l_partkey") === col("p_partkey"))
        .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .select("p_brand", "p_type", "p_size", "l_suppkey").distinct()
        .groupBy("p_brand", "p_type", "p_size")
        .agg(count(lit(1)).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
        .limit(100)
    }),
  )

  val oracles: Seq[(String, String)] = Seq(
    // Q17 replay: same decorrelated threshold dim; the 5·q·n < S test
    // is pure integer; cents sum exact; null-empty case coalesced on
    // both sides.
    "q346_tpch_q17" ->
      """WITH pk AS (
        |  SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'
        |),
        |li AS (
        |  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        |  FROM lineitem l JOIN pk ON l.l_partkey = pk.p_partkey
        |),
        |th AS (
        |  SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS s,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM li GROUP BY 1
        |),
        |f AS (
        |  SELECT li.l_extendedprice
        |  FROM li JOIN th USING (l_partkey)
        |  WHERE CAST(li.l_quantity AS BIGINT) * 5 * th.n < th.s
        |),
        |c AS (
        |  SELECT coalesce(CAST(sum(CAST(round(l_extendedprice * 100)
        |    AS BIGINT)) AS BIGINT), 0) AS c
        |  FROM f
        |)
        |SELECT round(CAST(c AS DOUBLE) / 700.0, 4) AS avg_yearly FROM c""".stripMargin,
    // Q18 replay: quantity totals exact longs; identical total order
    // under the top-100 cut.
    "q347_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300
        |)
        |SELECT c.c_name, c.c_custkey, o.o_orderkey,
        |       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |       o.o_totalprice, b.total_qty
        |FROM orders o
        |JOIN big b ON o.o_orderkey = b.l_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_totalprice DESC, o_orderdate, o.o_orderkey
        |LIMIT 100""".stripMargin,
    "q20_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2""".stripMargin,
    "q21_join_topk" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, revenue FROM (
        |  SELECT o_orderkey, o_orderdate,
        |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |  FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE c_mktsegment = 'BUILDING'
        |  GROUP BY 1, 2
        |) ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q22_asof" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_type FROM events
        |),
        |clicks AS (
        |  SELECT user_id, ts, max(event_id) AS click_event_id
        |  FROM ev WHERE event_type = 'click' GROUP BY 1, 2
        |),
        |purchases AS (SELECT event_id, user_id, ts, value FROM ev WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.value, c.click_event_id,
        |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM purchases p
        |ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,
    "q50_percentiles" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 4) AS p50,
        |       round(quantile_cont(value, 0.9), 4) AS p90,
        |       round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type""".stripMargin,
    "q51_rollup" ->
      s"""WITH $EvSql
         |SELECT datasourceId, year, CAST(count(*) AS BIGINT) AS n,
         |       round(sum(score), 4) AS sum_score
         |FROM ev GROUP BY ROLLUP (datasourceId, year)""".stripMargin,
    // Range-join replay: a plain SQL interval predicate — the binned
    // reformulation must be exactly equivalent.,
    "q48_range_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
        |),
        |clicks AS (
        |  SELECT user_id, event_id AS click_id, ts FROM ev WHERE event_type = 'click'
        |),
        |purchases AS (
        |  SELECT user_id, event_id AS purchase_id, ts AS p_start,
        |         ts + INTERVAL 2 HOUR AS p_end
        |  FROM ev WHERE event_type = 'purchase'
        |)
        |SELECT c.user_id, c.click_id, p.purchase_id,
        |       CAST(epoch_us(c.ts) - epoch_us(p.p_start) AS BIGINT) AS gap_us
        |FROM clicks c JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts >= p.p_start AND c.ts <= p.p_end""".stripMargin,
    // TPC-H Q3 replay (adapted: no shippriority column in this
    // schema; date bracket around one cutoff).
    // Q5 replay: same joins, same per-row cent quantization.,
    "q327_tpch_q5" ->
      """SELECT n.n_name,
        |       round(CAST(sum(CAST(round(l.l_extendedprice
        |                 * (1 - l.l_discount) * 100) AS BIGINT)) AS DOUBLE)
        |             / 100, 2) AS revenue
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |             AND s.s_nationkey = c.c_nationkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin,
    "q102_tpch_q3" ->
      """SELECT l.l_orderkey,
        |       strftime(CAST(o.o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS o_date,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l.l_shipdate > TIMESTAMP '1997-06-01'
        |GROUP BY l.l_orderkey, o.o_orderdate
        |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin,
    "q167_percent_rank" ->
      """SELECT doc_id, source, n_chars,
        |       round(percent_rank() OVER (
        |         PARTITION BY source ORDER BY n_chars), 4) AS pr
        |FROM documents""".stripMargin,
    "q169_mad" ->
      """WITH med AS (
        |  SELECT event_type, round(quantile_cont(value, 0.5), 4) AS median
        |  FROM events GROUP BY 1
        |),
        |dev AS (
        |  SELECT e.event_type, e.value, m.median,
        |         abs(e.value - m.median) AS ad
        |  FROM events e JOIN med m USING (event_type)
        |),
        |md AS (
        |  SELECT event_type, round(quantile_cont(ad, 0.5), 4) AS mad
        |  FROM dev GROUP BY 1
        |)
        |SELECT d.event_type, any_value(d.median) AS median,
        |       any_value(m.mad) AS mad,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(CASE WHEN d.ad > 3.0 * 1.4826 * m.mad THEN 1 END)
        |         AS BIGINT) AS n_outliers
        |FROM dev d JOIN md m USING (event_type)
        |GROUP BY 1""".stripMargin,
    "q158_cube" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q157_winsorize" ->
      """WITH th AS (
        |  SELECT event_type, round(quantile_cont(value, 0.1), 4) AS lo_th,
        |         round(quantile_cont(value, 0.9), 4) AS hi_th
        |  FROM events GROUP BY 1
        |)
        |SELECT e.event_type, any_value(lo_th) AS lo_th, any_value(hi_th) AS hi_th,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(CASE WHEN value < lo_th OR value > hi_th THEN 1 END) AS BIGINT) AS n_clipped,
        |       round(avg(value), 4) AS mean_raw,
        |       round(avg(least(greatest(value, lo_th), hi_th)), 4) AS mean_wins
        |FROM events e JOIN th USING (event_type)
        |GROUP BY 1""".stripMargin,
    "q134_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,
    "q131_mode" ->
      """WITH c AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2
        |),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY n DESC, lang DESC) AS rk
        |  FROM c
        |)
        |SELECT source, lang AS mode_lang, n FROM r WHERE rk = 1""".stripMargin,
    "q133_time_weighted" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS v_i
        |  FROM events
        |),
        |n AS (
        |  SELECT *, lead(us) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id) AS next_us
        |  FROM e
        |),
        |d AS (
        |  SELECT user_id, v_i, (next_us - us) // 1000000 AS dur_s
        |  FROM n WHERE next_us IS NOT NULL
        |),
        |a AS (
        |  SELECT user_id, CAST(sum(dur_s) AS BIGINT) AS total_s,
        |         CAST(sum(v_i * dur_s) AS BIGINT) AS ws
        |  FROM d GROUP BY 1
        |)
        |SELECT user_id, total_s,
        |       round(CAST(ws AS DOUBLE) / total_s / 100, 4) AS twa
        |FROM a WHERE total_s > 0""".stripMargin,
    "q130_skyline" ->
      """WITH pts AS (
        |  SELECT p_retailprice AS x, p_size AS y, CAST(count(*) AS BIGINT) AS n
        |  FROM part GROUP BY 1, 2
        |)
        |SELECT x, y, n FROM pts p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts q
        |  WHERE q.x <= p.x AND q.y <= p.y AND (q.x < p.x OR q.y < p.y)
        |)""".stripMargin,
    // Histogram-quantile replay: same fixed-width binning (width
    // 400/1024 = 0.390625, exactly representable), same cumulative
    // crossing rule and in-bin interpolation over integer counts.,
    "q94_hist_quantiles" ->
      """WITH b AS (
        |  SELECT event_type,
        |         least(greatest(CAST(floor(value / (400.0 / 1024)) AS BIGINT), 0), 1023) AS bin
        |  FROM events
        |),
        |c AS (SELECT event_type, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
        |cc AS (
        |  SELECT event_type, bin, cnt,
        |         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        |         sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM c
        |),
        |ps AS (SELECT unnest([0.5, 0.9, 0.99]) AS p),
        |j AS (SELECT cc.*, ps.p, ps.p * cc.n AS t FROM cc CROSS JOIN ps)
        |SELECT event_type, p,
        |       round((bin + (t - (cum - cnt)) / cnt) * (400.0 / 1024), 4) AS qest
        |FROM j WHERE cum >= t AND (cum - cnt) < t""".stripMargin,
    // Poisson-bootstrap replay: same 24-bit md5 bucket, same integer
    // inverse-CDF thresholds, exact long cents — every resample mean
    // is a ratio of identical longs, so quantile_cont and Spark's
    // percentile interpolate the same doubles (4dp-rounded outputs).,
    "q174_weighted_median" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, value,
        |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events WHERE value IS NOT NULL
        |),
        |c AS (
        |  SELECT event_type, value, event_id, k,
        |         CAST(sum(k) OVER (PARTITION BY event_type
        |           ORDER BY value, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           AS cw,
        |         CAST(sum(k) OVER (PARTITION BY event_type) AS BIGINT) AS tw
        |  FROM ev WHERE k > 0
        |)
        |SELECT event_type, CAST(min(tw) AS BIGINT) AS total_w,
        |       CAST(count(*) AS BIGINT) AS n_at_or_above,
        |       round(arg_min(value, cw), 4) AS wq_value
        |FROM c WHERE cw * 2 >= tw * 1 GROUP BY 1""".stripMargin,
    // MI replay: same cast-then-multiply ratio order per cell; the
    // total sums 6dp-rounded contributions, so window order is moot.,
    "q187_ucb1" ->
      """WITH a AS (
        |  SELECT event_type AS arm, CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(round(value * 100) AS BIGINT)) AS c
        |  FROM events WHERE value IS NOT NULL GROUP BY 1
        |),
        |t AS (SELECT a.*, sum(n) OVER () AS total_n FROM a),
        |s AS (
        |  SELECT arm, n, CAST(total_n AS BIGINT) AS total_n,
        |         round(CAST(c AS DOUBLE) / n / 100.0, 4) AS mean_reward,
        |         round(sqrt(2.0 * ln(CAST(total_n AS DOUBLE)) / n), 6) AS bonus
        |  FROM t
        |)
        |SELECT arm, n, total_n, mean_reward, bonus,
        |       round(mean_reward + bonus, 6) AS ucb,
        |       CAST(rank() OVER (ORDER BY round(mean_reward + bonus, 6) DESC, arm)
        |            AS BIGINT) AS rank
        |FROM s""".stripMargin,
    // Basket-lift replay: pairs via a basket-keyed self-join instead
    // of Spark's in-row expansion — same exact counts either way; the
    // top-20 cut orders by the ROUNDED lift with (a, b) tie-break.,
    "q189_basket_lift" ->
      """WITH b AS (
        |  SELECT l_orderkey AS bk, l_partkey AS it FROM lineitem GROUP BY 1, 2
        |),
        |p AS (
        |  SELECT x.it AS a, y.it AS b, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it GROUP BY 1, 2
        |),
        |m AS (SELECT it, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1),
        |t AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS nb FROM b)
        |SELECT p.a, p.b, p.n_ab,
        |       round(CAST(p.n_ab AS DOUBLE) * t.nb / (ma.n * mb.n), 4) AS lift
        |FROM p JOIN m ma ON ma.it = p.a JOIN m mb ON mb.it = p.b CROSS JOIN t
        |WHERE p.n_ab >= 3
        |ORDER BY lift DESC, p.a, p.b LIMIT 20""".stripMargin,
    // KS replay: same cents grain, all-long CDF gap |F1·n2 − F2·n1|,
    // identical double-op order for d/λ/p before the 4dp rounds.,
    "q201_benford" ->
      """WITH c AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND CAST(round(l_extendedprice * 100) AS BIGINT) > 0
        |),
        |g AS (
        |  SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM c GROUP BY 1
        |),
        |w AS (
        |  SELECT digit, n, CAST(sum(n) OVER () AS BIGINT) AS total FROM g
        |),
        |e AS (
        |  SELECT digit, n, total,
        |         round(CAST(n AS DOUBLE) / total, 4) AS p_obs,
        |         round(log10(1.0 + 1.0 / digit), 4) AS p_exp,
        |         round((CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * log10(1.0 + 1.0 / digit))
        |               * (CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * log10(1.0 + 1.0 / digit))
        |               / (CAST(total AS DOUBLE) * log10(1.0 + 1.0 / digit)), 6) AS contrib
        |  FROM w
        |)
        |SELECT digit, n, p_obs, p_exp, contrib,
        |       round(sum(contrib) OVER (), 4) AS chi2
        |FROM e""".stripMargin,
    // Matrix replay: HUGEINT moment sums (≡ Spark's decimal(38,0)),
    // listwise deletion, one r expression per pair.,
    "q217_gini" ->
      """WITH p AS (
        |  SELECT CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars >= 0
        |  GROUP BY 1
        |),
        |r AS (
        |  SELECT v, c,
        |         sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c AS cb
        |  FROM p
        |),
        |s AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |         sum(CAST(v AS HUGEINT) * CAST(c AS HUGEINT)) AS t,
        |         sum(CAST(v AS HUGEINT) * (CAST(c AS HUGEINT) * CAST(cb AS HUGEINT)
        |             + CAST((c * (c + 1)) // 2 AS HUGEINT))) AS s2
        |  FROM r
        |)
        |SELECT n, CAST(t AS BIGINT) AS total,
        |       round((2.0 * CAST(s2 AS DOUBLE) - CAST(n + 1 AS DOUBLE) * CAST(t AS DOUBLE))
        |             / CASE WHEN n = 0 OR t = 0 THEN NULL
        |                    ELSE CAST(n AS DOUBLE) * CAST(t AS DOUBLE) END, 4) AS gini
        |FROM s""".stripMargin,
    // OLS replay: same exact HUGEINT cent moments, same Cramer
    // determinant expressions in identical double op order.,
    "q231_item_cosine" ->
      """WITH baskets AS (
        |  SELECT l_orderkey AS bk, list_sort(list_distinct(list(l_partkey))) AS items
        |  FROM lineitem GROUP BY 1
        |),
        |pairs AS (
        |  SELECT p.a AS a, p.b AS b, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM (
        |    SELECT unnest(flatten(list_transform(items, (x, i) ->
        |             list_transform(items[i+1:], y -> struct_pack(a := x, b := y))))) AS p
        |    FROM baskets
        |  )
        |  GROUP BY 1, 2
        |),
        |items_n AS (
        |  SELECT it, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(items) AS it FROM baskets) GROUP BY 1
        |)
        |SELECT p.a, p.b, p.n_ab,
        |       round(CAST(p.n_ab AS DOUBLE) / sqrt(CAST(ia.n AS DOUBLE) * CAST(ib.n AS DOUBLE)), 4) AS cos
        |FROM pairs p
        |JOIN items_n ia ON ia.it = p.a
        |JOIN items_n ib ON ib.it = p.b
        |WHERE p.n_ab >= 3
        |  AND round(CAST(p.n_ab AS DOUBLE) / sqrt(CAST(ia.n AS DOUBLE) * CAST(ib.n AS DOUBLE)), 4) >= 0.1""".stripMargin,
    // SRM replay: pmod parity arms, identical chi-square op order,
    // flag on the 4dp-rounded statistic.,
    "q242_triples" ->
      """WITH baskets AS (
        |  SELECT l_orderkey AS bk, list_sort(list_distinct(list(l_partkey))) AS items
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT t.a AS a, t.b AS b, t.c AS c, CAST(count(*) AS BIGINT) AS n_abc
        |FROM (
        |  SELECT unnest(flatten(list_transform(items, (x, i) ->
        |           flatten(list_transform(items[i+1:], (y, j) ->
        |             list_transform(items[i+j+1:],
        |               z -> struct_pack(a := x, b := y, c := z))))))) AS t
        |  FROM baskets
        |)
        |GROUP BY 1, 2, 3 HAVING count(*) >= 2
        |ORDER BY n_abc DESC, a, b, c LIMIT 20""".stripMargin,
    // Outlier replay: 4dp-published median/MAD thresholds, modified z
    // against integer cents, keep test on the rounded value.,
    "q243_outliers" ->
      """WITH b AS (
        |  SELECT event_type, event_id, CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL
        |),
        |m AS (SELECT event_type, round(quantile_cont(c, 0.5), 4) AS med FROM b GROUP BY 1),
        |md AS (
        |  SELECT b.event_type,
        |         round(quantile_cont(abs(CAST(c AS DOUBLE) - med), 0.5), 4) AS mad
        |  FROM b JOIN m USING (event_type) GROUP BY 1
        |)
        |SELECT b.event_type, b.event_id,
        |       round(CAST(c AS DOUBLE) / 100.0, 4) AS value,
        |       round(0.6745 * (CAST(c AS DOUBLE) - med) / mad, 4) AS mz
        |FROM b JOIN m USING (event_type) JOIN md USING (event_type)
        |WHERE mad > 0
        |  AND abs(round(0.6745 * (CAST(c AS DOUBLE) - med) / mad, 4)) > 3.5""".stripMargin,
    // CUPED replay: same cutoff frame, HUGEINT moments, identical
    // theta/adjustment/variance expressions in the same op order.,
    "q312_key_skew" ->
      """WITH k AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1
        |),
        |p AS (
        |  SELECT CAST(n AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM k WHERE n IS NOT NULL AND n >= 0 GROUP BY 1
        |),
        |r AS (
        |  SELECT v, c,
        |         sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c AS cb
        |  FROM p
        |),
        |s AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |         sum(CAST(v AS HUGEINT) * CAST(c AS HUGEINT)) AS t,
        |         sum(CAST(v AS HUGEINT) * (CAST(c AS HUGEINT) * CAST(cb AS HUGEINT)
        |             + CAST((c * (c + 1)) // 2 AS HUGEINT))) AS s2
        |  FROM r
        |),
        |mx AS (SELECT CAST(max(n) AS BIGINT) AS mx FROM k)
        |SELECT s.n AS n_keys, CAST(s.t AS BIGINT) AS n_rows,
        |       round((2.0 * CAST(s.s2 AS DOUBLE) - CAST(s.n + 1 AS DOUBLE) * CAST(s.t AS DOUBLE))
        |             / CASE WHEN s.n = 0 OR s.t = 0 THEN NULL
        |                    ELSE CAST(s.n AS DOUBLE) * CAST(s.t AS DOUBLE) END, 4) AS gini,
        |       round(CAST(mx.mx AS DOUBLE) / CAST(s.t AS BIGINT), 6) AS top_key_share
        |FROM s, mx""".stripMargin,
    // Newcombe replay: per-arm Wilson bounds with the same written
    // order as q300, hybrid combination, 4dp.,
    // Q21 replay: same decorrelation — supplier-order dedup (os,
    // MATERIALIZED: read by the order stats and the probe), order
    // stats, qualifying orders counted per supplier, nation-filtered
    // dim join, deterministic (numwait DESC, s_name) top-100.
    "q356_tpch_q21" ->
      """WITH l1 AS (
        |  SELECT l.l_orderkey, l.l_suppkey,
        |         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |              THEN 1 ELSE 0 END AS late
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F'
        |),
        |os AS MATERIALIZED (
        |  SELECT l_orderkey, l_suppkey, max(late) AS late
        |  FROM l1 GROUP BY 1, 2
        |),
        |st AS (
        |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS ns,
        |         CAST(sum(late) AS BIGINT) AS nl
        |  FROM os GROUP BY 1
        |),
        |w AS (
        |  SELECT os.l_suppkey, CAST(count(*) AS BIGINT) AS numwait
        |  FROM os JOIN st USING (l_orderkey)
        |  WHERE os.late = 1 AND st.ns >= 2 AND st.nl = 1
        |  GROUP BY 1
        |)
        |SELECT s.s_name, w.numwait
        |FROM w
        |JOIN supplier s ON s.s_suppkey = w.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE n.n_name LIKE 'NATION_1%'
        |ORDER BY w.numwait DESC, s.s_name LIMIT 100""".stripMargin,
    // Q20 replay: ps MATERIALIZED (read by part totals and probe);
    // the share test is the same pure-long sq*ns > 2*tq.
    "q357_tpch_q20" ->
      """WITH pp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red %'),
        |ps AS MATERIALIZED (
        |  SELECT l_partkey, l_suppkey,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
        |  FROM lineitem JOIN pp ON l_partkey = p_partkey
        |  GROUP BY 1, 2
        |),
        |pt AS (
        |  SELECT l_partkey, CAST(sum(sq) AS BIGINT) AS tq,
        |         CAST(count(*) AS BIGINT) AS ns
        |  FROM ps GROUP BY 1
        |),
        |qual AS (
        |  SELECT DISTINCT ps.l_suppkey
        |  FROM ps JOIN pt USING (l_partkey)
        |  WHERE ps.sq * pt.ns > pt.tq * 2
        |)
        |SELECT s.s_suppkey, s.s_name
        |FROM supplier s JOIN qual q ON s.s_suppkey = q.l_suppkey
        |ORDER BY s.s_suppkey""".stripMargin,
    // Q6 replay: the bare predicate scan, cents-exact.
    "q366_tpch_q6" ->
      """SELECT round(coalesce(CAST(sum(CAST(round(l_extendedprice * l_discount * 100)
        |         AS BIGINT)) AS BIGINT), 0) / 100.0, 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    // Q15 replay: the revenue view (rev, MATERIALIZED: read by the
    // max scalar and the winner filter), exact-cents max equality.
    "q367_tpch_q15" ->
      """WITH rev AS MATERIALIZED (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |           AS BIGINT)) AS BIGINT) AS c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1
        |)
        |SELECT s.s_suppkey, s.s_name, round(rev.c / 100.0, 2) AS total_revenue
        |FROM rev
        |JOIN supplier s ON s.s_suppkey = rev.l_suppkey
        |WHERE rev.c = (SELECT max(c) FROM rev)
        |ORDER BY s.s_suppkey""".stripMargin,
    // Q4 replay: the same EXISTS, correlated form (DuckDB decorrelates
    // it itself); identical 60-day lateness convention.
    "q358_tpch_q4" ->
      """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Q7 replay: plain five-way join, same cents-exact revenue.
    "q359_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l.l_shipdate) AS INT) AS l_year,
        |       round(CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
        |         AS BIGINT)) AS BIGINT) / 100.0, 2) AS revenue
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01'
        |  AND n1.n_name LIKE 'NATION_1%'
        |  AND n2.n_name LIKE 'NATION_1%'
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // Q8 replay: exact-long numerator/denominator, one 4dp division.
    "q360_tpch_q8" ->
      """SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
        |       round(CAST(sum(CASE WHEN ns.n_name = 'NATION_2'
        |               THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
        |               ELSE 0 END) AS BIGINT)
        |         / CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
        |               AS BIGINT)) AS DOUBLE), 4) AS mkt_share
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        |JOIN region r ON nc.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation ns ON s.s_nationkey = ns.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Q10 replay: customer-grain revenue collapse, dims, top-20 with
    // the custkey tie-break.
    "q361_tpch_q10" ->
      """WITH rev AS (
        |  SELECT o.o_custkey,
        |         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
        |           AS BIGINT)) AS BIGINT) AS c
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_returnflag = 'R'
        |    AND o.o_orderdate >= TIMESTAMP '1996-07-01'
        |    AND o.o_orderdate < TIMESTAMP '1996-10-01'
        |  GROUP BY 1
        |)
        |SELECT c.c_custkey, c.c_name, round(rev.c / 100.0, 2) AS revenue,
        |       c.c_acctbal, n.n_name
        |FROM rev
        |JOIN customer c ON rev.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |ORDER BY revenue DESC, c.c_custkey LIMIT 20""".stripMargin,
    // Q13 replay: LEFT JOIN + count-of-counts; priority exclusion
    // stands in for the o_comment filter.
    "q362_tpch_q13" ->
      """WITH co AS (
        |  SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS c_count
        |  FROM customer c
        |  LEFT JOIN (SELECT o_custkey FROM orders
        |             WHERE o_orderpriority NOT LIKE '4%') o
        |    ON c.c_custkey = o.o_custkey
        |  GROUP BY 1
        |)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM co GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // Q14 replay: conditional-vs-total cents, one 4dp division.
    "q363_tpch_q14" ->
      """SELECT round(CAST(sum(CASE WHEN p.p_type = 'PROMO'
        |         THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
        |         ELSE 0 END) AS BIGINT) * 100
        |       / CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
        |         AS BIGINT)) AS DOUBLE), 4) AS promo_revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l.l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,
    // Q19 replay: the OR'd conjunct groups verbatim.
    "q364_tpch_q19" ->
      """SELECT round(coalesce(CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
        |         AS BIGINT)) AS BIGINT), 0) / 100.0, 2) AS revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
        |       AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
        |       AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,
    // Q22 replay: integer-cents above-average test (c·n > Σ), anti
    // semi-join on recent orders, nation rollup.
    "q365_tpch_q22" ->
      """WITH ap AS (
        |  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM customer WHERE c_acctbal > 0
        |)
        |SELECT n.n_name, CAST(count(*) AS BIGINT) AS numcust,
        |       round(CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |         / 100.0, 2) AS totacctbal
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |CROSS JOIN ap
        |WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * ap.n > ap.s
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Q2 replay: same derived supply relation (min cents unit price
    // per part-supplier), qual MATERIALIZED (read by the per-part min
    // and the winner filter), exact-cents min equality keeps ties.
    "q368_tpch_q2" ->
      """WITH supply AS (
        |  SELECT l_partkey, l_suppkey,
        |         CAST(min(CAST(round(l_extendedprice / l_quantity * 100)
        |           AS BIGINT)) AS BIGINT) AS c
        |  FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2
        |),
        |qual AS MATERIALIZED (
        |  SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name, sp.c
        |  FROM supply sp
        |  JOIN part p ON sp.l_partkey = p.p_partkey
        |  JOIN supplier s ON sp.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE p.p_size = 15 AND p.p_name LIKE '% bolt'
        |    AND r.r_name = 'EUROPE'
        |),
        |mn AS (SELECT p_partkey, min(c) AS mnc FROM qual GROUP BY 1)
        |SELECT q.s_acctbal, q.s_name, q.n_name, q.p_partkey, q.p_name,
        |       round(q.c / 100.0, 2) AS supply_cost
        |FROM qual q
        |JOIN mn ON q.p_partkey = mn.p_partkey AND q.c = mn.mnc
        |ORDER BY q.s_acctbal DESC, q.n_name, q.s_name, q.p_partkey
        |LIMIT 100""".stripMargin,
    // Q9 replay: identical cents profit (retailprice unit cost),
    // nation × year rollup.
    "q369_tpch_q9" ->
      """SELECT n.n_name AS nation,
        |       CAST(year(o.o_orderdate) AS INT) AS o_year,
        |       round(CAST(sum(
        |         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
        |         - CAST(round(p.p_retailprice * l.l_quantity * 100) AS BIGINT))
        |         AS BIGINT) / 100.0, 2) AS sum_profit
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE p.p_name LIKE '%gear'
        |GROUP BY 1, 2
        |ORDER BY 1, 2 DESC""".stripMargin,
    // Q11 replay: pv MATERIALIZED (read by the scalar total and the
    // HAVING filter); the share test is pure integer v·n > 2·t.
    "q370_tpch_q11" ->
      """WITH pv AS MATERIALIZED (
        |  SELECT l.l_partkey,
        |         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
        |           AS BIGINT) AS v
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  WHERE n.n_name = 'NATION_3'
        |  GROUP BY 1
        |),
        |t AS (SELECT CAST(sum(v) AS HUGEINT) AS t,
        |             CAST(count(*) AS BIGINT) AS n FROM pv)
        |SELECT pv.l_partkey AS p_partkey,
        |       round(pv.v / 100.0, 2) AS stock_value
        |FROM pv, t
        |WHERE CAST(pv.v AS HUGEINT) * t.n > t.t * 2
        |ORDER BY stock_value DESC, p_partkey""".stripMargin,
    // Q12 replay: same two CASE buckets, same 60-day lateness
    // convention, returnflag as the mode column.
    "q371_tpch_q12" ->
      """SELECT l.l_returnflag,
        |       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_returnflag IN ('A', 'R')
        |  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Q16 replay: NOT IN on negative-balance suppliers, count
    // DISTINCT suppliers per part-attribute group.
    "q372_tpch_q16" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
        |       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#1' AND p.p_name NOT LIKE 'red %'
        |  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
        |  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                          WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 100""".stripMargin,
  )
}
