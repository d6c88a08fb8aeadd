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

  /** Deterministic weighted priority sampling — Efraimidis–Spirakis
    * A-ES with hash-derived uniforms: every row gets priority
    * ln(u)/w (the order-equivalent of the classical u^(1/w) key,
    * u ∈ (0,1] seeded from md5(id)), and the global top-k by priority
    * is a weighted sample without replacement. Higher-weight strata
    * survive proportionally more often: the data-mixing primitive
    * (cut a corpus to a budget under per-source quality weights),
    * reproducible across runs, partitionings, and engines.
    *
    * Scale: projection + broadcast weight dim + TakeOrdered(k) — the
    * corpus is never shuffled and no global sort materializes; only k
    * rows reach the driver side of the limit.
    *
    * `weights` is a small (stratumCol, weight) dimension.
    */
  def weightedPrioritySample(
      df: DataFrame,
      weights: DataFrame,
      stratumCol: String,
      idCol: String = "doc_id",
      salt: String = "ws",
      k: Int = 200): DataFrame =
    df.join(broadcast(weights), Seq(stratumCol))
      .withColumn("__h",
        conv(substring(md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 13), 16, 10)
          .cast("long"))
      .withColumn("priority",
        log((col("__h") + 1).cast("double") / lit(4503599627370496.0)) / col("weight"))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
      .drop("__h")

  /** Temperature-scaled mixture sampling — the multilingual/multi-
    * source rebalancing step of LLM data mixing: stratum `s` with
    * `n_s` documents gets mixture weight n_s^τ / Σ n_t^τ (τ < 1
    * flattens the natural distribution toward uniform, up-sampling
    * small sources), a per-stratum budget of `budgetFrac · N · p_s`
    * docs, and therefore keep rate r_s = min(1, budget_s / n_s). The
    * keep decision is the same md5-uniform as [[hashSplit]] — per-row,
    * deterministic, partition-invariant.
    *
    * Scale shape: stratum counts come from a map-side-combined groupBy
    * whose output is vocabulary-of-strata-sized; rates are computed in
    * that tiny dim and broadcast back; the keep filter is scan-local.
    * The corpus is never shuffled. Rates are rounded to 6 dp before
    * the comparison so the boundary is engine-stable (pow may differ
    * in the last ulp across libms).
    *
    * Adds `rate` (rounded) to the surviving rows.
    */
  def temperatureSample(
      df: DataFrame,
      stratumCol: String = "source",
      idCol: String = "doc_id",
      temperature: Double = 0.7,
      budgetFrac: Double = 0.4,
      salt: String = "temp"): DataFrame = {
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("__n_s"))
    val tot = counts.agg(sum("__n_s").as("__n_total"),
      sum(pow(col("__n_s"), temperature)).as("__z"))
    val rates = counts.join(tot) // 1-row × strata-row cross: tiny dim
      .withColumn("rate", round(
        least(lit(1.0),
          pow(col("__n_s"), lit(temperature)) * col("__n_total")
            * lit(budgetFrac) / (col("__z") * col("__n_s"))), 6))
      .select(col(stratumCol), col("rate"))
    df.join(broadcast(rates), Seq(stratumCol))
      .withColumn("__u",
        conv(substring(md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 13), 16, 10)
          .cast("double") / lit(4503599627370496.0))
      .filter(col("__u") < col("rate"))
      .drop("__u")
  }

  /** Deterministic epoch-based upsampling — the other half of data
    * mixing ([[temperatureSample]] cuts oversized sources down; this
    * repeats undersized sources up): stratum `s` with target
    * `epochs_s` (fractional) emits each document floor(epochs_s)
    * times, plus one more iff the document's md5 uniform clears the
    * fractional part — so expected copies = epochs_s exactly, and the
    * decision is per-row, deterministic, partition-invariant.
    *
    * Scale shape: a broadcast epochs dim and a scan-local
    * explode(sequence(...)) — the corpus is never shuffled and the
    * blow-up factor is the mixing target itself. Adds (n_copies,
    * epoch ∈ [0, n_copies)).
    */
  def epochMix(
      df: DataFrame,
      epochs: DataFrame,
      stratumCol: String = "source",
      idCol: String = "doc_id",
      salt: String = "epoch"): DataFrame =
    df.join(broadcast(epochs), Seq(stratumCol))
      .withColumn("__u",
        conv(substring(md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 13), 16, 10)
          .cast("double") / lit(4503599627370496.0))
      .withColumn("n_copies",
        (floor(col("epochs")) +
          when(col("__u") < col("epochs") - floor(col("epochs")), 1L)
            .otherwise(0L)).cast("long"))
      .filter(col("n_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("__u")

  /** Deterministic within-group permutation: redistribute `valueCol`'s
    * multiset among the rows of each group by two independent md5
    * orders — the engine-portable analogue of a random shuffle
    * (negative sampling, null-model baselines), reproducible across
    * runs, partitionings, and engines.
    *
    * Scale shape: groups are sub-divided into md5 shards of the id, so
    * every rank window partitions at ~group/shards rows (a whole-group
    * window would funnel a hot group into one task); the permutation
    * is rank-to-rank within the (group, shard) lane, so the value
    * multiset is preserved lane-wise — any deterministic derangement
    * is an equally valid null model. Adds `<valueCol>_permuted`.
    */
  def deterministicPermute(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      idCol: String = "doc_id",
      shards: Int = 16,
      salt: String = "perm"): DataFrame = {
    val lane = groupCols.map(col) :+ col("__shard")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lane: _*)
    // localCheckpoint: `sharded` feeds BOTH rank branches below, whose
    // windows prune different columns — the two exchanges never
    // canonicalize equal, so without the cut each branch re-derived
    // the whole upstream lineage (for q86 that is the full scoring
    // chain + peaks). Values unchanged (r16).
    val sharded = df
      .withColumn("__shard", hashBucket(col(idCol), salt) % shards)
      .withColumn("__h", md5(concat(col(idCol).cast("string"), lit(":" + salt))))
      .localCheckpoint()
    val keyRanked = sharded
      .withColumn("__r", row_number().over(w.orderBy(col("__h"))))
    val valueRanked = sharded
      .withColumn("__r", row_number().over(
        w.orderBy(col(valueCol), col("__h"))))
      .select((lane :+ col("__r") :+
        col(valueCol).as(s"${valueCol}_permuted")): _*)
    keyRanked
      .join(valueRanked, groupCols ++ Seq("__shard", "__r"))
      .drop("__shard", "__h", "__r")
  }

  /** Deterministic sequence packing: assign documents to fixed-budget
    * training sequences ("bins") by running token count — the step
    * that turns a curated corpus into model-ready context windows.
    *
    * Packing is sequential by `idCol` within a (stratum, shard) lane:
    * a document's bin is floor(tokens-before-it / budget) — modulo-
    * split fill, so a document straddling a boundary stays in the bin
    * it started in (bins can overrun the budget by at most one
    * straddling doc; the oracle and OperatorsSpec pin exactly this
    * behavior). The shard is an md5 bucket of
    * the id — deterministic, engine-portable, and it bounds every
    * window partition at ~corpus/(strata·shards) rows, so no lane
    * funnels one task at 100 TB (a per-stratum running sum would).
    * Lanes are independent by construction: growing one shard never
    * changes another's bins.
    *
    * Output: input columns + (shard, n_tokens, bin, bin_tokens =
    * tokens before this doc within its bin).
    */
  def packSequences(
      df: DataFrame,
      budgetTokens: Int,
      stratumCol: String = "source",
      textCol: String = "text",
      idCol: String = "doc_id",
      shards: Int = 16,
      salt: String = "pack"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol), col("shard")).orderBy(col(idCol))
    df.withColumn("shard", hashBucket(col(idCol), salt) % shards)
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .withColumn("__before",
        coalesce(sum("n_tokens").over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", (col("__before") / budgetTokens).cast("long"))
      .withColumn("bin_tokens", col("__before") % budgetTokens)
      .drop("__before")
  }

  /** Per-stratum document cap: an EXACT-k uniform sample of every
    * stratum (min(k, n) docs survive) — the domain-cap step of
    * web-corpus curation, where no source may dominate the mix.
    * Deterministic: a document's md5 uniform decides its rank within
    * its stratum, so the kept set is stable across runs, partition
    * layouts, and engines.
    *
    * Scale shape: a bounded-state (priority, id) top-k aggregate
    * ([[graft.functions.PriorityTopKIds]]) with map-side combine —
    * O(k) partial state per stratum per task — where the
    * `row_number() OVER (PARTITION BY stratum ORDER BY u)` spelling
    * would funnel a Zipf-hot stratum's every row into one window
    * task. Output: (stratumCol, idCol), the kept ids.
    */
  def capPerStratum(
      df: DataFrame,
      k: Int,
      stratumCol: String = "source",
      idCol: String = "doc_id",
      salt: String = "cap"): DataFrame = {
    val u = conv(
      substring(md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 13),
      16, 10).cast("long").cast("double")
    df.groupBy(stratumCol)
      .agg(graft.functions.PriorityTopKIds.sampleIds(u, col(idCol), k).as("__ids"))
      .select(col(stratumCol), explode(col("__ids")).as(idCol))
  }

  /** Hashed-token bucket in [0, `buckets`) — md5-derived like
    * [[hashBucket]] but over a token, for DSIR's hashed bag-of-words
    * features.
    */
  private def tokenBucket(token: Column, buckets: Int): Column =
    conv(substring(md5(token), 1, 6), 16, 10).cast("int") % buckets

  /** DSIR importance log-ratios — fit the hashed-n-gram importance
    * estimator of "Data Selection for Language Models via Importance
    * Resampling" (Xie et al., NeurIPS 2023): tokens hash into
    * `buckets` bins, a Laplace-smoothed bag-of-buckets LM is fit to
    * the target slice (rows matching `targetPred`) and to the full
    * corpus in ONE scan (conditional partial aggregation on the
    * bucket key), and the result is the per-bucket
    * ln p̂_target − ln p̂_corpus table.
    *
    * The table is a constant-size aggregate (`buckets` doubles), so it
    * is materialized driver-side and embedded as a literal — the same
    * sanctioned shape as BloomSemiJoin's bitset, never data.
    */
  def dsirLogRatios(
      docs: DataFrame,
      targetPred: Column,
      buckets: Int = 64,
      textCol: String = "text"): Array[Double] = {
    val rows = docs
      .select(explode(TextAnalysis.words(col(textCol))).as("__w"),
        targetPred.cast("long").as("__t"))
      .groupBy(tokenBucket(col("__w"), buckets).as("__b"))
      .agg(count(lit(1)).as("cc"), sum("__t").as("tc"))
      .agg(collect_list(struct(col("__b"), col("cc"), col("tc"))).as("a"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    val cc = new Array[Long](buckets)
    val tc = new Array[Long](buckets)
    rows.foreach { r => cc(r.getInt(0)) = r.getLong(1); tc(r.getInt(0)) = r.getLong(2) }
    val ct = cc.sum.toDouble + buckets
    val tt = tc.sum.toDouble + buckets
    Array.tabulate(buckets)(b =>
      math.log((tc(b) + 1.0) / tt) - math.log((cc(b) + 1.0) / ct))
  }

  /** DSIR selection: per-document log importance weight = fold of the
    * ratio table over the document's OWN tokens — a scan-local
    * higher-order `aggregate` against the broadcast-literal table
    * (zero corpus shuffle, zero explode at scoring time) — then the
    * global top-k by weight via TakeOrdered (no global sort; only k
    * rows survive). Resampling-without-replacement on these weights
    * is [[weightedPrioritySample]] — this returns the weights and the
    * deterministic top slice.
    *
    * Output: idCol, stratum columns passed through, logw (4dp).
    */
  def dsirTopK(
      docs: DataFrame,
      targetPred: Column,
      k: Int,
      buckets: Int = 64,
      textCol: String = "text",
      idCol: String = "doc_id",
      passThrough: Seq[String] = Seq("source", "lang")): DataFrame = {
    val ratios = dsirLogRatios(docs, targetPred, buckets, textCol)
    val ratioLit = typedLit(ratios.toSeq)
    docs
      .withColumn("logw",
        aggregate(TextAnalysis.words(col(textCol)), lit(0.0),
          (acc, t) => acc + element_at(ratioLit, tokenBucket(t, buckets) + 1)))
      .orderBy(col("logw").desc, col(idCol))
      .limit(k)
      .select(col(idCol) +: passThrough.map(col) :+
        round(col("logw"), 4).as("logw"): _*)
  }

  /** Token-budget greedy corpus selection: rank every document by
    * (quality desc, id asc) and keep the longest prefix whose
    * cumulative token count fits `budget` — "fill the training-token
    * budget with the best documents first", the curation step after
    * scoring (G8/G20) and before packing (G25).
    *
    * Scale shape: the global ordered prefix sum NEVER runs as one
    * single-task window. Documents are binned by quality-range
    * boundaries (approx quantiles — a constant-size driver array);
    * each bucket computes its in-bucket prefix sum on its own window
    * partition, and the cross-bucket offsets are a `buckets`-row
    * aggregate embedded as a literal map (the BloomSemiJoin /
    * dsirLogRatios sanctioned constant-size shape). offset +
    * in-bucket prefix ≡ the exact global prefix REGARDLESS of where
    * the boundaries fall (binning is order-respecting and equal
    * qualities always share a bucket), so sketch imprecision cannot
    * leak into results — the oracle's one-window replay matches
    * bit-for-bit.
    *
    * Output: (idCol, qualityCol, tokensCol, cum_tokens), the selected
    * prefix.
    */
  def tokenBudgetSelect(
      docs: DataFrame,
      qualityCol: String,
      tokensCol: String,
      budget: Long,
      idCol: String = "doc_id",
      buckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0, "budget must be non-negative")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds = docs.stat.approxQuantile(qualityCol, probs, 0.001).distinct.sorted
    val boundsLit = typedLit(bounds.toSeq)
    // bucket = #boundaries strictly below q — a pure function of the
    // quality VALUE, so ties can never straddle buckets
    val bucket = size(filter(boundsLit, b => b < col(qualityCol)))
    val bucketed = docs.select(col(idCol), col(qualityCol), col(tokensCol),
      bucket.as("__b"))
    val totals = bucketed.groupBy("__b")
      .agg(sum(col(tokensCol)).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // offset of bucket b = tokens in every HIGHER-quality bucket
    val offsets = totals.keys.map { b =>
      b -> totals.filter(_._1 > b).values.sum
    }.toMap
    val offsetLit = typedLit(offsets)
    val w = Window.partitionBy(col("__b"))
      .orderBy(col(qualityCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn("cum_tokens",
        element_at(offsetLit, col("__b")) + sum(col(tokensCol)).over(w))
      .filter(col("cum_tokens") <= budget)
      .drop("__b")
  }
}
