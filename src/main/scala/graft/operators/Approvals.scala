package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's headline "novelty predicts approvals" composite
  * (/root/reference/novelty_approval.py:340–430): first-approved drug
  * targets joined to their per-datasource novelty peaks, rolled up to
  * distinct-target counts per datatype.
  *
  * Scale shape: the drug/link dimensions are small relative to the
  * association table, so the composite key set is broadcast into the
  * novelty stream — the big side is never shuffled by this operator
  * (its own chain already partitioned it by pair keys); the window
  * maxima run over (targetId[, datasourceId]) partitions of the
  * already-filtered subset.
  */
object Approvals {

  /** (targetId, diseaseId, approvalYear) for drugs that were the FIRST
    * approval for their target: min-over-window + self-filter
    * (novelty_approval.py:373–379 `minApprovalYear ==
    * firstApprovalYear`).
    */
  def firstApprovalTargets(drugs: DataFrame, links: DataFrame): DataFrame =
    drugs.join(links, Seq("drugId"))
      .filter(col("targetId").isNotNull && col("approvalYear").isNotNull)
      .transform(Rollups.attachWindowAgg(_, Seq("targetId"), min("approvalYear"), "minApprovalYear"))
      .filter(col("minApprovalYear") === col("approvalYear"))
      .select("targetId", "diseaseId", "approvalYear")
      .distinct()

  /** Distinct first-approval targets per datatype whose novelty peaked:
    * join novelty-by-datasource to the first-approval targets, keep
    * each (target, datasource)'s max-novelty rows
    * (novelty_approval.py:393–407), map datasource→datatype over the
    * literal dim, and count distinct targets in the approval-year
    * window (novelty_approval.py:411–422).
    *
    * `noveltyBySource` is the (diseaseId, targetId, datasourceId,
    * year, novelty) frame from [[Novelty.attach]].
    */
  def approvalComposite(
      drugs: DataFrame,
      links: DataFrame,
      noveltyBySource: DataFrame,
      datatypes: DataFrame,
      yearLo: Int,
      yearHi: Int): DataFrame =
    approvalComposite(firstApprovalTargets(drugs, links),
      noveltyBySource, datatypes, yearLo, yearHi)

  /** The reference's second composite branch
    * (novelty_approval.py:432–478): clinical-phase milestones per
    * (target, phase, drug) — earliest year, flat novelty 1 — unioned
    * with the novelty-peak rows, then the `window` offset, the
    * conditional discard of post-approval early-phase rows, and the
    * datatype mapping with fallback to the raw datasource id.
    * Output: targetId, datasourceId, datatypeId, approvalYear, year,
    * novelty, window.
    */
  def phaseUnion(
      noveltyRows: DataFrame,   // (targetId, datasourceId, approvalYear, year, novelty)
      phaseRows: DataFrame,     // (targetId, datasourceId, approvalYear, year) milestones
      datatypes: DataFrame,
      earlyPhases: Seq[String]): DataFrame =
    noveltyRows
      .unionByName(phaseRows.withColumn("novelty", lit(1.0)))
      .withColumn("window", col("year") - col("approvalYear"))
      .filter(!(col("approvalYear") < col("year") &&
        col("datasourceId").isin(earlyPhases: _*)))
      .join(broadcast(datatypes), Seq("datasourceId"), "left")
      .withColumn("datatypeId", coalesce(col("datatypeId"), col("datasourceId")))

  /** Variant taking the precomputed first-approval set, so callers can
    * also semi-join it into the EVIDENCE feeding `noveltyBySource`:
    * the association/novelty chain is per-(pair, source) independent,
    * so restricting it to the pairs this query can ever emit is exact
    * — and at 100 TB it is the difference between scoring the whole
    * corpus and scoring the drug-dim's slice of it.
    */
  def approvalComposite(
      first: DataFrame,
      noveltyBySource: DataFrame,
      datatypes: DataFrame,
      yearLo: Int,
      yearHi: Int): DataFrame = {
    noveltyBySource
      .join(broadcast(first), Seq("diseaseId", "targetId"))
      .filter(col("novelty") > 0.0 && col("year").isNotNull)
      .transform(Rollups.attachWindowAgg(
        _, Seq("targetId", "datasourceId"), max("novelty"), "maxNovelty"))
      .filter(col("novelty") === col("maxNovelty"))
      .join(broadcast(datatypes), Seq("datasourceId"), "left")
      .filter(col("approvalYear").between(yearLo, yearHi))
      .groupBy("datatypeId")
      .agg(countDistinct(col("targetId")).as("targets"))
  }
}
