package graft.operators

import graft.functions.BloomSketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-pruned semi-join — Spark's runtime-filter idea surfaced as an
  * explicit operator: build a bloom over the dim keys (native
  * aggregate, one 16 KB bitset), materialize it, drop fact rows whose
  * key CANNOT be in the dim at the scan, then run the exact left-semi
  * join to remove the bloom's false positives.
  *
  * The result is identical to the plain semi-join (blooms have no
  * false negatives), which is what makes it oracle-checkable. The
  * scale win: at 100 TB the fact side normally ships every row into
  * the semi-join exchange; the bloom probe is a scan-local, codegen'd
  * filter that removes ~all non-matching rows first, so the shuffle
  * carries only candidates. The dim side collapses to a 16 KB sketch
  * with map-side combine — far smaller than broadcasting the key set
  * once the dim outgrows the broadcast threshold.
  *
  * The bitset is materialized driver-side and embedded as a LITERAL —
  * exactly how Spark's InjectRuntimeFilter/DPP materialize their
  * subquery results (and the same sanctioned shape as
  * `Dedup.clusters`' driver-side probe: a constant-size aggregate
  * scalar, never data). Keeping it lazy as a one-row broadcast join
  * does not survive the optimizer: PushDownLeftSemiAntiJoin reorders
  * the semi-join below the probe join and the pre-filter stops
  * pruning (pinned in ScaleDesignSpec).
  */
object BloomSemiJoin {

  def apply(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      k: Int = 5,
      m: Int = 1 << 17): DataFrame = {
    val words: Seq[Long] = dim.agg(BloomSketch.bloomAgg(col(dimKey), k, m).as("b"))
      .head().getSeq[Long](0)
    fact.filter(BloomSketch.mightContain(typedLit(words), col(factKey), k, m))
      .join(dim.select(col(dimKey).as(factKey)).distinct(), Seq(factKey), "left_semi")
  }
}
