package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Indirect-evidence propagation across an ontology: copy each evidence
  * row to every ancestor of its disease node.
  *
  * Capability parity with the reference's `get_indirect_evidence`
  * (/root/reference/timeseries.py:342–368). The ontology dimension is
  * broadcast — it is orders of magnitude smaller than evidence at any
  * scale — so the only cost is the map-side explode fan-out (bounded by
  * ontology depth), never a shuffle of evidence.
  */
object OntologyPropagate {

  /** @param evidence rows with a `diseaseId` column
    * @param ontology (id, ancestors: array) — self is added automatically
    */
  def indirect(evidence: DataFrame, ontology: DataFrame): DataFrame = {
    val expanded = ontology.select(
      col("id").as("diseaseId"),
      explode(array_union(array(col("id")), col("ancestors")))
        .as("specificDiseaseId"))
    evidence
      .join(broadcast(expanded), Seq("diseaseId"), "inner")
      .drop("diseaseId")
      .withColumnRenamed("specificDiseaseId", "diseaseId")
  }
}
