package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental corpus snapshot diff — the refresh primitive of a
  * recurring crawl / training-data pipeline: classify every id across
  * two snapshots of the same table as `added` / `removed` / `changed`
  * / `unchanged` by content hash.
  *
  * Scale design: a single full-outer shuffle join keyed on the id.
  * Content equality is decided on md5 hashes computed at scan time, so
  * wide text/binary columns never travel through the exchange — each
  * side ships (id, 32-char hash, small passthrough columns) no matter
  * how large the documents are. If both snapshots are written bucketed
  * on the id ([[graft.sources.Io.writeBucketed]]) the exchange
  * disappears entirely and the diff is a per-bucket merge.
  */
object Snapshot {

  /** Per-id change classification between `oldDf` and `newDf`.
    *
    * Output: (idCol, change, passthrough*) where `change` ∈
    * {added, removed, changed, unchanged} and each passthrough column
    * is taken from the new snapshot when the id is present there,
    * else from the old one (so `removed` rows keep their metadata).
    */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String = "doc_id",
      contentCol: String = "text",
      passthrough: Seq[String] = Nil): DataFrame = {
    val o = oldDf.select(
      col(idCol).as("__old_id") +:
        md5(col(contentCol)).as("__old_h") +:
        passthrough.map(c => col(c).as(s"__old_$c")): _*)
    val n = newDf.select(
      col(idCol).as("__new_id") +:
        md5(col(contentCol)).as("__new_h") +:
        passthrough.map(c => col(c).as(s"__new_$c")): _*)
    o.join(n, col("__old_id") === col("__new_id"), "full_outer")
      .select(
        coalesce(col("__new_id"), col("__old_id")).as(idCol) +:
          when(col("__old_id").isNull, "added")
            .when(col("__new_id").isNull, "removed")
            .when(col("__old_h") === col("__new_h"), "unchanged")
            .otherwise("changed")
            .as("change") +:
          passthrough.map(c =>
            coalesce(col(s"__new_$c"), col(s"__old_$c")).as(c)): _*)
  }
}
