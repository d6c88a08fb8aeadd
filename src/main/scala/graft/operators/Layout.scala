package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout operators for write-time clustering — the 100 TB lever
  * that no query-side trick replaces: parquet readers skip files by
  * footer min/max, and skipping only works if the writer co-located
  * rows that are close in the query dimensions. Z-ordering (Morton
  * interleave) gives multi-dimensional locality with a plain 1-D sort
  * key, so the standard `repartitionByRange(zval)` + per-file stats
  * machinery needs nothing custom at write time.
  *
  * Scale extension (no reference counterpart): the reference engine
  * materializes its outputs as plain parquet; this is the layout step
  * a 100 TB corpus needs before those outputs are queried by range.
  */
object Layout {

  /** Morton/Z-value of two non-negative integer columns, `bits` bits
    * each (so the result occupies `2*bits` bits): bit i of x lands at
    * position 2i, bit i of y at 2i+1. Built-ins only — each term is
    * `(x & 2^i)·2^i + (y & 2^i)·2^(i+1)`, and the terms occupy
    * disjoint bit positions so `+` IS the interleave; the whole thing
    * is one codegen'd projection, no shuffle, no UDF.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      xl.bitwiseAND(lit(1L << i)) * lit(1L << i) +
        yl.bitwiseAND(lit(1L << i)) * lit(1L << (i + 1))
    }.reduce(_ + _)
  }

  /** The identical interleave as DuckDB-dialect SQL over columns named
    * `xSql`/`ySql` — generated from the same loop so the oracle cannot
    * drift from the Column path.
    */
  def zValueSql(xSql: String, ySql: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(($xSql & ${1L << i}) * ${1L << i} + ($ySql & ${1L << i}) * ${1L << (i + 1)})"
    }.mkString(" + ")

  /** Per-cell layout statistics for a Z-ordered write: rows land in
    * cell `z >> (2·bits − log2(cells))` — a PREFIX of the z-curve is a
    * quadtree cell, so cell assignment is a pure projection (no global
    * sort, no window, no shuffle beyond the final small aggregate; at
    * write time the same expression feeds `repartitionByRange`). Emits
    * each cell's row count and x/y min/max — exactly the footer stats
    * a reader would skip on — plus whether the cell survives pruning
    * for the query box [x0,x1]×[y0,y1].
    */
  def zorderStats(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      cellBits: Int,
      x0: Long, x1: Long, y0: Long, y1: Long): DataFrame = {
    require(cellBits >= 1 && cellBits <= 2 * bits, "cellBits out of range")
    df.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("cell",
        shiftright(zValue(col("x"), col("y"), bits), 2 * bits - cellBits))
      .groupBy("cell")
      .agg(
        count(lit(1)).as("n"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .withColumn("hit",
        !(col("max_x") < x0 || col("min_x") > x1 ||
          col("max_y") < y0 || col("min_y") > y1))
  }

  /** Small-file compaction planning — the lakehouse maintenance
    * primitive: group each table partition's files into compaction
    * jobs of ≈`targetBytes` input each. Deterministic quotient
    * binning over the size-desc cumulative prefix: a file joins group
    * floor(prefix-before-it / target), so groups are contiguous runs
    * of the size-desc order, every group except the last holds ≥
    * target/2 ... ≈ target+maxFile bytes, and the assignment is a
    * pure function of the file list (idempotent replans).
    *
    * Scale shape: one window over (partition cols) ordered by (size
    * desc, file) — file counts per table partition are bounded by the
    * writer (thousands, not billions), so the per-partition sort is
    * small even when the table has millions of partitions; O(1)
    * running-sum state, one exchange total.
    *
    * Output: (partCols..., fileCol, sizeCol, grp).
    */
  def compactionPlan(
      files: DataFrame,
      partCols: Seq[String],
      fileCol: String,
      sizeCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col(sizeCol).desc, col(fileCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("__cum", sum(col(sizeCol)).over(w))
      .withColumn("grp",
        expr(s"(__cum - $sizeCol) DIV $targetBytes"))
      .drop("__cum")
  }

  /** Zone-map skip report: simulate parquet footer pruning of a range
    * predicate `[lo, hi]` under two candidate layouts of the SAME
    * rows — `arrival` (files are contiguous runs of the arrival id:
    * what an append-only ingest produces) versus `clustered` (files
    * are range buckets of the predicate column, which is what
    * `repartitionByRange(valCol)` produces at write time). The output
    * is the one-line-per-layout business case for clustering: how
    * many files and rows a reader must still scan.
    *
    * Scale shape: both file assignments are pure projections — the
    * arrival file is integral division of the id, the clustered file
    * counts broadcast quantile boundaries below the value (the sample
    * → boundaries mechanism range partitioning itself uses; computed
    * here as ONE exact-percentile row joined by literal-true, the
    * keys-broadcast house pattern). The corpus is scanned once,
    * duplicated map-side into the two layout tags, and shuffled only
    * at (layout, file) grain with O(1) min/max/count state; the
    * verdict rollup runs on the file table.
    *
    * Determinism: boundaries are rounded 4dp on both engines before
    * the strict `b < v` bucket test (rfm's threshold contract); file
    * min/max are exact parquet doubles, so the skip decision
    * `max < lo ∨ min > hi` is exact.
    *
    * Output: (layout, n_files, files_scanned, rows_scanned,
    * rows_matching, skip_frac).
    */
  def zoneMapReport(
      df: DataFrame,
      idCol: String,
      valCol: String,
      arrivalRowsPerFile: Int,
      clusterBuckets: Int,
      lo: Double,
      hi: Double): DataFrame = {
    require(arrivalRowsPerFile > 0 && clusterBuckets > 1)
    val probs = (1 until clusterBuckets)
      .map(i => i.toDouble / clusterBuckets).mkString(", ")
    val bounds = df.agg(
      expr(s"transform(percentile($valCol, array($probs)), b -> round(b, 4))")
        .as("__bounds"))
    val tagged = df
      .filter(col(valCol).isNotNull)
      .crossJoin(broadcast(bounds))
      .select(col(valCol).as("v"),
        expr(s"$idCol DIV $arrivalRowsPerFile").as("__fa"),
        expr(s"size(filter(__bounds, b -> b < $valCol))").cast("long").as("__fc"))
      .select(col("v"), explode(array(
        struct(lit("arrival").as("layout"), col("__fa").as("file")),
        struct(lit("clustered").as("layout"), col("__fc").as("file"))))
        .as("lf"))
      .select(col("lf.layout").as("layout"), col("lf.file").as("file"), col("v"))
    tagged
      .groupBy("layout", "file")
      .agg(count(lit(1)).as("n"),
        min("v").as("mn"), max("v").as("mx"),
        sum(when(col("v") >= lo && col("v") <= hi, 1L).otherwise(0L)).as("m"))
      .withColumn("hit", !(col("mx") < lo || col("mn") > hi))
      .groupBy("layout")
      .agg(
        count(lit(1)).as("n_files"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("files_scanned"),
        sum(when(col("hit"), col("n")).otherwise(0L)).as("rows_scanned"),
        sum(col("m")).as("rows_matching"))
      .withColumn("skip_frac",
        round(lit(1.0) - col("files_scanned").cast("double")
          / col("n_files").cast("double"), 4))
  }

  /** Bloom-augmented file-skip report (I40) — what I22's zone maps
    * CANNOT do: point lookups on a high-cardinality UNCLUSTERED key
    * (user_id, doc_id) see min..max spans covering everything, so
    * min-max skips nothing; a tiny per-file Bloom bitmap (here 248
    * bits, one md5-derived hash — the Parquet bloom_filter /
    * Delta-stats design point at toy size) answers "definitely not
    * in this file" and does the skipping. The report MEASURES it:
    * for a probe sweep over the key domain (every `probeEvery`-th
    * value), per probe the file counts a scan would touch under
    * min-max, under min-max+Bloom, and the true containment —
    * bloom_fp is the measured false-positive scan cost.
    *
    * Determinism: the hash is the engine-portable md5-nibble bucket
    * (the G15 convention) mod 248; the bitmap lives as four 62-bit
    * words in longs (shift ≤ 61 on both engines — DuckDB raises on
    * 1<<63, so full-word shifts are out of contract), OR-folded by
    * bit_or; everything else is exact counts.
    *
    * Scale shape: one scan builds all file summaries (one (file)
    * combine carrying 24 bytes each); the probe sweep is a broadcast
    * cross against the FILE-grain frame (probes × files, both
    * dim-bounded by `rowsPerFile` / `probeEvery` budgets); true
    * containment is one semi-collapsed (key % probeEvery = 0)
    * distinct.
    *
    * Output: one row per probe (probe, files_total, files_minmax,
    * files_bloom, files_actual, bloom_fp) — bloom_fp = Bloom hits on
    * files that do NOT contain the key.
    */
  def bloomSkipReport(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      rowsPerFile: Int,
      probeEvery: Int = 97,
      salt: String = "bloom"): DataFrame = {
    require(rowsPerFile > 0 && probeEvery > 0)
    def bitOf(k: Column): Column =
      conv(substring(md5(concat(k.cast("string"), lit(":" + salt))), 1, 6),
        16, 10).cast("long") % 248
    val rows = df.filter(col(keyCol).isNotNull)
      .select(expr(s"$idCol div $rowsPerFile").as("file"),
        col(keyCol).as("k"))
    val wordAggs = (0 to 3).map { w =>
      expr(s"bit_or(CASE WHEN __b div 62 = $w THEN " +
        s"shiftleft(1L, CAST(__b % 62 AS INT)) ELSE 0L END)").as(s"bm$w")
    }
    val files = rows
      .withColumn("__b", bitOf(col("k")))
      .groupBy("file")
      .agg(min("k").as("mn"),
        (Seq(max(col("k")).as("mx")) ++ wordAggs): _*)
    val probes = df.agg(max(col(keyCol)).cast("long").as("__mxk"))
      .select(explode(sequence(lit(0L), col("__mxk"),
        lit(probeEvery.toLong))).as("probe"))
      .withColumn("__pb", bitOf(col("probe")))
    val actual = rows.filter(col("k") % probeEvery === 0)
      .select(col("k").as("probe"), col("file")).distinct()
      .groupBy("probe").agg(count(lit(1)).as("files_actual"))
    val blTest = (0 to 3).map { w =>
      s"WHEN __pb div 62 = $w THEN " +
        s"(bm$w & shiftleft(1L, CAST(__pb % 62 AS INT))) != 0L"
    }.mkString("CASE ", " ", " END")
    files.crossJoin(broadcast(probes))
      .withColumn("__mm", col("probe") >= col("mn") && col("probe") <= col("mx"))
      .withColumn("__bl", col("__mm") && expr(blTest))
      .groupBy("probe")
      .agg(count(lit(1)).as("files_total"),
        sum(when(col("__mm"), 1L).otherwise(0L)).as("files_minmax"),
        sum(when(col("__bl"), 1L).otherwise(0L)).as("files_bloom"))
      .join(actual, Seq("probe"), "left")
      .select(col("probe"), col("files_total"), col("files_minmax"),
        col("files_bloom"),
        coalesce(col("files_actual"), lit(0L)).as("files_actual"),
        (col("files_bloom") - coalesce(col("files_actual"), lit(0L)))
          .as("bloom_fp"))
      .orderBy("probe")
  }

  /** Partition-layout advisor (I41) — scores candidate partition
    * columns for a write layout BEFORE the data is laid down: for
    * each candidate, the partition count (file/task fan-out), the
    * hottest partition's row share (skew — one giant partition
    * single-tasks every downstream read), total/max payload bytes,
    * and how many partitions fall under `smallBytes` (the small-file
    * problem I21 compacts after the fact — this advisor avoids
    * creating it). The verdict is the HIVE-partitioning go/no-go:
    * too many partitions → metadata explosion, skewed → stragglers,
    * mostly-small → merge candidates.
    *
    * Exactness: rows/bytes are exact longs; skew publishes as the
    * exact integer milli-ratio rows_max·1000·n_parts div rows_total
    * (never a double compare — the q198 threshold contract); the
    * verdict reads only those integers.
    *
    * Scale shape: ONE corpus scan to the finest (all candidate
    * columns) cell grain; every candidate's partition table derives
    * from that cell table by re-aggregation — adding a candidate
    * costs a cell-grain combine, not a scan.
    *
    * Output: (candidate, n_parts, rows_total, rows_max, skew_milli,
    * bytes_total, bytes_max, small_parts, verdict).
    */
  def partitionAdvisor(
      df: DataFrame,
      candidates: Seq[Seq[String]],
      bytesCol: Column,
      smallBytes: Long = 1L << 16,
      maxParts: Long = 256L,
      maxSkewMilli: Long = 8000L): DataFrame = {
    require(candidates.nonEmpty)
    val allCols = candidates.flatten.distinct
    val cells = df
      .groupBy(allCols.map(col): _*)
      .agg(count(lit(1)).as("__rows"), sum(bytesCol).as("__bytes"))
      .localCheckpoint() // one corpus scan feeds every candidate
    val perCandidate = candidates.map { cand =>
      val name = cand.mkString("/")
      cells
        .groupBy(cand.map(col): _*)
        .agg(sum("__rows").as("__r"), sum("__bytes").as("__b"))
        .agg(count(lit(1)).as("n_parts"),
          sum("__r").as("rows_total"), max("__r").as("rows_max"),
          sum("__b").as("bytes_total"), max("__b").as("bytes_max"),
          sum(when(col("__b") < smallBytes, 1L).otherwise(0L))
            .as("small_parts"))
        .select(lit(name).as("candidate"), col("n_parts"), col("rows_total"),
          col("rows_max"),
          expr("rows_max * 1000 * n_parts div rows_total").as("skew_milli"),
          col("bytes_total"), col("bytes_max"), col("small_parts"))
    }
    perCandidate.reduce(_ unionByName _)
      .withColumn("verdict",
        when(col("n_parts") > maxParts, lit("high-cardinality"))
          .when(col("skew_milli") > maxSkewMilli, lit("skewed"))
          .when(col("small_parts") * 2L > col("n_parts"), lit("mostly-small"))
          .otherwise(lit("ok")))
  }
}
