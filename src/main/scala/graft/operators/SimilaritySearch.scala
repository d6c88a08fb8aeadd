package graft.operators

import graft.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Embeddings are ×1000-quantized to Long before any math, making dot
  * products exact integer sums — order-independent and bit-identical
  * across engines (SURVEY.md §3) — while the final cosine stays a
  * deterministic double (IEEE sqrt/div of exact inputs).
  *
  * Scale design: the query set is broadcast against the corpus (the
  * corpus is never shuffled); the LSH variant buckets the corpus by
  * deterministic hyperplane signs so only same-bucket candidates are
  * scored — the 100 TB path.
  */
object SimilaritySearch {

  private def prepared(df: DataFrame, idCol: String, embCol: String): DataFrame =
    spread(df).select(
        col(idCol).as("id"),
        quantize(col(embCol)).as("qv"))
      .withColumn("nrm", sqrt(quantizedDot(col("qv"), col("qv")).cast("double")))

  /** Exact brute-force cosine top-k of `queries` against `corpus`.
    * Output: (query_id, id, rank, cos). Ties broken by id ascending —
    * fully deterministic.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val c = prepared(corpus, idCol, embCol)
    val q = prepared(queries, idCol, embCol)
      .select(col("id").as("query_id"), col("qv").as("qqv"), col("nrm").as("qnrm"))
    val scored = c.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("cos",
        quantizedDot(col("qv"), col("qqv")).cast("double") / (col("nrm") * col("qnrm")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id"), col("rank"), round(col("cos"), 4).as("cos"))
  }

  /** Deterministic pseudo-random hyperplane sign: md5-derived ±1 weights
    * per (plane, dimension); bucket = concatenated signs of the plane
    * projections.
    */
  def lshBucket(qv: Column, planes: Int, dims: Int): Column =
    concat_ws("",
      (1 to planes).map { p =>
        val proj = aggregate(
          zip_with(
            qv,
            transform(sequence(lit(1), lit(dims)),
              i => when(substring(md5(concat(lit(p + ":"), i.cast("string"))), 1, 1)
                .isin("0", "1", "2", "3", "4", "5", "6", "7"), 1L).otherwise(-1L)),
            (x, s) => x * s),
          lit(0L), (acc, x) => acc + x)
        when(proj >= 0, lit("1")).otherwise(lit("0"))
      }: _*)

  /** IVF (inverted-file) ANN: partition the corpus into Voronoi cells
    * around `nCentroids` deterministic seed vectors, then search only
    * the `nProbe` cells nearest to each query — the classic
    * coarse-quantizer layout (FAISS IVF-Flat) expressed as Spark joins.
    *
    * Centroid seeds are corpus vectors picked by an even stride over
    * vec_id order (deterministic, no training dependency); assignment
    * is a broadcast nested-loop of `nCentroids` distance evaluations
    * per vector, reduced with `min_by`. At 100 TB the scored join is an
    * equi-join on cell id — work scales with corpus/nCentroids×nProbe,
    * not the full corpus.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val c = prepared(corpus, idCol, embCol)
    val q = prepared(queries, idCol, embCol)

    // Deterministic pseudo-random seed pick: the nCentroids corpus
    // vectors with smallest md5(id). orderBy+limit plans as a
    // distributed TakeOrdered (per-partition top-k then merge) — no
    // global sort, scalable to any corpus size. The md5 itself is the
    // cell id (distinct per seed; contiguity is not needed), so no
    // global window is ever planned.
    val centroids = c
      .withColumn("h", md5(col("id").cast("string")))
      .orderBy("h")
      .limit(nCentroids)
      .select(col("h").as("cell"), col("qv").as("cv"), col("nrm").as("cnrm"))

    def assign(df: DataFrame, keep: Int): DataFrame =
      df.join(broadcast(centroids))
        .withColumn("sim",
          quantizedDot(col("qv"), col("cv")).cast("double") / (col("nrm") * col("cnrm")))
        .withColumn("cellRank",
          row_number().over(Window.partitionBy("id").orderBy(col("sim").desc, col("cell"))))
        .filter(col("cellRank") <= keep)
        .drop("cv", "cnrm", "sim", "cellRank")

    val corpusCells = assign(c, 1)
    val queryCells = assign(q, nProbe)
      .select(col("id").as("query_id"), col("qv").as("qqv"),
        col("nrm").as("qnrm"), col("cell"))

    val scored = corpusCells.join(broadcast(queryCells), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos",
        quantizedDot(col("qv"), col("qqv")).cast("double") / (col("nrm") * col("qnrm")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id"), col("rank"), round(col("cos"), 4).as("cos"))
  }

  /** LSH-bucketed ANN: score only candidates in the query's bucket.
    * Approximate — recall depends on `planes`; at 100 TB this replaces
    * the brute-force scan with a bucket-equi-join.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      planes: Int = 8,
      dims: Int = 64,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val c = prepared(corpus, idCol, embCol)
      .withColumn("bucket", lshBucket(col("qv"), planes, dims))
    val q = prepared(queries, idCol, embCol)
      .withColumn("bucket", lshBucket(col("qv"), planes, dims))
      .select(col("id").as("query_id"), col("qv").as("qqv"),
        col("nrm").as("qnrm"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos",
        quantizedDot(col("qv"), col("qqv")).cast("double") / (col("nrm") * col("qnrm")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id"), col("rank"), round(col("cos"), 4).as("cos"))
  }
}
