package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines.
  *
  * Scale design (SURVEY.md §5): nothing here is ever O(n²) on the
  * corpus — exact dedup shuffles on the content hash; MinHash-LSH
  * shuffles on (band, bandHash) buckets and only verifies candidate
  * pairs that share a bucket. All hashing is md5-based and engine-
  * portable so a SQL oracle reproduces results bit-for-bit.
  */
object Dedup {

  /** Exact duplicate ranking by content hash: every row gets its
    * fingerprint, the number of copies, and a deterministic rank among
    * its copies (rank 1 = the keeper).
    */
  def exactRank(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val byFp = Window.partitionBy("fp")
    TextAnalysis.fingerprint(df, textCol)
      .withColumn("n_copies", count(lit(1)).over(byFp))
      .withColumn("dup_rank", row_number().over(byFp.orderBy(idCol)))
  }

  /** Word n-gram shingles (ordered, with duplicates). Empty when the
    * document has fewer than `n` words.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = TextAnalysis.words(text)
    when(size(w) >= n,
      transform(
        sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: element j (1-based) is min(md5(j || ':' || s))
    * over the shingle set — portable min-over-hex-string semantics.
    */
  def minhashSignature(shinglesCol: Column, k: Int): Column =
    transform(
      sequence(lit(1), lit(k)),
      j => array_min(transform(shinglesCol, s => md5(concat(j.cast("string"), lit(":"), s)))))

  /** Near-duplicate pairs via MinHash-LSH banding + exact Jaccard
    * verification. Output: (idA, idB, jaccard) with idA < idB.
    *
    * @param k      signature length
    * @param bands  number of LSH bands (k % bands == 0)
    * @param minJaccard verification threshold on exact shingle-set Jaccard
    */
  def minhashLshPairs(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 12,
      bands: Int = 3,
      shingleSize: Int = 3,
      minJaccard: Double = 0.8): DataFrame = {
    val rows = k / bands
    val withSig = df
      .select(col(idCol).as("id"), shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), k))

    // One row per (doc, band); bucket key is the md5 of the band slice.
    val banded = withSig.select(
      col("id"), col("sh"),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => md5(concat_ws("|", slice(col("sig"), b * rows + 1, lit(rows))))))
        .as(Seq("band", "bucket")))

    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(
        col("a.id").as("idA"), col("b.id").as("idB"),
        col("a.sh").as("shA"), col("b.sh").as("shB"))
      .dropDuplicates("idA", "idB")

    candidates
      .withColumn("setA", array_distinct(col("shA")))
      .withColumn("setB", array_distinct(col("shB")))
      .withColumn("jaccard",
        round(
          size(array_intersect(col("setA"), col("setB"))).cast("double") /
            size(array_union(col("setA"), col("setB"))), 3))
      .filter(col("jaccard") >= minJaccard)
      .select(col("idA"), col("idB"), col("jaccard"))
  }

  /** Exact pairwise n-gram Jaccard similarity above a threshold, within
    * a blocking key (never cross-block, so the join fans out only
    * inside blocks).
    */
  def ngramJaccard(
      df: DataFrame,
      blockCol: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleSize: Int = 3,
      minJaccard: Double = 0.5): DataFrame = {
    val docs = df.select(
      col(blockCol).as("block"), col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleSize)).as("sh"))
      .filter(size(col("sh")) > 0)
    docs.as("a").join(docs.as("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .select(
        col("a.block").as("block"),
        col("a.id").as("idA"), col("b.id").as("idB"),
        round(
          size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
            size(array_union(col("a.sh"), col("b.sh"))), 3).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** SimHash in a 32-bit space derived from md5 nibbles: for each of 32
    * hex positions of each token's md5, vote +1 if the nibble ≥ 8 else
    * −1; the simhash bit is 1 where the vote sum is positive. Encoded
    * as the 32-char bit string (portable across engines).
    */
  def simhashBits(text: Column): Column = {
    val w = array_distinct(TextAnalysis.words(text))
    val hashes = transform(w, t => md5(t))
    concat_ws("",
      transform(
        sequence(lit(1), lit(32)),
        i => {
          val votes = aggregate(
            hashes, lit(0),
            (acc, h) => acc +
              when(substring(h, 1, 32).substr(i, lit(1))
                .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1))
          when(votes > 0, lit("1")).otherwise(lit("0"))
        }))
  }

  /** Per-doc simhash + near-dup flag: docs sharing their simhash prefix
    * bucket (first `prefixBits` bits) with ≥1 other doc.
    */
  def simhash(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      prefixBits: Int = 16): DataFrame = {
    val withHash = df.select(col(idCol), col(textCol))
      .withColumn("simhash", simhashBits(col(textCol)))
      .withColumn("bucket", substring(col("simhash"), 1, prefixBits))
    val counts = withHash.groupBy("bucket").agg(count(lit(1)).as("bucket_size"))
    withHash.join(counts, Seq("bucket"))
      .select(col(idCol), col("simhash"), col("bucket"), col("bucket_size"))
  }
}
