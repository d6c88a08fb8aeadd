import org.apache.spark.sql.functions._

/** Drives the published graft artifact the way an external project
  * would: session via GraftSession (SQL extensions included), two
  * operators composed over driver testdata, the composed plan linted
  * with PlanLint, and one injected SQL function evaluated — each step
  * asserts, and the final line is the gate's grep target.
  */
object ConsumerMain {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.local(4, "graft-consumer")
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sf/documents.parquet")

    // operator 1: exact-dedup ranking; operator 2: quality scoring —
    // composed into one plan (keep the best-quality unique documents)
    val unique = graft.operators.Dedup.exactRank(docs)
      .filter(col("dup_rank") === 1)
    val curated = graft.operators.TextAnalysis.quality(unique)
      .filter(col("quality") >= 0.5)
      .select("doc_id", "quality")

    // the composed plan must pass the scale linter
    val findings = graft.plans.PlanLint.lint(curated)
    require(findings.isEmpty, s"PlanLint findings on composed plan: $findings")

    val n = curated.count()
    require(n > 0, "composed pipeline returned no rows")

    // injected SQL surface (GraftExtensions rode in via GraftSession)
    docs.limit(50).createOrReplaceTempView("consumer_docs")
    val sh = spark.sql(
      "SELECT size(word_shingles(text, 3)) AS ns FROM consumer_docs")
      .agg(sum("ns")).collect()(0).getLong(0)
    require(sh > 0, "word_shingles returned nothing")

    println(s"CONSUMER OK rows=$n shingles=$sh")
    spark.stop()
  }
}
