package graft

import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler (dev tool, test scope): run with
  * `sbt 'Test/runMain graft.ProfMain <sfDir> <which>'`.
  */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val which = if (args.length > 1) args(1) else "all"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    if (which == "q09stages") {
      val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
          stages.add(f"stage ${si.stageId}%4d ${dur}%6d ms tasks=${si.numTasks}%3d ${si.name.take(60)}")
        }
      })
      SparkEntry.queries("q03_novelty")(spark, dir).count() // warm
      for (i <- 1 to 3) {
        stages.clear()
        time(s"q09_$i")(SparkEntry.queries("q09_peaks")(spark, dir).count())
        stages.forEach(s => println(s"PROF   $s"))
      }
    }
    if (which == "q09gc") {
      import scala.jdk.CollectionConverters._
      def gcMs: Long = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
      SparkEntry.queries("q03_novelty")(spark, dir).count() // warm
      for (i <- 1 to 5) {
        val g0 = gcMs
        time(s"q09_$i")(SparkEntry.queries("q09_peaks")(spark, dir).count())
        println(s"PROF q09_${i}_gc: ${gcMs - g0} ms")
      }
    }
    if (which == "r6shapes") {
      for (q <- Seq("q87_pii_redact", "q88_passage_dedup",
          "q89_temperature_mix", "q90_int8_ann", "q91_cms_topk", "q92_bloom_join")) {
        val p = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
        println(s"=== $q exch=${"Exchange".r.findAllIn(p).size}" +
          s" scan=${"FileScan".r.findAllIn(p).size}" +
          s" bhj=${"BroadcastHashJoin".r.findAllIn(p).size}" +
          s" smj=${"SortMergeJoin".r.findAllIn(p).size}" +
          s" win=${"Window\\b".r.findAllIn(p).size}")
      }
    }
    if (which == "plans") {
      val q09 = SparkEntry.queries("q09_peaks")(spark, dir)
      q09.count()
      println("=== Q09 FINAL ===")
      println(q09.queryExecution.executedPlan.toString.split("\n").map(_.take(120)).mkString("\n"))
      val q03 = SparkEntry.queries("q03_novelty")(spark, dir)
      q03.count()
      println("=== Q03 FINAL ===")
      println(q03.queryExecution.executedPlan.toString.split("\n").map(_.take(120)).mkString("\n"))
    }
    if (which == "assoc") {
      for (i <- 1 to 3; q <- Seq("q09_peaks", "q03_novelty", "q02_assoc_overall"))
        time(s"${q}_$i")(SparkEntry.queries(q)(spark, dir).count())
    }
    if (which == "words") {
      val mat = spread(docs)
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"),
          when(size(col("w")) >= 3,
            transform(sequence(lit(1), size(col("w")) - 2),
              i => concat_ws(" ", element_at(col("w"), i),
                element_at(col("w"), i + 1), element_at(col("w"), i + 2))))
            .otherwise(array().cast("array<string>")).as("sh"))
      time("mat_words_shingled")(mat.select(sum(size(col("sh")))).first().getLong(0))
      time("mat_words_shingled2")(mat.select(sum(size(col("sh")))).first().getLong(0))
      val old = spread(docs).select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      time("old_shingled")(old.select(sum(size(col("sh")))).first().getLong(0))
    }
    if (which == "all" || which == "q33") {
      val d2 = spread(docs).select(col("source").as("block"), col("doc_id").as("id"),
          array_distinct(Dedup.shingles(col("text"), 3)).as("sh"))
        .filter(size(col("sh")) > 0).withColumn("sz", size(col("sh")))
      time("q33_shingled")(d2.count())
      val inv = d2.select(col("block"), col("id"), col("sz"), explode(col("sh")).as("s"))
      time("q33_inv")(inv.count())
      val grouped = inv.groupBy("block", "s")
        .agg(collect_list(struct(col("id"), col("sz"))).as("ds"))
        .filter(size(col("ds")) > 1)
      time("q33_grouped")(grouped.count())
      time("q33_full")(Dedup.ngramJaccard(docs, blockCol = "source").count())
      time("q33_full2")(Dedup.ngramJaccard(docs, blockCol = "source").count())
    }
    if (which == "all" || which == "q31") {
      val withSig = spread(docs)
        .select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .withColumn("set", array_distinct(col("sh"))).drop("sh")
        .withColumn("sig", Dedup.minhashSignature(col("set"), 12))
      time("q31_sig_materialized")(withSig.select(sum(size(col("sig")))).first().getLong(0))
      time("q31_full")(Dedup.minhashLshPairs(docs).count())
      time("q31_full2")(Dedup.minhashLshPairs(docs).count())
    }
    spark.stop()
  }
}
