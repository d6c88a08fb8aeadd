package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: two representative queries (association chain +
    // dedup chain) cover the operator code paths, so JIT compilation is
    // not billed to whichever query runs first. (A full warmup pass
    // measured WORSE: 60+ executions age the JVM — accumulated shuffle
    // files and broadcast cleanup debt outweigh the extra warmth.)
    for (w <- Seq("q03_novelty", "q31_dedup_minhash"))
      try SparkEntry.queries(w)(spark, sfDir).count()
      catch { case _: Throwable => () }
    // min-of-N runs per query: single-shot timings swing 3-4x under
    // GC/JIT noise (measured q05 2.1s vs 35.4s across identical runs);
    // the min is the reproducible cost of the plan itself.
    // REPS is clamped to [1, 10] and non-numeric values fall back to
    // the default rather than crashing the whole bench. The headline
    // four (q01-q04, the BASELINE.md comparison chain) always run at
    // >= 6 reps: sandbox walls swing 3-5x and only >= 6-rep minima are
    // comparable across rounds.
    val reps = math.min(10, math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_REPS").flatMap(_.toIntOption).getOrElse(2)))
    val headline = Set("q01_assoc_datasource", "q02_assoc_overall",
      "q03_novelty", "q04_novelty_datasource")
    // A failing query must NOT bench as green: record the error message
    // and report it in the JSON instead of a phantom wall time.
    val results: Seq[(String, Either[String, Double])] =
      SparkEntry.queries.toSeq.map { case (name, fn) =>
        val n = if (headline(name)) math.max(reps, 6) else reps
        val runs: Seq[Either[String, Double]] = (1 to n).map { _ =>
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).count()
            Right((System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable =>
              Left(Option(e.getMessage).getOrElse(e.getClass.getName)
                .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200))
          }
        }
        val oks = runs.collect { case Right(s) => s }
        name -> (if (oks.nonEmpty) Right(oks.min)
                 else Left(runs.collectFirst { case Left(m) => m }.getOrElse("unknown")))
      }
    def fmt(v: Double, dp: Int): String = BigDecimal(v)
      .setScale(dp, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
    def line(dp: Int, stripQ: Boolean): String = {
      def key(k: String): String = {
        val q = k.split("_")(0)
        if (stripQ) q.drop(1) else q
      }
      val qs = results.map {
        case (k, Right(v)) => "\"" + key(k) + "\":" + fmt(v, dp)
        case (k, Left(m)) => "\"" + key(k) + "\":{\"err\":\"" + m.take(40) + "\"}"
      }.mkString("{", ",", "}")
      val errs = results.collect { case (k, Left(_)) => key(k) }
      val total = results.collect { case (_, Right(v)) => v }.sum
      val errField =
        if (errs.isEmpty) ""
        else errs.mkString(",\"errors\":[\"", "\",\"", "\"]")
      val hl = results.collect {
        case (k, Right(v)) if headline(k) =>
          "\"" + k.split("_")(0) + "\":" + fmt(v, 3)
      }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","queries":$qs,"hl_min6":$hl,"full":"BENCH_FULL.json","sf":"$sfDir"$errField}"""
    }
    // The driver keeps only the LAST 2000 chars of output, and sbt's
    // trailing "[success] Total time ..." line lands after ours inside
    // that window — so the printed line must stay under ~1900 chars or
    // its HEAD (metric/total/q01-q04) is what gets truncated (the
    // BENCH_r07 failure mode). Emit the most precise variant that
    // fits: 3dp/qNN keys -> 2dp -> 2dp with the q stripped from keys
    // -> 1dp stripped. The untruncated 3dp contract form is always
    // written to BENCH_FULL.json in the repo root (json.load-able on
    // its own) whatever the line compaction chose.
    val full = line(3, stripQ = false)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_FULL.json"), full + "\n")
    val out = Seq(full, line(2, stripQ = false),
      line(2, stripQ = true), line(1, stripQ = true))
      .find(_.length <= 1900).getOrElse(line(1, stripQ = true))
    spark.stop()
    // printed after stop() so no Spark shutdown chatter lands between
    // the JSON and the end of output
    println(out)
  }
}
