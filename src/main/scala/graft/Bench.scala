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
    // the default rather than crashing the whole bench.
    val reps = math.min(10, math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_REPS").flatMap(_.toIntOption).getOrElse(2)))
    // A failing query must NOT bench as green: record the error message
    // and report it in the JSON instead of a phantom wall time.
    val results: Seq[(String, Either[String, Double])] =
      SparkEntry.queries.toSeq.map { case (name, fn) =>
        val runs: Seq[Either[String, Double]] = (1 to reps).map { _ =>
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
    // The driver tails only ~2000 chars of output and json-parses the
    // line, so the line must (a) carry no sbt "[info] " prefix (see
    // outputStrategy in build.sbt) and (b) stay well under 2000 chars:
    // keys are shortened to their unique qNN prefix and seconds are
    // rounded to 3 decimals (full names remain in SURVEY.md §2).
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
    val qs = results.map {
      case (k, Right(v)) => "\"" + k.split("_")(0) + "\":" + fmt(v)
      case (k, Left(m)) => "\"" + k.split("_")(0) + "\":{\"err\":\"" + m.take(40) + "\"}"
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(_)) => k.split("_")(0) }
    val total = results.collect { case (_, Right(v)) => v }.sum
    val errField =
      if (errs.isEmpty) ""
      else errs.mkString(",\"errors\":[\"", "\",\"", "\"]")
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"$errField}"""
    spark.stop()
    // printed after stop() so no Spark shutdown chatter lands between
    // the JSON and the end of output
    println(line)
  }
}
