package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round instrumentation: dump `explain("formatted")` for a
  * set of registered queries to files (`plans/r16/<query>_<tag>.txt`),
  * so plan-shape claims in OPTIMIZATION notes are checkable without a
  * Spark runtime.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> [q1,q2,...]
  * (no query list = every registered query).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val only: Set[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet
      else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val mode = ExplainMode.fromString("formatted")
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        val txt =
          try fn(spark, sfDir).queryExecution.explainString(mode)
          catch { case e: Throwable =>
            s"EXPLAIN FAILED: ${e.getClass.getName}: ${e.getMessage}"
          }
        Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), txt)
      }
    }
    spark.stop()
  }
}
