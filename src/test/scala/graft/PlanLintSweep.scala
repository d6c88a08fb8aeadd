package graft

/** Scratch sweep runner: prints PlanLint findings for every registered
  * query (used to seed the sanction list; the enforcing sweep lives in
  * QueriesSmokeSpec).
  */
object PlanLintSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val sfDir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val findings = graft.plans.PlanLint.lint(fn(spark, sfDir))
        findings.foreach(f => println(s"LINT $name: $f"))
      } catch {
        case e: Throwable => println(s"LINT-ERR $name: ${e.getMessage.take(120)}")
      }
    }
    println("SWEEP-DONE")
    spark.stop()
  }
}
