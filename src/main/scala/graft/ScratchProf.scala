package graft

/** Throwaway stage profiler for optimization rounds — NOT a query
  * surface. Times successive prefixes of the q104/q09 chain.
  */
object ScratchProf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-scratch")
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.sources.Tables(spark, dir)
    def time(name: String)(f: => Long): Unit = {
      // warm once, then min of 3
      val walls = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val w = (System.nanoTime() - t0) / 1e9
        (w, n)
      }
      val best = walls.drop(1).map(_._1).min
      println(f"PROF $name%-28s min3=${best}%.3f rows=${walls.head._2}")
    }
    import graft.operators._
    time("byDatasource.dense") {
      AssociationScore.byDatasource(t.evidence).count()
    }
    time("overall.dense") {
      AssociationScore.overall(
        AssociationScore.byDatasource(t.evidence), t.weights).count()
    }
    time("q104.rollingAnomaly") {
      Novelty.rollingAnomaly(
        AssociationScore.overall(
          AssociationScore.byDatasource(t.evidence), t.weights),
        Seq("diseaseId", "targetId")).count()
    }
    time("q09.peaks") {
      Novelty.peaks(
        AssociationScore.overall(
          AssociationScore.byDatasource(t.evidence), t.weights),
        Seq("diseaseId", "targetId"))
        .filter(org.apache.spark.sql.functions.col("peak") > 0).count()
    }
    spark.stop()
  }
}
