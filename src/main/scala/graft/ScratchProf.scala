package graft

/** Throwaway stage profiler for optimization rounds — NOT a query
  * surface. Times registered queries (min over reps after a warm rep)
  * in the current session; Spark confs can be injected via -Dspark.*
  * system properties (e.g. the state-store provider for the r17
  * RocksDB experiment).
  *
  * Usage: runMain graft.ScratchProf <sfDir> <q1,q2,...> [reps]
  */
object ScratchProf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val qs = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-scratch")
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.get("SPARK_GRAFT_ROCKSDB").contains("1"))
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        graft.streaming.EventStream.RocksDbProvider)
    println("PROF stateStoreProvider=" + spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass").getOrElse("default(HDFSBacked)"))
    qs.foreach { q =>
      val fn = SparkEntry.queries(q)
      val walls = (0 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROF $q%-28s min${reps}=${walls.drop(1).map(_._1).min}%.3f rows=${walls.head._2}")
    }
    spark.stop()
  }
}
