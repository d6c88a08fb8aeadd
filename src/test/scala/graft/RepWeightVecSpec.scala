package graft

import org.apache.spark.sql.functions._

/** Pins [[graft.functions.RepWeightVec]] to the Column chain it
  * replaced (r17): element r must equal weight·cents and element
  * reps+r the weight, where weight is the
  * `when(bucket < t_k, k)…otherwise(|thresholds|)` chain over
  * `conv(substring(md5(concat(id, prefix, rep)), 1, 6), 16, 10)`.
  * Random ids include multi-byte and supplementary-plane code points
  * (the JaroWinkler astral-pin pattern) so the UTF-8 digesting is
  * covered, not just ASCII.
  */
class RepWeightVecSpec extends SparkSpec {
  import spark.implicits._

  private val poisson = graft.operators.Rollups.PoissonThresholds

  test("RepWeightVec ≡ md5/conv/when chain (Poisson + coin, unicode ids)") {
    val rng = new scala.util.Random(42)
    val astral = Seq("😀", "é", "中", "a", "Z", "9", ":")
    val ids = (1 to 200).map { i =>
      val extra = (1 to rng.nextInt(6)).map(_ =>
        astral(rng.nextInt(astral.size))).mkString
      s"id-$i$extra"
    } :+ "" :+ "0"
    val cents = ids.indices.map(i => (i - 100).toLong * 37L)
    val df = ids.zip(cents).toDF("id", "c")
    val reps = 7

    for (th <- Seq(poisson, Seq(8388608L))) {
      val native = df.select(col("id"), col("c"),
        graft.functions.RepWeightVec.repWeightVec(
          col("id"), col("c"), ":boot:", reps, th).as("v"))
      val bucket = conv(substring(
        md5(concat(col("id"), lit(":boot:"), col("rep").cast("string"))),
        1, 6), 16, 10).cast("long")
      val weight = th.zipWithIndex
        .foldLeft(Option.empty[org.apache.spark.sql.Column]) {
          case (acc, (t, k)) =>
            Some(acc.fold(when(bucket < t, k))(_.when(bucket < t, k)))
        }.get.otherwise(th.size).cast("long")
      val ref = df
        .withColumn("rep", explode(sequence(lit(0), lit(reps - 1))))
        .withColumn("w", weight)
        .groupBy("id", "c")
        .agg(sort_array(collect_list(struct(col("rep"), col("w")))).as("ws"))
        .select(col("id"), col("c"),
          concat(transform(col("ws"), s => s("w") * col("c")),
            transform(col("ws"), s => s("w"))).as("v"))
      val joined = native.as("n").join(ref.as("r"), Seq("id", "c"))
        .select(col("n.v").as("nv"), col("r.v").as("rv"))
        .collect()
      assert(joined.length == ids.size)
      joined.foreach { row =>
        assert(row.getSeq[Long](0) == row.getSeq[Long](1))
      }
    }
  }

  test("null id / null cents propagate to null") {
    val df = Seq((Some("a"), Some(5L)), (None, Some(5L)), (Some("a"), None))
      .toDF("id", "c")
    val out = df.select(graft.functions.RepWeightVec.repWeightVec(
      col("id"), col("c"), ":x:", 3, Seq(1L)).as("v")).collect()
    assert(out(0).getSeq[Long](0).length == 6)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
  }
}
