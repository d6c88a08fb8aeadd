package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Hand-computed pins for the round-16 operator additions — each new
  * operator gets at least one fixture whose expected value was worked
  * by hand (the oracle gate proves engine agreement; these prove the
  * STATISTIC is the textbook one).
  */
class Round16OpsSpec extends SparkSpec {
  import spark.implicits._

  test("gTest: hand-computed 2x2 (balanced association)") {
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(5)(("a", "y")) ++
      Seq.fill(5)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val out = Rollups.gTest(rows.toDF("u", "v"), "u", "v")
      .select("n", "dof", "g_stat").as[(Long, Long, Double)].head()
    // G = 2[2*10 ln(10/7.5) + 2*5 ln(5/7.5)], contributions 6dp first
    val c10 = BigDecimal(10.0 * math.log(10.0 * 30 / (15.0 * 15)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val c5 = BigDecimal(5.0 * math.log(5.0 * 30 / (15.0 * 15)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = BigDecimal(2.0 * (2 * c10 + 2 * c5))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == ((30L, 1L, exp)))
  }

  test("cmh: single stratum reduces to the corrected 2x2") {
    // a=30 b=20 c=20 d=30: E=25, num=5, V=50^4/(100^2*99), OR=2.25
    val rows =
      Seq.fill(30)((1L, 1L, 1.0)) ++ Seq.fill(20)((1L, 1L, 0.0)) ++
        Seq.fill(20)((1L, 2L, 1.0)) ++ Seq.fill(30)((1L, 2L, 0.0))
    val out = Rollups.cmh(rows.toDF("day", "arm", "y"),
        col("day"), col("arm") === 1L, col("y") > 0.5)
      .select("strata", "n", "cmh_stat", "or_mh")
      .as[(Long, Long, Double, Double)].head()
    val v = BigDecimal(50.0 * 50 * 50 * 50 / (100.0 * 100 * 99))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cmh = BigDecimal((5.0 - 0.5) * (5.0 - 0.5) / v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == ((1L, 100L, cmh, 2.25)))
  }

  test("dunn: two untied groups match the textbook z") {
    val rows = Seq(("a", 0.01), ("a", 0.02), ("a", 0.03),
      ("b", 0.04), ("b", 0.05), ("b", 0.06))
    val out = Rollups.dunn(rows.toDF("g", "v"), "g", "v")
      .select("g_a", "g_b", "z").as[(String, String, Double)].head()
    // mean ranks 2 vs 5, sigma2 = N(N+1)/12 = 3.5 -> z = -3/sqrt(3.5*2/3)
    assert(out._1 == "a" && out._2 == "b")
    assert(math.abs(out._3 - (-3.0 / math.sqrt(3.5 * 2.0 / 3.0))) < 5e-4)
  }

  test("coxStuart: strictly increasing series") {
    val rows = (1 to 10).map(i => ("k", i.toLong, i.toLong))
    val out = Rollups.coxStuart(rows.toDF("k", "t", "x"), Seq("k"), "t", "x")
      .select("n", "n_pos", "n_neg", "z").as[(Long, Long, Long, Double)].head()
    assert(out._1 == 10L && out._2 == 5L && out._3 == 0L)
    assert(out._4 == BigDecimal(4.0 / math.sqrt(5.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("kpss: linear ramp and constant series") {
    val rows = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("b", 1L, 7L), ("b", 2L, 7L))
    val out = Rollups.kpss(rows.toDF("k", "t", "x"), Seq("k"), "t", "x")
      .select("k", "eta").as[(String, Option[Double])].collect().toMap
    assert(out("a").contains(0.3333)) // 18 / (3 * 18)
    assert(out("b").isEmpty)          // zero variance
  }

  test("turningPoints: zig-zag fixture") {
    val xs = Seq(1L, 3L, 2L, 4L, 3L)
    val rows = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
    val out = Rollups.turningPoints(rows.toDF("k", "t", "x"),
        Seq("k"), "t", "x")
      .select("n", "n_turning", "n_up", "z_ds")
      .as[(Long, Long, Long, Double)].head()
    assert(out == ((5L, 3L, 2L, 0.0)))
  }

  test("assortativity: a path is perfectly disassortative") {
    val out = Graph.assortativity(
        Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
      .select("n_nodes", "n_edges", "r").as[(Long, Long, Double)].head()
    assert(out == ((3L, 2L, -1.0)))
  }

  test("richClub: triangle with a pendant") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("src", "dst")
    val out = Graph.richClub(edges, Seq(1, 2, 4, 8, 16))
      .select("k", "n_nodes", "n_edges_within", "phi")
      .as[(Int, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1) == ((3L, 3L, Some(1.0)))) // the triangle is a perfect club
    assert(out(2) == ((1L, 0L, None)))      // only the hub has deg > 2
  }

  test("linkScores: path predicts the closing edge") {
    val out = Graph.linkScores(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
      .select("u", "v", "common", "jaccard", "pa")
      .as[(Long, Long, Long, Double, Long)].head()
    assert(out == ((1L, 3L, 1L, 1.0, 1L)))
  }

  test("hurstRS: an alternating series is maximally anti-persistent") {
    val rows = (0 until 32).map(i => ("k", i.toLong, (i % 2).toLong))
    val out = Rollups.hurstRS(rows.toDF("k", "t", "x"), Seq("k"), "t", "x")
      .select("rs4", "rs8", "rs16", "hurst")
      .as[(Double, Double, Double, Double)].head()
    assert(out == ((1.0, 1.0, 1.0, 0.0)))
  }

  test("signTopK with full shortlist equals brute force") {
    val vecs = (0 until 24).map { i =>
      (i.toLong, Array.tabulate(64)(j =>
        math.sin(0.7 * i + 0.13 * j).toFloat))
    }.toDF("vec_id", "embedding")
    val qs = vecs.filter(col("vec_id") % 8 === 0)
    val brute = SimilaritySearch.bruteForceTopK(vecs, qs, k = 5)
      .select("query_id", "rank", "id").as[(Long, Int, Long)].collect().toSet
    val sign = SimilaritySearch.signTopK(vecs, qs, k = 5, shortlist = 24)
      .select("query_id", "rank", "id").as[(Long, Int, Long)].collect().toSet
    assert(sign == brute) // exact re-rank of the full corpus
  }

  test("ad2Test: identical and disjoint two-point samples") {
    val same = Seq(("a", 0.01), ("a", 0.02), ("b", 0.01), ("b", 0.02))
    assert(Rollups.ad2Test(same.toDF("g", "v"), "g", "v", "a", "b")
      .select("a2").as[Double].head() == 0.0)
    val apart = Seq(("a", 0.01), ("a", 0.01), ("b", 0.02), ("b", 0.02))
    assert(Rollups.ad2Test(apart.toDF("g", "v"), "g", "v", "a", "b")
      .select("a2").as[Double].head() == 3.0)
  }

  test("squaredRanks: hand-ranked two-group fixture") {
    val rows = Seq(("a", 0.00), ("a", 0.05), ("a", 0.10),
      ("b", 0.04), ("b", 0.05), ("b", 0.06))
    val out = Rollups.squaredRanks(rows.toDF("g", "v"), "g", "v")
      .select("k", "n", "t_stat").as[(Long, Long, Double)].head()
    // pooled u ranks 1.5/3.5/5.5 doubled; A=74450/3, S4t=358, Q16=34246
    val a = 74450.0 / 3
    val exp = BigDecimal(5.0 * (a - 358.0 * 358 / 6) /
        (34246.0 - 358.0 * 358 / 6))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == ((2L, 6L, exp)))
  }

  test("thetaForecast: exact linear series folds to the known state") {
    val rows = (1 to 5).map(i => ("k", i.toLong, i.toLong))
    val out = Rollups.thetaForecast(rows.toDF("k", "t", "x"),
        Seq("k"), "t", "x")
      .select("n", "trend_slope", "ses_level", "forecast_next")
      .as[(Long, Double, Double, Double)].head()
    assert(out == ((5L, 1.0, 4.0625, 5.0313)))
  }

  test("dickeyFuller: hand-computed mean-reverting fixture") {
    val xs = Seq(10L, 11L, 9L, 12L, 8L)
    val rows = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
    val out = Rollups.dickeyFuller(rows.toDF("k", "t", "x"),
        Seq("k"), "t", "x")
      .select("n", "gamma", "tau").as[(Long, Double, Double)].head()
    assert(out._1 == 5L && out._2 == -2.4)
    assert(math.abs(out._3 - (-2.4 / math.sqrt(0.8 / (2.0 * 20)))) < 5e-4)
  }

  test("knBigramLm: symmetric two-doc corpus scores -ln(1/2)") {
    val docs = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.knBigramLm(docs)
      .select("doc_id", "n_pairs", "nll").as[(Long, Long, Double)]
      .collect().toSet
    // P = max(1-.75,0)/2 + (.75*2/2)*(1/2) = 0.5 for both bigrams
    val exp = BigDecimal(-math.log(0.5))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Set((1L, 1L, exp), (2L, 1L, exp)))
  }

  test("labelPropagation: bridged triangles settle into two communities") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("idA", "idB")
    val out = Graph.labelPropagation(edges)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(out(_) == 1L))
    assert(Seq(4L, 5L, 6L).forall(out(_) == 3L))
  }

  test("momentsRollup: 1..4 has the textbook shape stats") {
    val rows = (1 to 4).map(i => ("s", "l", i.toLong))
    val out = Profile.momentsRollup(rows.toDF("a", "b", "x"),
        Seq("a", "b"), Seq("a"), col("x"))
      .select("n_groups", "n", "mean", "sd", "skewness", "kurtosis_ex")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(out._1 == 1L && out._2 == 4L && out._3 == 2.5)
    assert(out._4 == BigDecimal(math.sqrt(1.25))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out._5 == 0.0 && out._6 == -1.36)
  }

  test("mmrTopK: the exact duplicate is deferred to last") {
    // query = x; c (id 1) rel .8; a,b (ids 2,3) identical rel-.6
    // vectors orthogonal to c. MMR: rank1 = c, rank2 = a (tie by id,
    // penalty 0), rank3 = b with mmr .42 - .3*sim(b,a)=1 -> .12.
    def v(x: Double, y: Double) = Array.tabulate(64)(j =>
      if (j == 0) x.toFloat else if (j == 1) y.toFloat else 0f)
    val corpus = Seq((1L, v(0.8, -0.6)), (2L, v(0.6, 0.8)),
      (3L, v(0.6, 0.8))).toDF("vec_id", "embedding")
    val q = Seq((0L, v(1.0, 0.0))).toDF("vec_id", "embedding")
    val out = SimilaritySearch.mmrTopK(corpus, q)
      .select("rank", "id", "mmr").as[(Int, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1) == ((1L, 0.56)))  // .7 * .8
    assert(out(2) == ((2L, 0.42)))  // .7 * .6 - .3 * 0
    assert(out(3)._1 == 3L && math.abs(out(3)._2 - 0.12) < 5e-4)
  }

  test("conformalCalibration: structural guarantees on one group") {
    val rows = (0 until 40).map(i => ("g", i.toLong, (i % 10) / 10.0 + 1.0))
    val out = Rollups.conformalCalibration(rows.toDF("g", "id", "v"),
        "g", "v", "id")
      .select("n_cal", "n_test", "q_hat", "coverage", "nominal")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(out._1 + out._2 == 40L && out._1 > 0 && out._2 > 0)
    assert(out._3 >= 0.0 && out._4 >= 0.0 && out._4 <= 1.0 && out._5 == 0.9)
  }

  test("deming: an exact line recovers slope 2, intercept 0") {
    val rows = (1 to 10).map(i => (i.toLong, 2L * i))
    val out = Rollups.deming(rows.toDF("x", "y"), "x", "y")
      .select("n", "slope", "intercept").as[(Long, Double, Double)].head()
    assert(out == ((10L, 2.0, 0.0)))
  }

  test("bloomSkipReport invariants: actual <= bloom <= minmax <= total") {
    val rows = (0 until 200).map(i => (i.toLong, (i * 37 % 50).toLong))
    val out = Layout.bloomSkipReport(rows.toDF("id", "k"), "id", "k",
        rowsPerFile = 20, probeEvery = 5)
      .select("files_total", "files_minmax", "files_bloom", "files_actual")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (tot, mm, bl, ac) =>
      assert(ac <= bl && bl <= mm && mm <= tot)
    }
  }
}
