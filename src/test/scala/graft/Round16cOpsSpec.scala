package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Hand-computed pins for the round-16 continuation batch 3 (the
  * Round16OpsSpec discipline): the oracle gate proves engine
  * agreement; these prove each STATISTIC is the textbook one.
  */
class Round16cOpsSpec extends SparkSpec {
  import spark.implicits._

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("kuiperTest: disjoint supports give V = 1 with D- = 0") {
    val rows = Seq(("a", 0.01), ("a", 0.02), ("b", 0.03), ("b", 0.04))
    val out = Rollups.kuiperTest(rows.toDF("g", "v"), "g", "v", "a", "b")
      .select("n1", "n2", "d_plus", "d_minus", "v")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(out == ((2L, 2L, 1.0, 0.0, 1.0)))
  }

  test("jarqueBera: hand-computed three-point fixture") {
    // cents {0, 0, 3}: M2=18, M3=54, M4=486 -> S=54/18^1.5,
    // K=486/324-3=-1.5, JB=0.5*(S^2+K^2/4)
    val rows = Seq(("g", 0.00), ("g", 0.00), ("g", 0.03))
    val out = Rollups.jarqueBera(rows.toDF("g", "v"), "g", "v")
      .select("n", "skew", "ex_kurt", "jb")
      .as[(Long, Double, Double, Double)].head()
    val s = 54.0 / (18.0 * math.sqrt(18.0))
    assert(out == ((3L, r4(s), -1.5, r4(3.0 / 6.0 * (s * s + 1.5 * 1.5 / 4.0)))))
  }

  test("maxDrawdown: hand-traced five-day curve") {
    // flows 5,-3,1,-4,6 -> cum 5,2,3,-1,5; peak 5; dd 0,3,2,6,0
    val rows = Seq(("k", 1L, 5L), ("k", 2L, -3L), ("k", 3L, 1L),
      ("k", 4L, -4L), ("k", 5L, 6L))
    val out = Rollups.maxDrawdown(rows.toDF("k", "t", "f"), Seq("k"), "t", "f")
      .select("n", "final_level", "max_dd", "peak_at_trough", "trough_t",
        "dd_frac")
      .as[(Long, Long, Long, Long, Long, Double)].head()
    assert(out == ((5L, 5L, 6L, 5L, 4L, 1.2)))
  }

  test("maxDrawdown: tie picks the EARLIEST deepest trough") {
    // flows 2,-2,2,-2 -> dd 0,2,0,2: trough day 2, not 4
    val rows = Seq(("k", 1L, 2L), ("k", 2L, -2L), ("k", 3L, 2L),
      ("k", 4L, -2L))
    val out = Rollups.maxDrawdown(rows.toDF("k", "t", "f"), Seq("k"), "t", "f")
      .select("max_dd", "trough_t").as[(Long, Long)].head()
    assert(out == ((2L, 2L)))
  }

  test("varianceRatio: hand-computed doubling series at q=2") {
    // x=1,2,4,8,16,32: v1=5*341-31^2=744, vq=4*765-45^2=1035,
    // vr = 1035*25/(2*744*16)
    val rows = Seq(1L, 2L, 4L, 8L, 16L, 32L).zipWithIndex
      .map { case (x, i) => ("k", (i + 1).toLong, x) }
    val out = Rollups.varianceRatio(rows.toDF("k", "t", "x"),
        Seq("k"), "t", "x", q = 2)
      .select("n1", "nq", "vr", "z").as[(Long, Long, Double, Double)].head()
    val vr = 1035.0 * 25 / (2.0 * 744 * 16)
    val z = (vr - 1.0) / math.sqrt(2.0 * 3 * 1 / 6.0 / 5.0)
    assert(out == ((5L, 4L, r4(vr), r4(z))))
  }

  test("bartelsRank: hand-computed three-point fixture") {
    // x=[1,3,2] -> r2=[2,6,4]: num=16+4=20, den=56-3*16=8, rvn=2.5
    val rows = Seq(("k", 1L, 1L), ("k", 2L, 3L), ("k", 3L, 2L))
    val out = Rollups.bartelsRank(rows.toDF("k", "t", "x"), Seq("k"), "t", "x")
      .select("n", "rvn", "z").as[(Long, Double, Double)].head()
    assert(out == ((3L, 2.5, r4(0.5 / math.sqrt(0.5)))))
  }

  test("byAdjust: harmonic factor inflates BH exactly by c(m)") {
    val rows = Seq(("h1", 0.01), ("h2", 0.02), ("h3", 0.9))
    val out = Rollups.byAdjust(rows.toDF("h", "p"), "p", Seq("h"))
      .select("h", "p_adj").as[(String, Double)].collect().toMap
    val cm = 1.0 + 1.0 / 2 + 1.0 / 3
    val a3 = math.min(1.0, 0.9 * 3 * cm / 3)
    val a2 = math.min(math.min(1.0, 0.02 * 3 * cm / 2), a3)
    val a1 = math.min(math.min(1.0, 0.01 * 3 * cm / 1), a2)
    assert(out == Map("h1" -> r4(a1), "h2" -> r4(a2), "h3" -> r4(a3)))
  }

  test("concordanceAgreement: perfect correlation, imperfect concordance") {
    // x=[1,2,3], y=2x: r=1, CCC=24/66, bias=2, sd=1, loa 2∓1.96
    val rows = Seq((1L, 2L), (2L, 4L), (3L, 6L))
    val out = Rollups.concordanceAgreement(rows.toDF("x", "y"), "x", "y")
      .select("n", "r", "ccc", "bias", "sd_diff", "loa_lo", "loa_hi")
      .as[(Long, Double, Double, Double, Double, Double, Double)].head()
    assert(out == ((3L, 1.0, r4(24.0 / 66.0), 2.0, 1.0, r4(2 - 1.96),
      r4(2 + 1.96))))
  }

  test("hodgesLehmann: even total straddles the middle pair") {
    // diffs {1,2,3,4} cents -> HL = 2.5 cents = 0.025
    val rows = Seq(("a", 0.01), ("a", 0.02), ("b", 0.03), ("b", 0.05))
    val out = Rollups.hodgesLehmann(rows.toDF("g", "v"), "g", "v", "a", "b")
      .select("n1", "n2", "hl").as[(Long, Long, Double)].head()
    assert(out == ((2L, 2L, 0.025)))
  }

  test("brunnerMunzel: hand-computed five-point fixture") {
    // A={1,1,2}, B={2,3} cents: Q_A={0,0,1}, Q_B={5,6} ->
    // p̂=11/12, S²_A=1/12, S²_B=1/8, W = 12.5/(5·√0.5)
    val rows = Seq(("a", 0.01), ("a", 0.01), ("a", 0.02),
      ("b", 0.02), ("b", 0.03))
    val out = Rollups.brunnerMunzel(rows.toDF("g", "v"), "g", "v", "a", "b")
      .select("n1", "n2", "p_hat", "w_bm")
      .as[(Long, Long, Double, Double)].head()
    val md = 11.0 / (2.0 * 2) - 1.0 / (2.0 * 3) + (2.0 - 3.0) / 2.0
    val w = 3.0 * 2 * md / (5.0 * math.sqrt(3.0 / 12 + 2.0 / 8))
    assert(out == ((3L, 2L, r4(11.0 / 12), r4(w))))
  }

  test("ansariLepage: centered-B fixture gives z_w = 0, z_ab² = 3") {
    // A={1,4}, B={2,3}: AB doubled scores 2,4,4,2 -> z_a = -8/√(64/3)
    val rows = Seq(("a", 0.01), ("a", 0.04), ("b", 0.02), ("b", 0.03))
    val out = Rollups.ansariLepage(rows.toDF("g", "v"), "g", "v", "a", "b")
      .select("n1", "n2", "z_w", "z_ab", "lepage")
      .as[(Long, Long, Double, Double, Double)].head()
    val za = -8.0 / math.sqrt(64.0 / 3)
    assert(out == ((2L, 2L, 0.0, r4(za), r4(0.0 + za * za))))
  }

  test("quade: hand-traced three-block fixture") {
    // b1(x=1,y=3) b2(x=2,y=4) b3(x=1,y=5): ranges 2,2,4 -> Q2 3,3,6;
    // S4_x=-12, S4_y=12 -> F = 2·288/(3·108-288) = 16
    val rows = Seq((1L, "x", 1L), (1L, "y", 3L), (2L, "x", 2L),
      (2L, "y", 4L), (3L, "x", 1L), (3L, "y", 5L))
    val out = Rollups.quade(rows.toDF("b", "tr", "v"), "b", "tr", "v")
      .select("n_blocks", "k", "f_quade").as[(Long, Long, Double)].head()
    assert(out == ((3L, 2L, 16.0)))
  }

  test("quade: perfect agreement yields null F") {
    val rows = Seq((1L, "x", 1L), (1L, "y", 3L), (2L, "x", 2L), (2L, "y", 4L))
    val out = Rollups.quade(rows.toDF("b", "tr", "v"), "b", "tr", "v")
      .select("f_quade").as[Option[Double]].head()
    assert(out.isEmpty)
  }

  test("seasonalMannKendall: monotone series pools per-season folds") {
    // period 2 over x=t, t=1..6: S = 3+3, vn = 2·66, z = 5/√(132/18)
    val rows = (1 to 6).map(i => ("k", i.toLong, i.toLong))
    val out = Rollups.seasonalMannKendall(rows.toDF("k", "t", "x"),
        Seq("k"), "t", "x", period = 2)
      .select("n_points", "n_seasons", "s_stat", "var_s", "z")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(out == ((6L, 2L, 6L, r4(132.0 / 18), r4(5.0 / math.sqrt(132.0 / 18)))))
  }

  test("chowTest: hand-computed six-day fixture with midpoint break") {
    // days 10..15, y=[1,2,4,10,11,13]: both halves RSS=1/6,
    // pooled RSS=4584/630 -> F=((RSSp-1/3)/2)/((1/3)/2)
    val ys = Seq(1L, 2L, 4L, 10L, 11L, 13L)
    val rows = ys.zipWithIndex.map { case (y, i) => ("k", (10 + i).toLong, y) }
    val out = Rollups.chowTest(rows.toDF("k", "t", "y"), Seq("k"), "t", "y")
      .select("n", "break_t", "rss_pooled", "rss_split", "f_chow")
      .as[(Long, Long, Double, Double, Double)].head()
    val rssp = 4584.0 / 630
    val split = 1.0 / 6 + 1.0 / 6
    val f = ((rssp - 1.0 / 6 - 1.0 / 6) / 2.0) / (split / 2.0)
    assert(out == ((6L, 12L, r4(rssp), r4(split), r4(f))))
  }

  test("pacf: alternating series hand-computed Durbin-Levinson") {
    // x=[1,2,1,2,1,2]: r1=-45/54, r2=36/54, r3=-27/54 -> phi3=0.1
    val rows = Seq(1L, 2L, 1L, 2L, 1L, 2L).zipWithIndex
      .map { case (x, i) => ("k", (i + 1).toLong, x) }
    val out = Rollups.pacf(rows.toDF("k", "t", "x"), Seq("k"), "t", "x")
      .select("n", "phi1", "phi2", "phi3")
      .as[(Long, Double, Double, Double)].head()
    val r1 = -45.0 / 54; val r2 = 36.0 / 54; val r3 = -27.0 / 54
    val p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val p21 = r1 * (1.0 - p22)
    val phi3 = (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2)
    assert(out == ((6L, r4(r1), r4(p22), r4(phi3))))
  }

  test("engleGranger: hand-computed three-point pair") {
    // x=[1,2,3], y=[2,4,7]: beta=2.5, alpha=-2/3; residual micros
    // {166667,-333333,166667} -> DF gamma=-2 exactly, tau null (m=2)
    val rows = Seq((1L, 1L, 2L), (2L, 2L, 4L), (3L, 3L, 7L))
    val out = Rollups.engleGranger(rows.toDF("t", "x", "y"), "t", "x", "y")
      .select("n", "beta", "alpha", "gamma", "tau")
      .as[(Long, Double, Double, Double, Option[Double])].head()
    assert(out == ((3L, 2.5, r4(-2.0 / 3), -2.0, None)))
  }

  test("hosmerLemeshow: symmetric two-bin fixture") {
    // bin0: p=.05 x4 O=1; bin9: p=.95 x4 O=3 -> term 2.56e8/7.6e7 each
    val rows = Seq.fill(3)((0.05, false)) ++ Seq((0.05, true)) ++
      Seq.fill(3)((0.95, true)) ++ Seq((0.95, false))
    val out = Rollups.hosmerLemeshow(rows.toDF("p", "y"), "p", "y")
      .select("n", "g", "dof", "hl_chi2")
      .as[(Long, Long, Long, Double)].head()
    val term = math.floor(2.56e8 / 7.6e7 * 1e9 + 0.5) / 1e9
    assert(out == ((8L, 2L, 0L, r4(2 * term))))
  }

  test("fleissKappa: textbook two-rater three-unit fixture") {
    // units (A,A),(A,B),(B,B): P-bar=2/3, Pe=1/2, kappa=1/3
    val rows = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "B"),
      (3L, "B"), (3L, "B"))
    val out = Rollups.fleissKappa(rows.toDF("u", "c"), "u", "c", raters = 2)
      .select("n_units", "n_raters", "p_bar", "p_e", "kappa")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(out == ((3L, 2L, r4(2.0 / 3), 0.5, r4(1.0 / 3))))
  }

  test("iccOneWay: hand-computed three-unit two-rating fixture") {
    // (1,2),(3,4),(5,6): MSB=8, MSW=0.5, ICC=7.5/8.5
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L), (3L, 5L), (3L, 6L))
    val out = Rollups.iccOneWay(rows.toDF("u", "y"), "u", "y", k = 2)
      .select("n_units", "k", "msb", "msw", "icc")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(out == ((3L, 2L, 8.0, 0.5, r4(7.5 / 8.5))))
  }

  test("ordinalAssoc: asymmetric tie structure splits the two D's") {
    // cells (1,1):2 (2,2):1 (2,1):1 -> C=2 D=0 t_x=1 t_y=2
    val rows = Seq((1L, 1L), (1L, 1L), (2L, 2L), (2L, 1L))
    val out = Rollups.ordinalAssoc(rows.toDF("x", "y"), "x", "y")
      .select("n", "c_pairs", "d_pairs", "t_x", "t_y", "gamma",
        "somers_d_yx", "somers_d_xy")
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)].head()
    assert(out == ((4L, 2L, 0L, 1L, 2L, 1.0, 0.5, r4(2.0 / 3))))
  }

  test("partitionAdvisor: skew and small-part accounting") {
    // lang a x3 (100B each), b x1 (70000B): skew_milli = 3*1000*2/4
    val rows = Seq(("a", 100L), ("a", 100L), ("a", 100L), ("b", 70000L))
    val out = Layout.partitionAdvisor(rows.toDF("lang", "b"),
        Seq(Seq("lang")), col("b"))
      .select("candidate", "n_parts", "rows_total", "rows_max", "skew_milli",
        "bytes_total", "bytes_max", "small_parts", "verdict")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, String)].head()
    assert(out == (("lang", 2L, 4L, 3L, 1500L, 70300L, 70000L, 1L, "ok")))
  }

  test("hits: one hand-traced round on a three-node chain") {
    // edges 1->2, 1->3, 2->3: after round 1 auth=(0,333333,666666),
    // hub raw=(999999,666666,0), tot=1666665 -> (600000,400000,0)
    // (both divisions land exactly: 1666665*600000 = 999999*10^6)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.hits(edges, iters = 1)
      .select("id", "hub_ppm", "auth_ppm")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 600000L, 0L), (2L, 400000L, 333333L),
      (3L, 0L, 666666L)))
  }

  test("imageGrayHistogram: 'abcd' synthesizes three gray levels") {
    // n=4 -> 12x8 (h = 8 + (4 div 8) mod 8 = 8); pixel cycle
    // (c,b,a)(b,a,d)(a,d,c)(d,c,b): grays 98,97,98,99 -> 24/48/24
    val docs = Seq((1L, "abcd")).toDF("doc_id", "text")
    val out = Multimodal.imageGrayHistogram(Multimodal.textToBmp(docs))
      .collect().map(r => (r.gray, r.cnt)).sortBy(_._1).toSeq
    assert(out == Seq((97, 24L), (98, 48L), (99, 24L)))
    val wh = Multimodal.imageGrayHistogram(Multimodal.textToBmp(docs))
      .collect().head
    assert(wh.width == 12 && wh.height == 8)
  }

  test("imageColorMoments: 'abcd' exact opponent sums") {
    // rg per cycle {1,1,-3,1}, yb2 {3,-5,-1,3}, 24 of each
    val docs = Seq((1L, "abcd")).toDF("doc_id", "text")
    val m = Multimodal.imageColorMoments(Multimodal.textToBmp(docs))
      .collect().head
    assert((m.n_px, m.s_rg, m.s_rg2, m.s_yb2, m.s_yb22) ==
      ((96L, 0L, 288L, 0L, 1056L)))
  }

  test("cdcChunks: exact duplicate doc halves the distinct mass") {
    val text = (0 until 300).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val docs = Seq((1L, text, "s"), (2L, text, "s"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.cdcChunks(docs)
      .select("n_chunks", "n_distinct_chunks", "chars_total",
        "chars_distinct", "dup_ratio", "savings")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(out._1 == 2 * out._2)       // every chunk appears twice
    assert(out._3 == 600L && out._4 == 300L)
    assert(out._5 == 0.5 && out._6 == 0.5)
  }

  test("cdcChunks: chunks reconstruct the capped text exactly") {
    val text = (0 until 1000).map(i => ('a' + (i * 11) % 26).toChar).mkString
    val docs = Seq((1L, text, "s")).toDF("doc_id", "text", "source")
    val out = Dedup.cdcChunks(docs, maxChars = 512)
      .select("chars_total").as[Long].head()
    assert(out == 512L)                // bounds partition [0, L] exactly
  }

  test("theilU: hand-computed 2x2 with one predictive column") {
    // cells: (a,p)=2 (b,p)=2 (b,q)=4: H(X)=-(.25 ln .25 + .75 ln .75),
    // H(X|Y)=-(2/8 ln(1/2) * 2)
    val rows = Seq.fill(2)(("a", "p")) ++ Seq.fill(2)(("b", "p")) ++
      Seq.fill(4)(("b", "q"))
    val out = Rollups.theilU(rows.toDF("x", "y"), "x", "y")
      .select("n", "h_x", "h_x_given_y", "u")
      .as[(Long, Double, Double, Double)].head()
    def pico(x: Double): Long = math.floor(x * 1e12 + 0.5).toLong
    val hx = -(pico(0.25 * math.log(0.25)) + pico(0.75 * math.log(0.75)))
    val hxy = -(2 * pico(0.25 * math.log(0.5)) + pico(0.5 * math.log(1.0)))
    assert(out == ((8L, r4(hx / 1e12), r4(hxy / 1e12),
      r4((hx - hxy).toDouble / hx))))
  }
}
