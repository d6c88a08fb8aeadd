package graft

import graft.functions.{BottomKSample, KllBuffer, KllSketch}
import org.apache.spark.sql.functions._

/** The quantile-sketch family contract (VERDICT r13 item 3):
  *
  *  - [[KllBuffer]]: rank error of every φ estimate stays within the
  *    pinned ε on adversarial input ORDERS and distributions, under
  *    direct build AND under arbitrary merge trees (the compactor is
  *    not merge-order invariant — the ERROR BOUND is what holds).
  *  - `n` carried by the summary is always the exact count.
  *  - State stays O(k) items no matter how many rows went in.
  *  - [[BottomKSample]]: the merge-order-INVARIANT member — rollup
  *    path (store fine arrays, explode, re-aggregate) equals the
  *    direct coarse sketch EXACTLY, bit for bit.
  */
class KllSketchSpec extends SparkSpec {

  /** Pinned rank-error bound for k=256 (theoretical KLL ε at k=256 is
    * ~1%; the deterministic alternating parity measured ≤ ~0.8% worst
    * case over the grids below — 2.5% leaves ≥3× margin, and q334's
    * end-to-end gate uses the same figure).
    */
  private val Eps = 0.025
  private val K = 256

  private def exactRankFrac(sorted: Array[Double], v: Double): Double = {
    // rank of v = #items <= v (upper bound via binary search)
    var lo = 0
    var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toDouble / sorted.length
  }

  private val phis = Array(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  private def checkErrors(data: Array[Double], sketch: KllBuffer, tag: String): Unit = {
    val sorted = data.sorted
    assert(sketch.n == data.length, s"$tag: n drifted")
    val ests = sketch.quantiles(phis)
    phis.indices.foreach { i =>
      val err = math.abs(exactRankFrac(sorted, ests(i)) - phis(i))
      assert(err <= Eps,
        s"$tag: phi=${phis(i)} est=${ests(i)} rank err $err > $Eps")
    }
  }

  private def dataSets(n: Int): Seq[(String, Array[Double])] = {
    // deterministic pseudo-random stream (LCG) — no Math.random in specs
    def lcg(seed: Long): Iterator[Long] =
      Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)
    val uniform = lcg(42).map(s => (s >>> 11).toDouble / (1L << 53).toDouble)
      .take(n).toArray
    val zipf = uniform.map(u => math.pow(1.0 - u * 0.9999999, -1.2))
    val sorted = uniform.sorted
    val reverse = sorted.reverse
    val duplicated = uniform.map(u => math.floor(u * 37) / 37.0)
    Seq("uniform" -> uniform, "zipf" -> zipf, "sorted-asc" -> sorted,
      "sorted-desc" -> reverse, "heavy-dupes" -> duplicated)
  }

  test("KLL rank error ≤ ε across distributions, orders, sizes (direct build)") {
    for (n <- Seq(5000, 200000); (tag, data) <- dataSets(n)) {
      val b = new KllBuffer(K)
      data.foreach(b.add)
      checkErrors(data, b, s"$tag/n=$n")
    }
  }

  test("KLL rank error ≤ ε under arbitrary merge trees") {
    val data = dataSets(120000).head._2
    // tree 1: 8 sequential chunks merged left-to-right
    // tree 2: 64 chunks merged pairwise (balanced)
    // tree 3: skewed — one big chunk absorbing 63 tiny ones
    def build(chunk: Array[Double]): KllBuffer = {
      val b = new KllBuffer(K); chunk.foreach(b.add); b
    }
    val t1 = data.grouped(15000).map(build).reduce { (a, c) => a.mergeIn(c); a }
    checkErrors(data, t1, "merge-seq8")
    def pairwise(bufs: Seq[KllBuffer]): KllBuffer =
      if (bufs.size == 1) bufs.head
      else pairwise(bufs.grouped(2).map { g =>
        if (g.size == 2) { g(0).mergeIn(g(1)); g(0) } else g(0)
      }.toSeq)
    val t2 = pairwise(data.grouped(1875).map(build).toSeq)
    checkErrors(data, t2, "merge-balanced64")
    val chunks3 = data.grouped(1875).map(build).toSeq
    val t3 = chunks3.head
    chunks3.tail.foreach(t3.mergeIn)
    checkErrors(data, t3, "merge-skewed")
  }

  test("KLL state stays O(k): serialized size flat from 10k to 1M rows") {
    def sizeAt(n: Int): Int = {
      val b = new KllBuffer(K)
      var i = 0
      var s = 123456789L
      while (i < n) {
        s = s * 6364136223846793005L + 1442695040888963407L
        b.add((s >>> 11).toDouble)
        i += 1
      }
      b.serializeBytes().length
    }
    val s10k = sizeAt(10000)
    val s1m = sizeAt(1000000)
    // 100× the rows may add a few levels (≤ ~log n), never 100× bytes
    assert(s1m < s10k * 2, s"state grew superlogarithmically: $s10k → $s1m")
    assert(s1m < 16 * 1024, s"state over 16KB at k=$K: $s1m")
  }

  test("serialization roundtrip preserves the summary exactly") {
    val data = dataSets(30000)(1)._2
    val b = new KllBuffer(K)
    data.foreach(b.add)
    val back = KllBuffer.deserializeBytes(b.serializeBytes())
    assert(back.n == b.n)
    assert(back.quantiles(phis).toSeq == b.quantiles(phis).toSeq)
  }

  test("kll_state → kll_merge rollup in Spark: n exact, quantiles within ε, SQL ≡ API") {
    import graft.functions.KllSketch._
    val s = spark
    import s.implicits._
    val n = 60000
    val df = spark.range(n)
      .select(col("id"),
        (conv(substring(md5(concat(col("id"), lit(":kq"))), 1, 15), 16, 10)
          .cast("double") / 1e18).as("v"),
        pmod(col("id"), lit(7)).as("g"),
        pmod(col("id"), lit(70)).as("fine"))
      .localCheckpoint()
    // fine-grain states → rollup to g: quantile estimates within ε of
    // exact, carried n exact
    val fine = df.groupBy("g", "fine").agg(kllState(col("v")).as("st"))
    val rolled = fine.groupBy("g")
      .agg(kllQuantiles(col("st"), Seq(0.5)).as("q"),
        kllMerge(col("st")).as("merged"))
      .select(col("g"), element_at(col("q"), 1).as("p50"),
        kllN(col("merged")).as("n_sketch"))
    val exact = df.groupBy("g")
      .agg(count(lit(1)).as("n_exact"),
        percentile(col("v"), lit(0.5)).as("p50_exact"))
    val joined = rolled.join(exact, "g").collect()
    assert(joined.length == 7)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_sketch") == r.getAs[Long]("n_exact"),
        s"sketch n != exact n for g=${r.getAs[Long]("g")}")
      // v is uniform on [0,1): rank error ≈ value error
      val d = math.abs(r.getAs[Double]("p50") - r.getAs[Double]("p50_exact"))
      assert(d <= Eps * 2, s"p50 drifted $d for g=${r.getAs[Long]("g")}")
    }
    // SQL surface ≡ Column API (the I5b contract)
    df.createOrReplaceTempView("kll_in")
    val viaSql = spark.sql(
      """SELECT g, element_at(kll_quantiles(st, array(0.5D)), 1) AS p50
        |FROM (SELECT g, fine, kll_state(v) AS st FROM kll_in GROUP BY 1, 2)
        |GROUP BY g""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaApi = fine.groupBy("g")
      .agg(kllQuantiles(col("st"), Seq(0.5)).as("q"))
      .select(col("g"), element_at(col("q"), 1))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaApi, "kll SQL surface drifted from the Column API")
  }

  test("FreqSketch (Misra–Gries): bounds + completeness under any merge tree") {
    import graft.functions.MgBuffer
    // Zipf-ish synthetic stream: item i appears ~N/i times, plus a
    // long uniform tail — heavy heads MUST survive, tails may not
    val k = 16
    val items = (1 to 40).flatMap(i => Seq.fill(2000 / i)(s"w$i")) ++
      (0 until 3000).map(i => s"tail${i % 600}")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size.toLong
    def check(b: MgBuffer, tag: String): Unit = {
      val est = {
        val m = scala.collection.mutable.Map.empty[String, Long]
        b.counts.forEach((w, c) => m(w) = c)
        m.toMap
      }
      assert(est.size <= k, s"$tag: state over k")
      est.foreach { case (w, e) =>
        assert(e <= exact(w), s"$tag: $w over-counted $e > ${exact(w)}")
        assert((exact(w) - e) * (k + 1) <= n,
          s"$tag: $w under bound: ${exact(w) - e} > n/(k+1)")
      }
      exact.foreach { case (w, c) =>
        if (c * (k + 1) > n)
          assert(est.contains(w), s"$tag: guaranteed-heavy $w missing")
      }
    }
    // direct build
    val direct = new MgBuffer(k)
    items.foreach(direct.insert(_, 1L))
    check(direct, "direct")
    // skewed merge tree over sequential chunks (mergeIn MUTATES the
    // receiver, so each path builds its parts fresh)
    def parts(): Seq[MgBuffer] = items.grouped(700).map { chunk =>
      val b = new MgBuffer(k); chunk.foreach(b.insert(_, 1L)); b
    }.toSeq
    val seq = parts()
    val merged = seq.head
    seq.tail.foreach(merged.mergeIn)
    check(merged, "merge-seq")
    // weighted re-insertion of a stored summary ≡ merge (the rollup path)
    val reinserted = new MgBuffer(k)
    parts().foreach { p =>
      p.counts.forEach((w, c) => reinserted.insert(w, c))
    }
    check(reinserted, "rollup-weighted")
  }

  test("BottomKSample: rollup path equals direct sketch EXACTLY") {
    val s = spark
    import s.implicits._
    import BottomKSample._
    val df = spark.range(40000)
      .select(col("id"), bottomKHash(col("id")).as("h"),
        (col("id") % 997).cast("double").as("v"),
        pmod(col("id"), lit(5)).as("g"),
        pmod(col("id"), lit(40)).as("fine"))
      .localCheckpoint()
    val direct = df.groupBy("g")
      .agg(bottomKSample(col("h"), col("v"), 64).as("sample"))
    val rolled = df.groupBy("g", "fine")
      .agg(bottomKSample(col("h"), col("v"), 64).as("sample"))
      .select(col("g"), explode(col("sample")).as("x"))
      .groupBy("g")
      .agg(bottomKSample(col("x.h"), col("x.v"), 64).as("sample"))
    val d = direct.select(col("g"), to_json(col("sample")).as("j"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val r = rolled.select(col("g"), to_json(col("sample")).as("j"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == r, "bottom-k rollup path diverged from the direct sketch")
    // and the sample is full: k rows per group (40000/5 ≫ 64)
    val sizes = direct.select(size(col("sample"))).collect().map(_.getInt(0))
    assert(sizes.forall(_ == 64))
  }
}
