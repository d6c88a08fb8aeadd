package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Library-robustness cases the query registry never hits: empty
  * inputs and degenerate shapes must flow through, not throw.
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private def emptyEvidence = Seq.empty[(Long, Long, String, Double, Option[Int])]
    .toDF("diseaseId", "targetId", "datasourceId", "score", "year")
    .withColumn("year", col("year").cast("int"))

  test("association chain yields empty output on empty evidence") {
    val by = AssociationScore.byDatasource(emptyEvidence)
    assert(by.count() == 0)
    val overall = AssociationScore.overall(by,
      Seq(("A", 1.0)).toDF("datasourceId", "weight"))
    assert(overall.count() == 0)
    assert(Novelty.attach(overall, Seq("diseaseId", "targetId")).count() == 0)
  }

  test("dedup operators yield empty output on empty documents") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exactRank(docs).count() == 0)
    assert(Dedup.minhashLshPairs(docs).count() == 0)
    assert(Dedup.ngramJaccard(docs.withColumn("block", lit("b")),
      blockCol = "block").count() == 0)
    assert(Dedup.clusters(Seq.empty[(Long, Long)].toDF("idA", "idB")).count() == 0)
  }

  test("similarity search yields empty output on empty corpus or queries") {
    val emb = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val one = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(SimilaritySearch.bruteForceTopK(emb, one).count() == 0)
    assert(SimilaritySearch.bruteForceTopK(one, emb).count() == 0)
    assert(SimilaritySearch.cosineNearDupPairs(emb).count() == 0)
  }

  test("round-5 operators survive empty and degenerate inputs") {
    val docs = Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")
    assert(Sampling.packSequences(docs, 512).count() == 0)
    assert(Rollups.peakYearCorrelation(
      AssociationScore.byDatasource(emptyEvidence)).count() == 0)
    assert(Multimodal.extractFeatures(Multimodal.textToBmp(docs)).count() == 0)
    assert(Multimodal.wavFeatures(Multimodal.textToWav(docs)).count() == 0)
    // empty text falls back to a single zero byte → a valid 9×8
    // (w = 8 + 1%8) all-black BMP, decoded without error
    val blank = Seq((1L, "s", "")).toDF("doc_id", "source", "text")
    val f = Multimodal.extractFeatures(Multimodal.textToBmp(blank)).collect()
    assert(f.length == 1 && f.head.width == 9 && f.head.height == 8 &&
      f.head.r_mean == 0.0)
    // a single-source corpus correlates a source only with itself
    val ev = Seq(
      (1L, 2L, "A", 0.3, Some(1996)), (1L, 2L, "A", 0.9, Some(1998)),
      (3L, 4L, "A", 0.2, Some(1995)), (3L, 4L, "A", 0.8, Some(1999)),
      (5L, 6L, "A", 0.1, Some(1994)), (5L, 6L, "A", 0.7, Some(1997)))
      .toDF("diseaseId", "targetId", "datasourceId", "score", "year")
    val corr = Rollups.peakYearCorrelation(AssociationScore.byDatasource(ev))
      .collect()
    assert(corr.length == 1 && corr.head.getAs[Double]("r") == 1.0,
      s"self-pair must correlate perfectly: ${corr.mkString(",")}")
  }

  test("single-evidence pair produces a full dense series with one score step") {
    val ev = Seq((1L, 2L, "A", 0.6, Some(1997)))
      .toDF("diseaseId", "targetId", "datasourceId", "score", "year")
      .withColumn("year", col("year").cast("int"))
    val out = AssociationScore.byDatasource(ev)
      .orderBy("year").collect()
    // full calendar 1995..2001 (NULL score before first evidence, like
    // the reference) + the undated slot (null year, cumulative score)
    assert(out.length == 8, s"got ${out.length} rows")
    val expected = 0.6 / GraftConf.MaxScore
    out.foreach { r =>
      val year = if (r.isNullAt(3)) None else Some(r.getInt(3))
      year match {
        case Some(y) if y < 1997 => assert(r.isNullAt(4), s"year $y must be unscored")
        case _ => assert(math.abs(r.getDouble(4) - expected) < 1e-9, s"row $r")
      }
    }
  }

  test("text analysis propagates nulls instead of throwing") {
    val docs = Seq((1L, Some("the quick fox")), (2L, None))
      .toDF("doc_id", "text")
    val out = TextAnalysis.quality(TextAnalysis.tokens(docs))
      .select("doc_id", "n_tokens", "quality").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getInt(1) == 3)
    assert(byId(2L).isNullAt(1) && byId(2L).isNullAt(2),
      "null text must yield null metrics, not an exception")
  }

  test("round-6 text operators survive null and empty text") {
    val docs = Seq((1L, Some("a b c d")), (2L, None), (3L, Some("")))
      .toDF("doc_id", "text")
    // piiRedact: null propagates, empty stays empty, no exceptions
    val pii = TextAnalysis.piiRedact(docs)
      .select("doc_id", "n_email", "redacted").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(pii(1L).getInt(1) == 0)
    assert(pii(2L).isNullAt(1) && pii(2L).isNullAt(2))
    assert(pii(3L).getInt(1) == 0 && pii(3L).getString(2) == "")
    // passageDedup: null-text docs keep a row (no passages)
    val pd = operators.Dedup.passageDedup(docs, passageLen = 3)
      .select("doc_id", "n_passages", "n_kept").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(pd.size == 3, "every input row must survive")
    assert(pd(1L).getInt(1) == 2 && pd(1L).getInt(2) == 2)
    assert(pd(2L).getInt(2) == 0, "null text keeps nothing")
    // spanCoverage: null and too-short texts have zero shingles
    val sc = operators.Dedup.spanCoverage(docs)
      .select("doc_id", "n_shingles", "flagged").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(sc.size == 3)
    assert(sc(2L).getLong(1) == 0L && !sc(2L).getBoolean(2))
    assert(sc(3L).getLong(1) == 0L)
    // bpePairCounts ignores null/empty texts (single-char words are
    // filtered too, so feed one multi-char word alongside them)
    val docs2 = docs.union(Seq((4L, Some("abc"))).toDF("doc_id", "text"))
    val bp = TextAnalysis.bpePairCounts(docs2, k = 5).collect()
    assert(bp.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("ab" -> 1L, "bc" -> 1L))
  }

  test("codecs reject hostile headers with their own require, never a raw crash") {
    // WAV: negative chunk length must not loop forever or AIOOBE
    val wav = Multimodal.encodeWav(8000, 1, Array.tabulate(10)(_.toShort))
    val negLen = wav.clone()
    // first chunk is "fmt " at offset 12; poison its length field
    java.nio.ByteBuffer.wrap(negLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, -9)
    val e1 = intercept[IllegalArgumentException](Multimodal.decodeWav(negLen))
    assert(e1.getMessage.contains("corrupt RIFF chunk"))
    val overLen = wav.clone()
    java.nio.ByteBuffer.wrap(overLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, Int.MaxValue)
    val e2 = intercept[IllegalArgumentException](Multimodal.decodeWav(overLen))
    assert(e2.getMessage.contains("corrupt RIFF chunk"))

    // BMP: width chosen so 3*width overflows Int — the Long-math guard
    // must reject before any stride arithmetic wraps
    val bmp = Multimodal.encodeBmp(8, 8, _ => (0, 0, 0))
    val hugeW = bmp.clone()
    java.nio.ByteBuffer.wrap(hugeW).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, 800000000)
    val e3 = intercept[IllegalArgumentException](Multimodal.decodeBmp(hugeW))
    assert(e3.getMessage.contains("exceed"))
    // truncated pixel array: declared dims fit Int but not the payload
    val trunc = bmp.clone().take(60)
    val fixed = java.util.Arrays.copyOf(trunc, 60)
    val e4 = intercept[IllegalArgumentException](Multimodal.decodeBmp(fixed))
    assert(e4.getMessage.contains("truncated") || e4.getMessage.contains("exceed"))
  }

  test("multimodal synthesis handles empty text identically to the oracle fallback") {
    // empty text → 1-byte [0] payload on the Spark side; the oracles'
    // CASE WHEN length(text)=0 THEN 1 mirrors it. ascii('') = 0 in
    // DuckDB, so channel sums are 0 on both sides.
    val docs = Seq((1L, ""), (2L, "xyz")).toDF("doc_id", "text")
    val img = Multimodal.documentFeatures(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(img(1L).getInt(2) == 8 + 1 % 8 && img(1L).getInt(3) == 8) // w=9, h=8
    assert(img(1L).getDouble(4) == 0.0) // all-zero bytes → zero means
    val wav = Multimodal.wavFeatures(Multimodal.textToWav(docs)).toDF()
      .collect().map(r => r.getLong(0) -> r).toMap
    // all-zero bytes → every sample = -32768 → mean_abs = 32768
    assert(wav(1L).getAs[Double]("mean_abs") == 32768.0)
  }
}
