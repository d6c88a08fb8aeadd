package graft

import graft.operators._
import graft.sources.{Io, Tables}
import graft.streaming.{AssociationStream, EventStream, StreamQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — query registry + DuckDB oracle SQL.
  *
  * Column names are aligned between each query and its oracle (the
  * driver sorts columns by name before hashing). All float outputs are
  * rounded only at the final projection on both sides (SURVEY.md §3).
  */
object SparkEntry {

  /** Flagship: the reference's complete pipeline — indirect evidence →
    * cumulative per-source scores → weighted overall → novelty — on
    * sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q10_full_pipeline")(spark, "/root/testdata/sf0.001")

  /** Scratch space for the IO-exercising queries (q77–q79) — see
    * [[Scratch]]: per-JVM temp root, shutdown-hook cleanup. q77's
    * bucketed tables additionally live under spark-warehouse (bucketBy
    * requires saveAsTable); they are dropped+rewritten per invocation
    * and removed at exit so nothing persists across runs.
    */
  private lazy val q77Cleanup: Unit =
    sys.addShutdownHook {
      for (tb <- Seq("li_q77", "ord_q77"))
        Scratch.deleteTree(java.nio.file.Paths.get(s"spark-warehouse/$tb"))
    }
  private def scratchDir(tag: String): String = Scratch.dir(tag)

  // Shared SQL fragments for the oracles (DuckDB dialect).
  private val EvSql =
    """ev AS (
      |  SELECT l_suppkey AS diseaseId, l_partkey AS targetId,
      |         l_returnflag AS datasourceId, l_discount*10 AS score,
      |         CAST(year(l_shipdate) AS INT) AS year
      |  FROM lineitem
      |)""".stripMargin

  /** Language-ID replay CTE (`langpred(doc_id, lang, score_*, lang_pred)`)
    * — mirrors graft.operators.TextAnalysis.langId; shared by q36/q166.
    */
  private val LangPredSql =
    """toks AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS w,
      |         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE) AS n
      |  FROM documents
      |),
      |langscores AS (
      |  SELECT doc_id, lang,
      |    round((len(list_filter(w, x -> x = 'der')) + len(list_filter(w, x -> x = 'und'))
      |         + len(list_filter(w, x -> x = 'die'))) / n, 4) AS score_de,
      |    round((len(list_filter(w, x -> x = 'the')) + len(list_filter(w, x -> x = 'a'))
      |         + len(list_filter(w, x -> x = 'of'))) / n, 4) AS score_en,
      |    round((len(list_filter(w, x -> x = 'el')) + len(list_filter(w, x -> x = 'la'))
      |         + len(list_filter(w, x -> x = 'y'))) / n, 4) AS score_es,
      |    round((len(list_filter(w, x -> x = 'le')) + len(list_filter(w, x -> x = 'la'))
      |         + len(list_filter(w, x -> x = 'et'))) / n, 4) AS score_fr
      |  FROM toks
      |),
      |langpred AS (
      |  SELECT doc_id, lang, score_de, score_en, score_es, score_fr,
      |       CASE WHEN greatest(score_de, score_en, score_es, score_fr) <= 0 THEN 'und'
      |            WHEN score_de = greatest(score_de, score_en, score_es, score_fr) THEN 'de'
      |            WHEN score_en = greatest(score_de, score_en, score_es, score_fr) THEN 'en'
      |            WHEN score_es = greatest(score_de, score_en, score_es, score_fr) THEN 'es'
      |            ELSE 'fr' END AS lang_pred
      |  FROM langscores
      |)""".stripMargin

  /** Word-3-gram shingles per doc (ordered, with duplicates), docs with
    * ≥3 words only — mirrors graft.operators.Dedup.shingles.
    */
  private val ShinglesSql =
    """shingled AS (
      |  SELECT doc_id AS id,
      |         list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |  WHERE len(w) >= 3
      |)""".stripMargin

  /** ×1000-quantized embeddings + L2 norm — mirrors
    * graft.functions.quantize/quantizedDot (integer math, exact).
    */
  private val EmbSql =
    """nrm AS (
      |  SELECT vec_id, q,
      |         sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS n
      |  FROM (
      |    SELECT vec_id,
      |           list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      |    FROM embeddings
      |  )
      |)""".stripMargin

  /** Voronoi-assignment CTE for the IVF oracles: rank `cents` cells per
    * vector by cosine (ties by cell id), keep the best `keep`.
    */
  private def IvfAssignSql(cents: String, out: String, keep: Int, where: String = ""): String =
    s"""$out AS (
       |  SELECT vec_id, q, n, cell FROM (
       |    SELECT e.vec_id, e.q, e.n, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             CAST(list_sum(list_transform(range(1, 65), i -> e.q[i] * c.cv[i])) AS DOUBLE)
       |               / (e.n * c.cn) DESC, c.cell) AS r
       |    FROM nrm e CROSS JOIN $cents c $where
       |  ) WHERE r <= $keep
       |)""".stripMargin

  /** One Lloyd step for the IVF oracle: per-cell per-dim mean of the
    * `keep`=1 assignment `assigned`, re-quantized — mirrors
    * SimilaritySearch.lloydStep (integer sums are exact in doubles, so
    * the mean and its round are engine-identical).
    */
  private def IvfLloydSql(assigned: String, out: String): String =
    s"""${out}_m AS (
       |  SELECT cell, pos, CAST(round(avg(v)) AS BIGINT) AS mv
       |  FROM (SELECT cell, unnest(q) AS v, unnest(range(1, 65)) AS pos FROM $assigned)
       |  GROUP BY 1, 2
       |),
       |$out AS (
       |  SELECT cell, cv,
       |         sqrt(CAST(list_sum(list_transform(cv, x -> x * x)) AS DOUBLE)) AS cn
       |  FROM (SELECT cell, list(mv ORDER BY pos) AS cv FROM ${out}_m GROUP BY cell)
       |)""".stripMargin

  /** MinHash-LSH near-dup pair CTE chain (ends in `lshpairs`) —
    * mirrors graft.operators.Dedup.minhashLshPairs; shared by the q31
    * and q47 oracles. Requires [[ShinglesSql]]'s `shingled`.
    */
  private val MinhashPairsSql =
    s"""$ShinglesSql,
       |sig AS (
       |  SELECT id, j, min(md5(CAST(j AS VARCHAR) || ':' || s)) AS m
       |  FROM (SELECT id, unnest(sh) AS s FROM shingled)
       |  CROSS JOIN (SELECT unnest(range(1, 13)) AS j) seeds
       |  GROUP BY id, j
       |),
       |banded AS (
       |  SELECT id, (j - 1) // 4 AS band, md5(string_agg(m, '|' ORDER BY j)) AS bucket
       |  FROM sig GROUP BY id, (j - 1) // 4
       |),
       |bsz AS (SELECT band, bucket, count(*) AS n FROM banded GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT a.id AS idA, b.id AS idB
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
       |  JOIN bsz ON bsz.band = a.band AND bsz.bucket = a.bucket
       |   AND bsz.n <= ${graft.GraftConf.LshBucketCap}
       |),
       |verified AS (
       |  SELECT c.idA, c.idB,
       |         round(CAST(len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh))) AS DOUBLE)
       |               / len(list_distinct(list_concat(sa.sh, sb.sh))), 3) AS jaccard
       |  FROM cand c
       |  JOIN shingled sa ON sa.id = c.idA
       |  JOIN shingled sb ON sb.id = c.idB
       |),
       |lshpairs AS (SELECT idA, idB, jaccard FROM verified WHERE jaccard >= 0.8)""".stripMargin

  /** `[257^15 mod 1e9+7, …, 257^0]` — the per-position weights of a
    * 16-byte Rabin–Karp window, inlined into the q46 oracle so DuckDB
    * needs no modpow.
    */
  private val RollingPowsSql: String = {
    val arr = new Array[Long](16)
    var p = 1L
    var i = 15
    while (i >= 0) { arr(i) = p; p = p * graft.functions.RollingMinHash.Base % graft.functions.RollingMinHash.Mod; i -= 1 }
    arr.mkString("[", ", ", "]")
  }

  /** Deterministic 8-plane LSH bucketing of the quantized embeddings —
    * mirrors graft.operators.SimilaritySearch.lshBucket. Requires the
    * `nrm` CTE from [[EmbSql]].
    */
  private val LshSql =
    """planes AS (
      |  SELECT p, list_transform(range(1, 65), i ->
      |           CASE WHEN substring(md5(CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1)
      |                     IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END) AS sgn
      |  FROM (SELECT unnest(range(1, 9)) AS p)
      |),
      |proj AS (
      |  SELECT e.vec_id, pl.p,
      |         CAST(list_sum(list_transform(range(1, 65), i -> e.q[i] * pl.sgn[i])) AS BIGINT) AS pr
      |  FROM nrm e CROSS JOIN planes pl
      |),
      |bkt AS (
      |  SELECT vec_id, string_agg(CASE WHEN pr >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
      |  FROM proj GROUP BY 1
      |),
      |withb AS (SELECT n.vec_id, n.q, n.n, b.bucket FROM nrm n JOIN bkt b USING (vec_id))""".stripMargin

  /** DuckDB replica of [[graft.operators.Sampling.hashBucket]]: decode
    * the first 6 hex nibbles of `md5Expr` positionally (DuckDB has no
    * hex→int conv; ascii arithmetic is exact) and take mod 100.
    */
  private def HexBucketSql(md5Expr: String): String =
    s"""CAST(list_sum(list_transform(range(1, 7), i ->
       |  (CASE WHEN ascii(substring($md5Expr, CAST(i AS INT), 1)) >= 97
       |        THEN ascii(substring($md5Expr, CAST(i AS INT), 1)) - 87
       |        ELSE ascii(substring($md5Expr, CAST(i AS INT), 1)) - 48 END)
       |  * CAST(pow(16, 6 - i) AS BIGINT))) AS BIGINT) % 100""".stripMargin

  /** Positional hex decode of nibbles [start, start+len) (1-based) of
    * `hexExpr` into a BIGINT — [[HexBucketSql]]'s ascii trick,
    * generalized. Exact for len ≤ 13 (16^12 = 2^48 is an exact double
    * and the sum stays under 2^53).
    */
  private def HexValSql(hexExpr: String, start: Int, len: Int): String =
    s"""CAST(list_sum(list_transform(range(0, $len), i ->
       |  (CASE WHEN ascii(substring($hexExpr, CAST($start + i AS INT), 1)) >= 97
       |        THEN ascii(substring($hexExpr, CAST($start + i AS INT), 1)) - 87
       |        ELSE ascii(substring($hexExpr, CAST($start + i AS INT), 1)) - 48 END)
       |  * CAST(pow(16, $len - 1 - i) AS BIGINT))) AS BIGINT)""".stripMargin

  /** α·m² for the p=12 HLL estimator, computed in Scala with the same
    * association as HllRegisters.estimate and serialized losslessly —
    * the oracle parses the identical double back.
    */
  private val HllAlphaM2: String = {
    val m = 4096.0
    java.lang.Double.toString(0.7213 / (1 + 1.079 / m) * m * m)
  }

  /** Register-replay chain for the HLL oracle: rebuild
    * [[graft.functions.HllSketch]]'s registers from md5(valueExpr)
    * (idx = hex nibbles 1–3, 52-bit payload = nibbles 4–16, rank =
    * 53 − bitlen) and evaluate the identical estimator — the harmonic
    * denominator is the exact integer Σ2^(53−M) on both engines, so
    * the doubles agree bit for bit. Ends in `<alias>_est(event_type,
    * est)`.
    */
  private def HllChainSql(
      alias: String,
      valueExpr: String,
      groupExpr: String = "event_type",
      groupName: String = "event_type",
      table: String = "events"): String =
    s"""${alias}_h AS (
       |  SELECT $groupExpr AS $groupName, md5(CAST($valueExpr AS VARCHAR)) AS hx FROM $table
       |),
       |${alias}_reg AS (
       |  SELECT $groupName, idx,
       |         max(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS mr
       |  FROM (
       |    SELECT $groupName,
       |           ${HexValSql("hx", 1, 3)} AS idx,
       |           ${HexValSql("hx", 4, 13)} AS w
       |    FROM ${alias}_h
       |  )
       |  GROUP BY 1, 2
       |),
       |${alias}_est AS (
       |  SELECT $groupName,
       |         CASE WHEN raw <= CAST(10240 AS DOUBLE) AND zeros > 0
       |              THEN CAST(4096 AS DOUBLE)
       |                   * ln(CAST(4096 AS DOUBLE) / CAST(zeros AS DOUBLE))
       |              ELSE raw END AS est
       |  FROM (
       |    SELECT $groupName, 4096 - count(*) AS zeros,
       |           $HllAlphaM2 / (CAST(
       |             CAST(sum(CAST(pow(2, 53 - mr) AS HUGEINT)) AS HUGEINT)
       |             + (4096 - count(*)) * CAST(pow(2, 53) AS HUGEINT)
       |           AS DOUBLE) / CAST(pow(2, 53) AS DOUBLE)) AS raw
       |    FROM ${alias}_reg GROUP BY 1
       |  )
       |)""".stripMargin

  /** 8 chained synchronous PageRank rounds over preceding `edges` /
    * `deg` / `nodes` / `nn` / `r0` CTEs — the oracle-side unroll of
    * graft.operators.Graph.pageRank's driver loop.
    */
  private val PageRankItersSql: String = (1 to 8).map { i =>
    s"""c$i AS (
       |  SELECT e.dst AS id, sum(r.rank / d.deg) AS csum
       |  FROM edges e JOIN r${i - 1} r ON e.src = r.id JOIN deg d ON e.src = d.src
       |  GROUP BY 1
       |),
       |r$i AS (
       |  SELECT n.id, (1 - 0.85) / nn.n + 0.85 * coalesce(c.csum, 0) AS rank
       |  FROM nodes n CROSS JOIN nn LEFT JOIN c$i c USING (id)
       |)""".stripMargin
  }.mkString(",\n")

  /** Per-document integer stats CTE `d` for the Gopher-rule oracles —
    * mirrors graft.operators.TextAnalysis.gopherRules's inputs
    * (word/alpha-word/symbol/stopword counts, all integer-exact).
    */
  private val GopherDocSql: String = {
    val stopSum = graft.operators.TextAnalysis.GopherStopwords
      .map(w => s"(CASE WHEN list_contains(string_split(text, ' '), '$w') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""d AS (
       |  SELECT doc_id, text, lang,
       |         CASE WHEN len(text) = 0 THEN 0
       |              ELSE CAST(len(string_split(text, ' ')) AS BIGINT) END AS n,
       |         CAST(len(text) AS BIGINT) AS l,
       |         CAST(len(list_filter(string_split(text, ' '),
       |                x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS aw,
       |         CAST(len(text) - len(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS sym,
       |         CAST($stopSum AS INT) AS sh
       |  FROM documents
       |)""".stripMargin
  }

  /** The composite Gopher pass predicate over [[GopherDocSql]]'s `d`,
    * parameterized on the stopword threshold (q52 uses the paper's 2;
    * q58's curation run relaxes to 1 — the synthetic corpus caps at 1).
    */
  private def gopherPassPred(minStop: Int): String =
    s"""(n BETWEEN 30 AND 100000)
       |         AND (n > 0 AND (l - (n - 1)) >= 3 * n AND (l - (n - 1)) <= 10 * n)
       |         AND (aw * 10 >= n * 8) AND (sh >= $minStop) AND (sym * 10 <= l)""".stripMargin

  /** Ontology-propagated ("indirect") evidence CTE: every evidence row
    * copied to its disease's self+ancestors — mirrors
    * graft.operators.OntologyPropagate over sources.Tables.ontology.
    */
  private val IndirectEvSql =
    s"""${EvSql.replace("ev AS", "ev0 AS")},
       |ont AS (
       |  SELECT s.s_suppkey AS id,
       |         list_distinct([CAST(s.s_suppkey AS BIGINT),
       |          CAST(s.s_nationkey + 100 AS BIGINT),
       |          CAST(n.n_regionkey + 200 AS BIGINT)]) AS nodes
       |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
       |),
       |ev AS (
       |  SELECT unnest(o.nodes) AS diseaseId, e.targetId, e.datasourceId, e.score, e.year
       |  FROM ev0 e JOIN ont o ON e.diseaseId = o.id
       |)""".stripMargin

  /** Per-(pair, datasource, year) cumulative harmonic score over
    * whatever `ev` CTE precedes it, years 1995..2002 (2002 = undated
    * surrogate), NULL score before first evidence. Mirrors
    * graft.operators.AssociationScore.byDatasource.
    */
  private val BySourceTail =
    s"""pairs AS (SELECT DISTINCT diseaseId, targetId, datasourceId FROM ev),
       |years AS (SELECT CAST(unnest(range(1995, 2003)) AS INT) AS year),
       |ranked AS (
       |  SELECT p.diseaseId, p.targetId, p.datasourceId, y.year, e.score,
       |         row_number() OVER (
       |           PARTITION BY p.diseaseId, p.targetId, p.datasourceId, y.year
       |           ORDER BY e.score DESC) AS rn
       |  FROM pairs p CROSS JOIN years y
       |  LEFT JOIN ev e ON e.diseaseId = p.diseaseId AND e.targetId = p.targetId
       |    AND e.datasourceId = p.datasourceId AND e.year <= y.year
       |),
       |bysource AS (
       |  SELECT diseaseId, targetId, datasourceId, year,
       |         sum(score/(rn*rn)) / 1.6449340668482264 AS score
       |  FROM ranked WHERE rn <= 50
       |  GROUP BY 1, 2, 3, 4
       |)""".stripMargin

  private val BySourceSql = s"$EvSql,\n$BySourceTail"

  /** Correlation summary + two-sided p over whatever `j` CTE of
    * (yearA, yearB) matched pairs precedes it. Mirrors
    * graft.operators.Rollups.correlate + functions.PearsonTwoSidedP:
    * p derives from the PUBLISHED 2dp r via the A&S 26.7.3/26.7.4
    * integer-df t-CDF recurrences, replayed here as recursive CTEs
    * with the SAME left-associated double op order as the native
    * expression's loops — change both together or the 4dp hashes
    * drift. The enclosing query must open with WITH RECURSIVE.
    */
  /** CTE block of the correlation+p tail (everything before the final
    * projection) — factored so q178 can reuse the chain as a CTE.
    */
  private val CorrPCtesSql =
    """c0 AS (
      |  SELECT datasourceIdA, datasourceIdB, CAST(count(*) AS BIGINT) AS n,
      |         round(corr(CAST(yearA AS DOUBLE), CAST(yearB AS DOUBLE)), 2) AS r
      |  FROM j GROUP BY 1, 2 HAVING count(*) >= 3
      |),
      |cb AS (
      |  SELECT *, abs(r) AS rho, 1.0 - abs(r)*abs(r) AS c2, n - 2 AS df
      |  FROM c0
      |),
      |pev AS (
      |  SELECT datasourceIdA AS ia, datasourceIdB AS ib, CAST(1 AS BIGINT) AS k,
      |         CAST(1.0 AS DOUBLE) AS term, CAST(1.0 AS DOUBLE) AS s,
      |         df // 2 AS m, c2, rho
      |  FROM cb WHERE r IS NOT NULL AND rho < 1.0 AND df % 2 = 0
      |  UNION ALL
      |  SELECT ia, ib, k + 1,
      |         term * c2 * (2*k - 1) / (2*k),
      |         s + term * c2 * (2*k - 1) / (2*k), m, c2, rho
      |  FROM pev WHERE k <= m - 1
      |),
      |pod AS (
      |  SELECT datasourceIdA AS ia, datasourceIdB AS ib, CAST(1 AS BIGINT) AS k,
      |         sqrt(c2) AS u,
      |         CASE WHEN df >= 3 THEN sqrt(c2) ELSE CAST(0.0 AS DOUBLE) END AS s,
      |         (df - 3) // 2 AS mm, c2, rho
      |  FROM cb WHERE r IS NOT NULL AND rho < 1.0 AND df % 2 = 1
      |  UNION ALL
      |  SELECT ia, ib, k + 1,
      |         u * c2 * (2*k) / (2*k + 1),
      |         s + u * c2 * (2*k) / (2*k + 1), mm, c2, rho
      |  FROM pod WHERE k <= mm
      |),
      |pa AS (
      |  SELECT ia, ib, rho * s AS av FROM pev WHERE k = m
      |  UNION ALL
      |  SELECT ia, ib, (2.0 / pi()) * (asin(rho) + rho * s) AS av
      |  FROM pod WHERE k = greatest(mm + 1, CAST(1 AS BIGINT))
      |)""".stripMargin

  /** Final projection over [[CorrPCtesSql]]. */
  private val CorrPSelectSql =
    """SELECT b.datasourceIdA, b.datasourceIdB, b.n, b.r,
      |       CASE WHEN b.r IS NULL THEN NULL
      |            WHEN b.rho >= 1.0 THEN 0.0
      |            ELSE round(greatest(0.0, 1.0 - pa.av), 4) END AS p_value
      |FROM cb b LEFT JOIN pa ON pa.ia = b.datasourceIdA AND pa.ib = b.datasourceIdB""".stripMargin

  private val CorrPTailSql = s"$CorrPCtesSql\n$CorrPSelectSql"

  /** Weighted overall harmonic score per (pair, year), over the
    * preceding `bysource` CTE.
    */
  private val OverallTail =
    """weights(datasourceId, weight) AS (VALUES ('A', 1.0), ('N', 0.5), ('R', 0.2)),
      |overall AS (
      |  SELECT diseaseId, targetId, year,
      |         sum(CASE WHEN rn <= 50 THEN wscore/(rn*rn) END) / 1.6449340668482264 AS score
      |  FROM (
      |    SELECT b.diseaseId, b.targetId, b.year, b.score * w.weight AS wscore,
      |           row_number() OVER (
      |             PARTITION BY b.diseaseId, b.targetId, b.year
      |             ORDER BY b.score * w.weight DESC NULLS LAST) AS rn
      |    FROM bysource b LEFT JOIN weights w USING (datasourceId)
      |  )
      |  GROUP BY 1, 2, 3
      |)""".stripMargin

  private val OverallSql = s"$BySourceSql,\n$OverallTail"

  /** Novelty attachment over the preceding `overall` CTE + final
    * projection — mirrors graft.operators.Novelty.attach.
    */
  /** Novelty-attached series as a reusable CTE chain ending in `att`
    * (diseaseId, targetId, year, score 4dp, novelty 3dp) — shared by
    * the q03/q10 tails and the q171 timeline pivot.
    */
  private val NoveltyCtesSql =
    """peaks AS (
      |  SELECT diseaseId, targetId, year AS peakYear,
      |         coalesce(score, 0) - lag(coalesce(score, 0)) OVER (
      |           PARTITION BY diseaseId, targetId ORDER BY year) AS peak
      |  FROM overall
      |),
      |decayed AS (
      |  SELECT diseaseId, targetId, peakYear + d.delta AS year,
      |         round(max(peak / (1 + exp(2.0 * (d.delta - 2.0)))), 3) AS novelty
      |  FROM peaks CROSS JOIN (SELECT unnest(range(0, 11)) AS delta) d
      |  WHERE peak > 0
      |  GROUP BY 1, 2, 3
      |),
      |att AS (
      |  SELECT o.diseaseId, o.targetId,
      |         CASE WHEN o.year = 2002 THEN NULL ELSE o.year END AS year,
      |         round(o.score, 4) AS score,
      |         coalesce(n.novelty, 0.0) AS novelty
      |  FROM overall o
      |  LEFT JOIN decayed n
      |    ON n.diseaseId = o.diseaseId AND n.targetId = o.targetId AND n.year = o.year
      |)""".stripMargin

  private val NoveltyTailSql =
    s"""$NoveltyCtesSql
       |SELECT * FROM att""".stripMargin

  /** Insertion-ordered so Bench measures queries in a deterministic,
    * comparable order across runs and rounds.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(
    "q01_assoc_datasource" -> ((s, dir) => {
      val t = Tables(s, dir)
      AssociationScore.byDatasource(t.evidence)
        .withColumn("score", round(col("score"), 4))
    }),
    "q02_assoc_overall" -> ((s, dir) => {
      val t = Tables(s, dir)
      AssociationScore.overall(AssociationScore.byDatasource(t.evidence), t.weights)
        .withColumn("score", round(col("score"), 4))
    }),
    "q03_novelty" -> ((s, dir) => {
      val t = Tables(s, dir)
      val overall = AssociationScore.overall(
        AssociationScore.byDatasource(t.evidence), t.weights)
      Novelty.attach(overall, Seq("diseaseId", "targetId"))
    }),
    "q04_novelty_datasource" -> ((s, dir) => {
      val t = Tables(s, dir)
      Novelty.attach(
        AssociationScore.byDatasource(t.evidence),
        Seq("diseaseId", "targetId", "datasourceId"))
    }),
    "q171_timeline" -> ((s, dir) => {
      // plot_timeseries.py:667–805's data prep: the dense
      // score+novelty series pivoted to ordered aligned arrays per
      // pair. Registered projection serializes each array to CSV of
      // exact integers (scores ×10000, novelty ×1000 — both already
      // rounded to that grain) because the driver compare sorts and
      // hashes scalar columns; Novelty.timeline itself returns real
      // arrays.
      val t = Tables(s, dir)
      val overall = AssociationScore.overall(
        AssociationScore.byDatasource(t.evidence), t.weights)
      val tl = Novelty.timeline(
        Novelty.attach(overall, Seq("diseaseId", "targetId")),
        Seq("diseaseId", "targetId"))
      def csv(arr: org.apache.spark.sql.Column,
          scale: Int): org.apache.spark.sql.Column = array_join(
        transform(arr, v => round(v * scale).cast("long").cast("string")), ",")
      tl.select(col("diseaseId"), col("targetId"),
        array_join(transform(col("years"), _.cast("string")), ",").as("years_csv"),
        csv(col("scores"), 10000).as("scores_csv"),
        csv(col("novelty"), 1000).as("novelty_csv"))
    }),
    "q10_full_pipeline" -> ((s, dir) => {
      // the reference's end-to-end run: indirect evidence → per-source
      // cumulative scores → weighted overall → novelty
      val t = Tables(s, dir)
      val indirect = OntologyPropagate.indirect(t.evidence, t.ontology)
      val overall = AssociationScore.overall(
        AssociationScore.byDatasource(indirect), t.weights)
      Novelty.attach(overall, Seq("diseaseId", "targetId"))
    }),
    "q05_indirect" -> ((s, dir) => {
      val t = Tables(s, dir)
      OntologyPropagate.indirect(t.evidence, t.ontology)
        .groupBy("diseaseId", "datasourceId")
        .agg(
          count(lit(1)).as("n_evidence"),
          round(sum("score"), 4).as("sum_score"))
    }),
    "q06_evidence_dating" -> ((s, dir) => {
      val t = Tables(s, dir)
      // The year dim arrives as an ISO date STRING and is parsed with
      // the reference's split-on-'-' idiom (timestamp_evidence.py:
      // 218–246) — functions.yearFromDateString — not with year() on a
      // typed column.
      val orderDim = t.orders
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderDate"))
        .select(col("o_orderkey"),
          graft.functions.yearFromDateString(col("orderDate")).as("orderYear"))
      val candidates = t.lineitem
        .join(orderDim, col("l_orderkey") === col("o_orderkey"), "left")
        .withColumn("studyYear",
          when(col("l_returnflag") === "R", year(col("l_shipdate")).cast("int")))
        .withColumn("curationYear",
          when(col("l_linenumber") <= 2, year(col("l_shipdate")).cast("int") - 1))
      Dating.bestDate(candidates, Seq("studyYear", "curationYear", "orderYear"))
        .groupBy("l_orderkey")
        .agg(
          min("year").as("year"),
          count(lit(1)).as("n_items"),
          array_join(array_sort(collect_set("l_returnflag")), ",").as("flags"))
        .withColumnRenamed("l_orderkey", "orderkey")
    }),
    "q07_union_recover" -> ((s, dir) => {
      val t = Tables(s, dir)
      val enriched = t.events
        .filter(col("event_type").isin("click", "view"))
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      Dating.recoverUndated(enriched, t.events, "event_id")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          count(col("k")).as("n_k"),
          sum("k").cast("bigint").as("sum_k"))
    }),
    "q08_dated_counts" -> ((s, dir) => {
      val t = Tables(s, dir)
      val sparse = t.lineitem
        .withColumn("datasourceId", col("l_returnflag"))
        .withColumn("year",
          when(col("l_returnflag") === "R", year(col("l_shipdate")).cast("int"))
            .when(col("l_linenumber") <= 2, year(col("l_shipdate")).cast("int") - 1))
      Dating.datedCounts(sparse)
    }),
    "q09_peaks" -> ((s, dir) => {
      val t = Tables(s, dir)
      val overall = AssociationScore.overall(
        AssociationScore.byDatasource(t.evidence), t.weights)
      Novelty.peaks(overall, Seq("diseaseId", "targetId"))
        .withColumn("peak", round(col("peak"), 4))
        .filter(col("peak") > 0)
        .select("diseaseId", "targetId", "peakYear", "peak")
    }),
    "q11_top_rank" -> ((s, dir) => {
      val t = Tables(s, dir)
      Rollups.topRank(t.orders, Seq("o_custkey"),
          Seq(col("o_totalprice").desc, col("o_orderkey")), n = 1)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    }),
    "q12_first_year" -> ((s, dir) => {
      val t = Tables(s, dir)
      Rollups.attachWindowAgg(
          Rollups.attachWindowAgg(t.evidence, Seq("targetId"), min("year"), "first_year"),
          Seq("targetId", "datasourceId"), max("score"), "max_score")
        .select(col("targetId"), col("datasourceId"), col("first_year"),
          round(col("max_score"), 4).as("max_score"))
        .distinct()
    }),
    "q13_distinct_rollup" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.evidence
        .groupBy("year", "datasourceId")
        .agg(
          countDistinct(col("targetId")).as("n_targets"),
          countDistinct(concat_ws("|", col("diseaseId"), col("targetId"))).as("n_pairs"))
    }),
    "q14_crosstab" -> ((s, dir) => {
      val t = Tables(s, dir)
      Rollups.crosstab(t.evidence, Seq("year"), "datasourceId", Seq("A", "N", "R"))
    }),
    "q15_approval_composite" -> ((s, dir) => {
      // the reference's "novelty predicts approvals" chain
      // (novelty_approval.py:340–430). The per-pair association/
      // novelty chain is computed only for pairs the drug dim can
      // emit: the first-approval key set is broadcast-semi-joined
      // below the whole chain (exact — the chain is per-pair
      // independent).
      val t = Tables(s, dir)
      val first = Approvals.firstApprovalTargets(t.drugs, t.drugLinks)
      val ev = t.evidence.join(
        broadcast(first.select("diseaseId", "targetId").distinct()),
        Seq("diseaseId", "targetId"), "left_semi")
      val nv = Novelty.attach(
        AssociationScore.byDatasource(ev),
        Seq("diseaseId", "targetId", "datasourceId"))
      Approvals.approvalComposite(first, nv, t.datatypes,
        yearLo = 1995, yearHi = 1998)
    }),
    "q17_phase_union" -> ((s, dir) => {
      // the approval composite's second branch
      // (novelty_approval.py:432–478): clinical-phase milestones
      // (novelty=1) unioned with the novelty peaks, post-approval
      // early-phase rows discarded, datatype fallback to the raw id
      val t = Tables(s, dir)
      val nd = t.drugs.join(t.drugLinks, Seq("drugId"))
        .transform(Rollups.attachWindowAgg(_, Seq("targetId"), min("approvalYear"), "minY"))
        .filter(col("minY") === col("approvalYear"))
        .select("drugId", "targetId", "diseaseId", "approvalYear")
        .distinct()
      val ev = t.evidence.join(
        broadcast(nd.select("diseaseId", "targetId").distinct()),
        Seq("diseaseId", "targetId"), "left_semi")
      val nv = Novelty.attach(AssociationScore.byDatasource(ev),
        Seq("diseaseId", "targetId", "datasourceId"))
      val novRows = nv.join(broadcast(nd), Seq("diseaseId", "targetId"))
        .filter(col("novelty") > 0 && col("year").isNotNull)
        .transform(Rollups.attachWindowAgg(
          _, Seq("targetId", "datasourceId"), max("novelty"), "maxN"))
        .filter(col("novelty") === col("maxN"))
        .select("targetId", "datasourceId", "approvalYear", "year", "novelty")
      val phases = t.lineitem.select(
          col("l_orderkey").as("drugId"), col("l_partkey").as("targetId"),
          when(col("l_linenumber").isin(1, 2), "1/2")
            .otherwise(col("l_linenumber").cast("string")).as("datasourceId"),
          year(col("l_shipdate")).cast("int").as("evYear"))
        .join(broadcast(nd.select("drugId", "targetId", "approvalYear").distinct()),
          Seq("drugId", "targetId"))
        .groupBy("targetId", "datasourceId", "drugId", "approvalYear")
        .agg(min("evYear").as("year"))
        .select("targetId", "datasourceId", "approvalYear", "year")
      Approvals.phaseUnion(novRows, phases, t.datatypes, Seq("1/2", "3"))
        .groupBy("datatypeId")
        .agg(countDistinct("targetId").as("targets"))
    }),
    "q16_ta_ranked" -> ((s, dir) => {
      // prioritized therapeutic-area mapping
      // (novelty_distribution.py:60–110)
      val t = Tables(s, dir)
      val expl = t.ontology.select(
        col("id").as("diseaseId"), explode(col("ancestors")).as("ta"))
      Rollups.rankedDimPick(expl, "diseaseId", "ta", t.taPriority, "ranking")
        .join(broadcast(t.taNames), Seq("ta"), "left")
        .select(col("diseaseId"), col("ta").as("therapeuticArea"),
          col("taName").as("therapeuticAreaName"))
    }),
    "q18_novel_by_ta" -> ((s, dir) => {
      // the distribution analysis' headline rollup
      // (novelty_distribution.py:598–638): novelty snapshot at a year,
      // TA mapping inner-joined, excluded TAs/diseases filtered out,
      // distinct associations per (datasource, TA name)
      val t = Tables(s, dir)
      val nv = Novelty.attach(AssociationScore.byDatasource(t.evidence),
        Seq("diseaseId", "targetId", "datasourceId"))
      val expl = t.ontology.select(
        col("id").as("diseaseId"), explode(col("ancestors")).as("ta"))
      val taMap = Rollups.rankedDimPick(expl, "diseaseId", "ta", t.taPriority, "ranking")
        .join(broadcast(t.taNames), Seq("ta"), "left")
      val excludedTas = Seq(203L, 204L)
      nv.filter(col("novelty") >= 0.1 && col("year") === 1999)
        .join(taMap, Seq("diseaseId"))
        .filter(!col("ta").isin(excludedTas: _*))
        .groupBy("datasourceId", "taName")
        .agg(countDistinct(concat_ws("|", col("targetId"), col("diseaseId")))
          .as("association"))
    }),
    "q19_peak_correlation" -> ((s, dir) => {
      // the notebook's noveltyCorrelation analysis (analysis.ipynb
      // cell 1) distributively: first peak year per (pair, source),
      // pair-keyed self-join (exchange reused), corr per source pair
      val t = Tables(s, dir)
      Rollups.peakYearCorrelation(AssociationScore.byDatasource(t.evidence))
    }),
    "q86_shuffled_correlation" -> ((s, dir) => {
      // the correlation's null model: peak years deterministically
      // permuted within each source (hash-ordered rank-to-rank in
      // bounded md5-shard lanes), then the same corr aggregate
      val t = Tables(s, dir)
      Rollups.peakYearCorrelationShuffled(
        AssociationScore.byDatasource(t.evidence))
    }),
    "q87_pii_redact" -> ((s, dir) => {
      // PII detect + redact. The synthetic corpus carries no natural
      // PII, so the query deterministically salts an email / IPv4 /
      // phone span (gated on doc_id residues, values derived from
      // doc_id) into each text — same pattern as q38/q67's payload
      // synthesis — then the generic regex machinery must find and
      // strip exactly those spans: the oracle replays the salting and
      // the redaction, and the md5 of the redacted text mismatches on
      // any span-boundary bug.
      val t = Tables(s, dir)
      val salted = t.documents.select(col("doc_id"), col("source"),
        concat(
          substring(col("text"), 1, 40), lit(" "),
          when(col("doc_id") % 2 === 0,
            concat(lit("user"), (col("doc_id") % 100).cast("string"),
              lit("@mail"), (col("doc_id") % 7).cast("string"),
              lit(".example.com "))).otherwise(lit("")),
          when(col("doc_id") % 3 === 0,
            concat(lit("10.0."), (col("doc_id") % 256).cast("string"),
              lit("."), expr("(doc_id div 256) % 256").cast("string"),
              lit(" "))).otherwise(lit("")),
          when(col("doc_id") % 5 =!= 0,
            concat(lit("415-555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
              lit(" "))).otherwise(lit("")),
          expr("substring(text, 41)")).as("text"))
      TextAnalysis.piiRedact(salted)
        .select(col("doc_id"), col("source"),
          col("n_email"), col("n_ip"), col("n_phone"),
          md5(col("redacted")).as("redacted_md5"))
    }),
    "q93_span_coverage" -> ((s, dir) => {
      // duplicated-span document filter: share of each doc's distinct
      // 3-shingles that occur in another doc; > 0.8 flags boilerplate
      val t = Tables(s, dir)
      Dedup.spanCoverage(t.documents, threshold = 0.8)
        .select(col("doc_id"), col("n_shingles"), col("n_shared"),
          col("dup_frac"), col("flagged"))
    }),
    "q89_temperature_mix" -> ((s, dir) => {
      // temperature-scaled source rebalancing: rate_s = min(1,
      // budgetFrac·N·n_s^τ / (Σ n_t^τ · n_s)), keep iff the doc's
      // md5 uniform clears its source's rate
      val t = Tables(s, dir)
      Sampling.temperatureSample(t.documents,
          temperature = 0.7, budgetFrac = 0.4)
        .select(col("doc_id"), col("source"), col("rate"))
    }),
    "q88_passage_dedup" -> ((s, dir) => {
      // Dolma-style paragraph dedup over 3-word passages: an instance
      // survives iff it is the globally-first (doc, pos) occurrence of
      // its content; kept_md5 re-hashes the surviving text, so a
      // wrong keep decision anywhere mismatches
      val t = Tables(s, dir)
      Dedup.passageDedup(t.documents, passageLen = 3)
        .select(col("doc_id"), col("source"),
          col("n_passages"), col("n_kept"), col("kept_md5"))
    }),
    "q20_tpch_q1" -> ((s, dir) => {
      val t = Tables(s, dir)
      val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t.lineitem
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(disc), 2).as("sum_disc_price"),
          round(sum(disc * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),
    "q21_join_topk" -> ((s, dir) => {
      val t = Tables(s, dir)
      broadcast(t.customer.filter(col("c_mktsegment") === "BUILDING"))
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"), col("revenue"))
    }),
    "q22_asof" -> ((s, dir) => {
      val t = Tables(s, dir)
      val ev = t.events
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts")
        .agg(max("event_id").as("click_event_id"))
        .withColumn("click_ts", col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      AsOfJoin.asOf(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq("click_event_id", "click_ts"))
        .select(col("event_id"), col("user_id"), col("value"), col("click_event_id"),
          (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
    }),
    "q48_range_join" -> ((s, dir) => {
      // clicks landing inside a 2-hour window after each purchase of
      // the same user — the binned interval-join shape
      val t = Tables(s, dir)
      val ev = t.events
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("p_start"),
          timestamp_micros(unix_micros(col("ts")) + 7200L * 1000000L).as("p_end"))
      RangeJoin.binned(clicks, purchases, Seq("user_id"), "ts", "p_start", "p_end")
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          (unix_micros(col("ts")) - unix_micros(col("p_start"))).as("gap_us"))
    }),
    "q38_multimodal" -> ((s, dir) => {
      // REAL image decode: each text becomes a genuine 24-bit BMP
      // (headers, stride padding, bottom-up BGR rows), and the feature
      // extractor parses it back; the oracle recomputes the channel
      // means from the text bytes, so any decoder offset bug mismatches
      val t = Tables(s, dir)
      Multimodal.documentFeatures(t.documents)
    }),
    "q67_wav_decode" -> ((s, dir) => {
      // REAL audio decode: PCM-16 RIFF/WAVE payloads synthesized from
      // the text bytes, parsed back by the chunk-walking WAV reader
      val t = Tables(s, dir)
      Multimodal.wavFeatures(Multimodal.textToWav(t.documents))
        .toDF()
        .select(col("doc_id"), col("sample_rate"), col("n_samples"),
          round(col("mean_abs"), 4).as("mean_abs"))
    }),
    "q68_bmp_resize" -> ((s, dir) => {
      // REAL resize: decode BMP → nearest-neighbor 8×8 → re-encode →
      // decode again for stats; the oracle replays the source-pixel
      // index arithmetic ((x·w)/8, (y·h)/8) on the raw text bytes
      val t = Tables(s, dir)
      Multimodal.extractFeatures(
          Multimodal.resize(Multimodal.textToBmp(t.documents), 8, 8))
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
          round(col("r_mean"), 4).as("r_mean"),
          round(col("g_mean"), 4).as("g_mean"),
          round(col("b_mean"), 4).as("b_mean"))
    }),
    "q44_frame_sample" -> ((s, dir) => {
      // video-style frame sampling over binary payloads (every 4th
      // 64-byte window); md5 makes the binary frames hash-comparable
      val t = Tables(s, dir)
      val media = t.documents.select(
        col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.sampleFrames(media).toDF()
        .select(col("doc_id"), col("frame_idx"),
          md5(col("frame")).as("frame_md5"))
    }),
    "q40_window_tumbling" -> ((s, dir) => {
      val t = Tables(s, dir)
      EventWindows.tumbling(t.events, "1 hour", Seq("event_type"),
          Seq(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value")))
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
    }),
    "q41_window_sliding" -> ((s, dir) => {
      val t = Tables(s, dir)
      EventWindows.sliding(t.events, "2 hours", "1 hour", Seq("event_type"),
          Seq(count(lit(1)).as("n")))
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"))
    }),
    "q42_sessionize" -> ((s, dir) => {
      val t = Tables(s, dir)
      Sessionize.sessions(t.events, gapMinutes = 30)
        .select(col("user_id"), col("session_id"), col("n_events"),
          unix_micros(col("start_ts")).as("start_us"),
          unix_micros(col("end_ts")).as("end_us"), col("duration_us"))
    }),
    "q43_json_extract" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.events
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
          count(col("k")).as("n_k"),
          round(avg("k"), 4).as("avg_k"),
          max("k").as("max_k"),
          count(when(col("k") > 50, 1)).as("n_high"))
    }),
    "q50_percentiles" -> ((s, dir) => {
      // exact interpolated percentiles per event type (both engines
      // use the same linear-interpolation definition)
      val t = Tables(s, dir)
      t.events.groupBy("event_type")
        .agg(percentile(col("value"), typedLit(Seq(0.5, 0.9, 0.99))).as("p"))
        .select(col("event_type"),
          round(element_at(col("p"), 1), 4).as("p50"),
          round(element_at(col("p"), 2), 4).as("p90"),
          round(element_at(col("p"), 3), 4).as("p99"))
    }),
    "q101_incremental_agg" -> ((s, dir) => {
      // incremental refresh: history state (events before the split)
      // merged with the delta's state must equal aggregating the full
      // input — the oracle aggregates everything directly
      val t = Tables(s, dir)
      val split = lit("1997-07-01").cast("timestamp")
      val hist = Incremental.aggState(
        t.events.filter(col("ts") < split), Seq("event_type"), "value")
      val delta = Incremental.aggState(
        t.events.filter(col("ts") >= split), Seq("event_type"), "value")
      Incremental.finish(Incremental.merge(Seq("event_type"), hist, delta))
    }),
    "q102_tpch_q3" -> ((s, dir) => {
      // TPC-H Q3 shape (shipping priority adapted to this schema):
      // segment-filtered customers, date-bracketed orders/lineitems,
      // revenue top-10
      val t = Tables(s, dir)
      val cutoff = lit("1997-06-01").cast("timestamp")
      t.customer.filter(col("c_mktsegment") === "BUILDING")
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < cutoff)
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > cutoff)
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("revenue"))
    }),
    "q103_session_transitions" -> ((s, dir) => {
      // session-scoped Markov transition matrix: 30-min-gap sessions,
      // consecutive event-type pair counts, row-normalized
      val t = Tables(s, dir)
      Sessionize.transitions(t.events, gapMinutes = 30)
        .select("from_type", "to_type", "n", "p")
    }),
    "q104_rolling_anomaly" -> ((s, dir) => {
      // trailing z-score anomaly years over the dense overall
      // association series (5-year baseline, >= 3 priors, z >= 2)
      val t = Tables(s, dir)
      val overall = AssociationScore.overall(
        AssociationScore.byDatasource(t.evidence), t.weights)
      Novelty.rollingAnomaly(overall, Seq("diseaseId", "targetId"))
        .select("diseaseId", "targetId", "year", "score", "z")
    }),
    "q105_dsir_select" -> ((s, dir) => {
      // DSIR data selection: hashed-unigram importance weights toward
      // the English slice, deterministic top-50
      val t = Tables(s, dir)
      Sampling.dsirTopK(t.documents, col("lang") === "en", k = 50)
    }),
    "q106_stratum_cap" -> ((s, dir) => {
      // per-source document cap: exact-10 uniform sample per stratum
      // via the bounded-state (priority, id) aggregate — no windows
      val t = Tables(s, dir)
      Sampling.capPerStratum(t.documents, k = 10)
    }),
    "q108_pagerank" -> ((s, dir) => {
      // PageRank over the symmetrized embedding near-dup graph:
      // duplicate-cluster centrality, 8 synchronous rounds, d=0.85
      val t = Tables(s, dir)
      val pairs = SimilaritySearch.cosineNearDupPairs(t.embeddings)
        .select("idA", "idB")
      val edges = pairs.select(col("idA").as("src"), col("idB").as("dst"))
        .unionAll(pairs.select(col("idB").as("src"), col("idA").as("dst")))
      Graph.pageRank(edges)
        .select(col("id"), round(col("rank"), 6).as("rank"))
    }),
    "q111_triangles" -> ((s, dir) => {
      // per-node triangle participation over the MinHash near-dup
      // graph — duplicate families are mutually similar, so their
      // clusters are triangle-dense (degree-oriented wedge
      // enumeration; the oracle replays the naive id-ordered
      // formulation — same triangle set)
      val t = Tables(s, dir)
      Graph.triangleCount(
        Dedup.minhashLshPairs(t.documents).select("idA", "idB"),
        "idA", "idB")
    }),
    "q112_interval_merge" -> ((s, dir) => {
      // gaps-and-islands coverage: each event opens a presence
      // interval of `value` minutes; overlapping/touching intervals
      // merge into maximal islands per user (one user-keyed exchange,
      // O(1) window state)
      val t = Tables(s, dir)
      val iv = t.events.select(
        col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("start_us"),
        (unix_micros(col("ts")) +
          floor(col("value") * 60000000L).cast("long")).as("end_us"))
      EventWindows.mergeIntervals(iv, "user_id", "start_us", "end_us", "event_id")
        .select("user_id", "island", "start_us", "end_us", "n_intervals")
    }),
    "q118_scd2" -> ((s, dir) => {
      // SCD-2 dimension history: collapse each user's consecutive
      // runs of equal event_type into versioned validity ranges
      // (run-length encoding of a keyed state stream; every step
      // rides one user-keyed exchange)
      val t = Tables(s, dir)
      EventWindows.scd2(
        t.events.withColumn("ts_us", unix_micros(col("ts"))),
        "user_id", "event_type", "ts_us", "event_id")
        .select("user_id", "version", "value",
          "valid_from_us", "valid_to_us", "is_current")
    }),
    "q113_kmv_overlap" -> ((s, dir) => {
      // KMV theta sketches with SET OPERATIONS: per-segment k-minimum
      // 60-bit md5 hashes (bounded-state aggregate, map-side
      // combined), then audience-overlap estimates — union, Jaccard,
      // intersection — from in-row array arithmetic on the tiny
      // sketch table; exact distincts alongside for calibration
      val t = Tables(s, dir)
      Kmv.overlap(t.events, "event_type", col("user_id"), k = 64)
    }),
    "q114_delta_join" -> ((s, dir) => {
      // incremental JOIN maintenance: 5% md5-split deltas of orders
      // and lineitem; the engine computes only history⋈history state
      // plus the delta rule dA⋈B' ∪ A⋈dB (broadcast deltas, history
      // never reshuffled) — the oracle recomputes the full join, so
      // the gate pins delta-path ≡ full recompute. Revenue in exact
      // 1e-4-dollar integers so the sums are associative.
      val t = Tables(s, dir)
      val revI = round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 10000).cast("long").as("rev_i")
      val o = t.orders.select("o_orderkey", "o_custkey")
      val l = t.lineitem.select(col("l_orderkey").as("o_orderkey"), revI)
      val dAc = Sampling.hashBucket(col("o_orderkey"), "dja") % 20 === 0
      val dBc = Sampling.hashBucket(col("o_orderkey"), "djb") % 20 === 0
      val (oldA, dA) = (o.filter(!dAc), o.filter(dAc))
      val (oldB, dB) = (l.filter(!dBc), l.filter(dBc))
      val histState = Incremental.aggState(
        oldA.join(oldB, "o_orderkey"), Seq("o_custkey"), "rev_i")
      val deltaState = Incremental.aggState(
        Incremental.joinDelta(oldA, dA, oldB, dB, Seq("o_orderkey")),
        Seq("o_custkey"), "rev_i")
      Incremental.merge(Seq("o_custkey"), histState, deltaState)
        .select(col("o_custkey"), col("st_n").as("n"),
          round(col("st_sum").cast("double") / 10000.0, 4).as("revenue"),
          round(col("st_min").cast("double") / 10000.0, 4).as("min_rev"),
          round(col("st_max").cast("double") / 10000.0, 4).as("max_rev"))
    }),
    "q115_image_dhash" -> ((s, dir) => {
      // perceptual image dedup: REAL BMP decode → 9×8 grayscale dHash
      // → hash-family rollup (the image-level exact-dedup key; hamming
      // distance on the halves is the near-dup relaxation)
      val t = Tables(s, dir)
      Multimodal.dhash(Multimodal.textToBmp(t.documents)).toDF()
        .groupBy("dhash_hi", "dhash_lo")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc"))
    }),
    "q116_audio_energy" -> ((s, dir) => {
      // voice-activity shape: REAL WAV decode → tumbling 50-sample
      // windows → exact integer energy + RMS per window
      val t = Tables(s, dir)
      Multimodal.wavWindows(Multimodal.textToWav(t.documents), win = 50).toDF()
        .select(col("doc_id"), col("win_idx"), col("energy"),
          round(col("rms"), 4).as("rms"))
    }),
    "q136_cdc_apply" -> ((s, dir) => {
      // CDC changelog apply: events as an ordered upsert/delete log
      // per user ('error' = tombstone); final state = last op per key
      // via one bounded max_by aggregate (O(1) state, map-side
      // combined — never a ranked window over the log), tombstoned
      // keys dropped
      val t = Tables(s, dir)
      val log = t.events.select(
        col("user_id"),
        unix_micros(col("ts")).as("us"),
        col("event_id"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
        round(col("value") * 100).cast("long").as("v_i"))
      log.groupBy("user_id")
        .agg(max_by(struct(col("op"), col("v_i")), struct(col("us"), col("event_id")))
          .as("__last"))
        .filter(col("__last.op") =!= "D")
        .select(col("user_id"),
          round(col("__last.v_i").cast("double") / 100, 4).as("last_v"))
    }),
    "q146_bm25" -> ((s, dir) => {
      // BM25 probe-query ranking: top-15 documents for a fixed 3-term
      // query — in-row tf/dl, one-row broadcast corpus stats, zero
      // wide shuffles, TakeOrdered final
      val t = Tables(s, dir)
      TextAnalysis.bm25(t.documents, Seq("spark", "stream", "vector"))
    }),
    "q147_linear_trend" -> ((s, dir) => {
      // per-datasource OLS trend of yearly evidence volume:
      // slope/intercept/R² from exact decimal moment sums, O(1)
      // aggregate state per key — never a window or self-join
      val t = Tables(s, dir)
      val series = t.evidence.groupBy("datasourceId", "year")
        .agg(count(lit(1)).as("n"))
      Rollups.linearTrend(series, Seq("datasourceId"), "year", "n")
    }),
    "q148_chunk" -> ((s, dir) => {
      // overlapping training/RAG chunks (50-word windows, 10-word
      // overlap) — entirely in-row: split + sequence + slice, a
      // map-only pass with zero exchanges
      val t = Tables(s, dir)
      TextAnalysis.chunkDocuments(t.documents, chunkSize = 50, overlap = 10)
    }),
    "q149_ohlc" -> ((s, dir) => {
      // hourly OHLC bars of event value per event_type — one map-side
      // combined aggregate, min_by/max_by against (ts, event_id) for
      // deterministic open/close under timestamp ties
      val t = Tables(s, dir)
      EventWindows.ohlcBars(t.events, Seq("event_type"), "ts", "value",
          "event_id", 3600000000L)
        .select(col("event_type"), col("bar"),
          round(col("open"), 4).as("open"), round(col("high"), 4).as("high"),
          round(col("low"), 4).as("low"), round(col("close"), 4).as("close"),
          col("n_events"))
    }),
    "q150_compaction" -> ((s, dir) => {
      // compaction planning over a synthesized file listing: customers'
      // order totals as "files" within each o_orderpriority partition,
      // quotient-binned into ≈2M-cent jobs — one window exchange
      val t = Tables(s, dir)
      val files = t.orders.groupBy(col("o_orderpriority").as("part"),
          col("o_custkey").as("file"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("bytes"))
      Layout.compactionPlan(files, Seq("part"), "file", "bytes", 2000000L)
    }),
    "q151_token_budget" -> ((s, dir) => {
      // greedy token-budget curation: longest documents first until
      // 50k words — bucketed two-phase prefix sum, never a single-task
      // global window
      val t = Tables(s, dir)
      val scored = t.documents.select(col("doc_id"),
        col("n_chars").cast("long").as("quality"),
        size(TextAnalysis.words(col("text"))).cast("long").as("n_tokens"))
      Sampling.tokenBudgetSelect(scored, "quality", "n_tokens", 50000L)
    }),
    "q152_locf" -> ((s, dir) => {
      // step-function gap fill of each datasource's yearly evidence
      // count — carried values are exact copies, no scaffold join
      val t = Tables(s, dir)
      val series = t.evidence.groupBy("datasourceId", "year")
        .agg(count(lit(1)).as("n"))
      Rollups.locf(series, Seq("datasourceId"), "year", "n")
    }),
    "q153_stream_ohlc" -> ((s, dir) => {
      // OHLC as streaming state: five scalars per (window, key) in the
      // state store, append-mode finalized windows, min_by/max_by
      // total order makes any micro-batch split merge identically
      StreamQueries.materialize(
          EventStream.tumblingOhlc(StreamQueries.streamEvents(s, dir)))
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"),
          round(col("open"), 4).as("open"), round(col("high"), 4).as("high"),
          round(col("low"), 4).as("low"), round(col("close"), 4).as("close"),
          col("n"))
    }),
    "q154_rrf" -> ((s, dir) => {
      // reciprocal-rank fusion of a lexical ranking (tf of "spark")
      // and a length ranking — both bounded top-50 TakeOrdered lists
      // before the fuse, so the rank windows never see the corpus
      val t = Tables(s, dir)
      val byTf = t.documents.select(col("doc_id"),
          size(filter(TextAnalysis.words(col("text")), x => x === lit("spark")))
            .cast("double").as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(50)
      val byLen = t.documents.select(col("doc_id"),
          col("n_chars").cast("double").as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(50)
      TextAnalysis.rrfFuse(Seq(byTf, byLen))
    }),
    "q155_mixture_entropy" -> ((s, dir) => {
      // corpus-mixture diversity: source-distribution entropy and
      // effective source count per language — two stacked map-side
      // combined aggregates, floats only in the final ln/exp
      val t = Tables(s, dir)
      Rollups.mixtureEntropy(t.documents, Seq("lang"), "source")
    }),
    "q156_ab_ztest" -> ((s, dir) => {
      // two-proportion A/B z statistic per event_type: variant B =
      // odd user_id, success = value > 0.5 — one conditional
      // map-side-combined aggregate, exact integer counts
      val t = Tables(s, dir)
      Rollups.twoProportionZ(t.events, Seq("event_type"),
        col("user_id") % 2 === 1, col("value") > 0.5,
        variantA = Some(col("user_id") % 2 === 0))
    }),
    "q157_winsorize" -> ((s, dir) => {
      // heavy-tail clamping report: exact interpolated [p10, p90] per
      // event_type (thresholds rounded 4dp on BOTH engines before
      // clamping), then the clipped-count and mean shift
      val t = Tables(s, dir)
      Rollups.winsorize(t.events, Seq("event_type"), "value")
    }),
    "q158_cube" -> ((s, dir) => {
      // full CUBE lattice over (returnflag, linestatus) with an
      // explicit grouping id — completes the subtotal family next to
      // ROLLUP (q51) and disjoint GROUPING SETS (q134); one pass
      val t = Tables(s, dir)
      t.lineitem.cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("sum_qty"),
          (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
            .cast("int").as("gid"))
    }),
    "q159_seasonal" -> ((s, dir) => {
      // monthly seasonality of each event type: 12·share vs a flat
      // year — (keys, month) aggregate then a 12-row-per-key window
      val t = Tables(s, dir)
      Rollups.seasonalIndex(t.events, Seq("event_type"), "ts")
    }),
    "q160_vocab_overlap" -> ((s, dir) => {
      // pairwise source vocabulary Jaccard — distinct (cat, token)
      // exchange, token-keyed self-join bounded by nSources² per
      // token, broadcast sizes, inclusion-exclusion in exact ints
      val t = Tables(s, dir)
      TextAnalysis.vocabularyOverlap(t.documents)
    }),
    "q161_silhouette" -> ((s, dir) => {
      // clustering-quality diagnostic over the IVF seed partition:
      // per-cell simplified silhouette from the same in-row broadcast
      // top-2 centroid scoring as cell assignment — no corpus exchange
      val t = Tables(s, dir)
      SimilaritySearch.silhouette(t.embeddings)
    }),
    "q162_js_divergence" -> ((s, dir) => {
      // pairwise source language divergence: JS over unigram
      // distributions — inner join on shared tokens + one-row totals,
      // single-only mass folded in closed form
      val t = Tables(s, dir)
      TextAnalysis.jsDivergence(t.documents)
    }),
    "q163_rfm" -> ((s, dir) => {
      // RFM segmentation with exact interpolated population quintiles
      // broadcast back — scoring is a pure projection per user
      val t = Tables(s, dir)
      EventWindows.rfm(t.events)
    }),
    "q164_user_paths" -> ((s, dir) => {
      // entry-funnel sunburst: first-3 event-type paths across users,
      // rank-filtered BEFORE any collection (hot users cost k rows)
      val t = Tables(s, dir)
      EventWindows.pathPrefixes(t.events)
    }),
    "q165_growth" -> ((s, dir) => {
      // yearly growth diagnostics per datasource: YoY deltas + CAGR
      // from one (keys) exchange carrying both window frames
      val t = Tables(s, dir)
      val series = t.evidence.groupBy("datasourceId", "year")
        .agg(count(lit(1)).as("n"))
      Rollups.growthRates(series, Seq("datasourceId"), "year", "n")
    }),
    "q166_langid_confusion" -> ((s, dir) => {
      // classifier evaluation: labeled-vs-predicted language confusion
      // matrix with per-label shares — the eval loop for G7
      val t = Tables(s, dir)
      TextAnalysis.langId(t.documents)
        .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
        .withColumn("share", round(col("n").cast("double") /
          sum(col("n")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("lang")), 4))
    }),
    "q167_percent_rank" -> ((s, dir) => {
      // cross-source score calibration: percent_rank of document
      // length within each source — rank-exact rationals, one exchange
      val t = Tables(s, dir)
      t.documents.select(col("doc_id"), col("source"), col("n_chars"),
        round(percent_rank().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("source").orderBy("n_chars")), 4).as("pr"))
    }),
    "q168_containment" -> ((s, dir) => {
      // asymmetric shingle containment — the quotation/boilerplate
      // detector Jaccard misses; same df-capped inverted-index shape
      val t = Tables(s, dir)
      Dedup.shingleContainment(t.documents, blockCol = "source",
        minContainment = 0.6)
    }),
    "q169_mad" -> ((s, dir) => {
      // robust outlier report per event type: exact median/MAD (4dp
      // before any arithmetic) + 3σ-equivalent robust-z count
      val t = Tables(s, dir)
      Rollups.madSummary(t.events, Seq("event_type"), "value")
    }),
    "q145_pmi_collocations" -> ((s, dir) => {
      // multi-word expressions: top-20 adjacent pairs by PMI with
      // support ≥ 5 — pair/unigram tables map-side combined, support
      // filter before the probability joins, TakeOrdered final
      val t = Tables(s, dir)
      TextAnalysis.pmiCollocations(t.documents)
    }),
    "q144_kaplan_meier" -> ((s, dir) => {
      // time-to-conversion survival: subjects = users, clock starts at
      // their first event, event = first purchase, censoring at the
      // corpus horizon; cohorted by the user's (deterministic
      // min_by-tie-broken) first action. Subjects collapse to
      // (cohort, day) grain before the bounded KM windows.
      val t = Tables(s, dir)
      val ev = t.events.select(col("user_id"), col("event_type"),
        col("event_id"), unix_micros(col("ts")).as("us"))
      val horizon = broadcast(ev.agg(max("us").as("hz")))
      val users = ev.groupBy("user_id")
        .agg(min("us").as("t0"),
          min_by(col("event_type"), struct(col("us"), col("event_id")))
            .as("cohort"),
          min(when(col("event_type") === "purchase", col("us"))).as("tp"))
      val subjects = users.join(horizon)
        .withColumn("event", when(col("tp").isNotNull, 1L).otherwise(0L))
        .withColumn("duration", expr("(coalesce(tp, hz) - t0) DIV 86400000000"))
      EventWindows.kaplanMeier(subjects, Seq("cohort"))
    }),
    "q143_hist_rollup" -> ((s, dir) => {
      // mergeable-histogram re-aggregation: a histogram IS the vector
      // sum of one-hot bin vectors, so fine-grain (source, lang)
      // count vectors roll up to source grain with the same
      // elementwise vector_sum that built them — any rollup path
      // equals the direct histogram, which is what the oracle bins.
      // p50/p90 then interpolate at bin grain: 32 rows per source,
      // bounded by construction, never by the data.
      val t = Tables(s, dir)
      val bins = 32
      val width = 32.0
      val bin = least(greatest(
        floor(col("n_chars").cast("double") / width), lit(0L)), lit(bins - 1L))
      val oneHot = transform(sequence(lit(0), lit(bins - 1)),
        i => when(i.cast("long") === bin, 1L).otherwise(0L))
      val rolled = t.documents
        .groupBy("source", "lang")
        .agg(graft.functions.VectorSum.vectorSum(oneHot).as("h"))
        .groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_groups"),
          graft.functions.VectorSum.vectorSum(col("h")).as("h"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("bin")
      val cum = rolled
        .select(col("source"), col("n_groups"),
          posexplode(col("h")).as(Seq("bin", "cnt")))
        .filter(col("cnt") > 0)
        .withColumn("__cum", sum("cnt").over(w))
        .withColumn("__n", sum("cnt").over(
          org.apache.spark.sql.expressions.Window.partitionBy("source")))
      import s.implicits._
      cum.join(broadcast(Seq(0.5, 0.9).toDF("p")))
        .withColumn("__t", col("p") * col("__n"))
        .filter(col("__cum") >= col("__t") &&
          (col("__cum") - col("cnt")) < col("__t"))
        .select(col("source"), col("n_groups"), col("p"),
          round((col("bin") +
            (col("__t") - (col("__cum") - col("cnt"))) / col("cnt")) * width, 4)
            .as("qest"))
    }),
    "q142_lexical_cosine" -> ((s, dir) => {
      // embedding-free near-dup discovery: TF-vector cosine ≥ 0.8 via
      // a df-capped inverted index — integer dots from bounded posting
      // lists, exact full-vector norms, rounded-boundary threshold
      val t = Tables(s, dir)
      TextAnalysis.lexicalCosinePairs(t.documents)
    }),
    "q141_bigram_lm" -> ((s, dir) => {
      // conditional fluency scoring: self-trained Laplace bigram LM,
      // mean surprisal per document — in-row pair construction, one
      // corpus exchange shared by the model tables, pair-keyed joins
      val t = Tables(s, dir)
      TextAnalysis.bigramLm(t.documents)
    }),
    "q140_autocorr" -> ((s, dir) => {
      // ACF(1..3) of the yearly evidence volume per datasource —
      // year-arithmetic pairing (gaps never misalign), decimal-exact
      // moment sums on one (datasourceId) exchange, floats only in
      // the final ratio
      val t = Tables(s, dir)
      val series = t.evidence.groupBy("datasourceId", "year")
        .agg(count(lit(1)).as("n"))
      Rollups.autocorrelation(series, Seq("datasourceId"), "year", "n")
    }),
    "q139_cusum" -> ((s, dir) => {
      // drift changepoints in daily event volume per type: one-sided
      // CUSUM in running-sum form (running sum minus its running min,
      // exact integers scaled by the series length) on one
      // (event_type) exchange; flag = cumulative excess > 10% of the
      // series' total volume
      val t = Tables(s, dir)
      val series = t.events
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      Rollups.cusumDrift(series, Seq("event_type"), "day", "n")
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n"), col("drift"), col("flag"))
    }),
    "q138_bitmap_rollup" -> ((s, dir) => {
      // exact-distinct re-aggregation: distinct counts don't add
      // across grains, but bitmaps OR — per-(event_type, day) bitset
      // files over the dense user-id domain, ORed up to event_type
      // grain for the EXACT distinct-user count (the counterpart HLL
      // rollup q135 can only approximate). OR is idempotent, so any
      // rollup path equals count(DISTINCT) — which is the oracle.
      val t = Tables(s, dir)
      t.events
        .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
        .groupBy("event_type", "day")
        .agg(graft.functions.BitmapSketch.bitmapState(col("user_id"), 1 << 16)
            .as("bm"),
          count(lit(1)).as("n"))
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_days"),
          sum("n").cast("long").as("n_events"),
          graft.functions.BitmapSketch.bitmapMergeCount(col("bm"), 1 << 16)
            .as("u_exact"))
    }),
    "q137_cms_rollup" -> ((s, dir) => {
      // sketch-grain frequency OLAP: per-(source, lang) count-min
      // counter matrices STORED as long vectors, rolled up per source
      // by ONE elementwise vector_sum — counter addition is
      // associative, so any rollup path equals the direct source-grain
      // sketch, which is what the oracle rebuilds. Estimates for the
      // global exact top-5 words are then pure projections over the
      // broadcast merged sketches.
      val t = Tables(s, dir)
      val words = t.documents.select(col("source"), col("lang"),
        explode(TextAnalysis.words(col("text"))).as("word"))
      val fine = words.groupBy("source", "lang")
        .agg(graft.functions.CmsSketch.cmsSketch(col("word")).as("sk"))
      val rolled = fine.groupBy("source")
        .agg(count(lit(1)).as("n_groups"),
          graft.functions.VectorSum.vectorSum(col("sk")).as("sk"))
      val top = words.groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word")).limit(5)
        .select("word")
      rolled.join(broadcast(top))
        .select(col("source"), col("n_groups"), col("word"),
          graft.functions.CmsSketch.cmsEstimate(col("sk"), col("word"))
            .as("cms_n"))
    }),
    "q135_hll_rollup" -> ((s, dir) => {
      // sketch re-aggregation: per-(source, lang) HLL register files
      // STORED as bytes, rolled up per source by register merge —
      // associativity means any rollup path equals the direct
      // per-source sketch, which is what the oracle computes
      val t = Tables(s, dir)
      t.documents.groupBy("source", "lang")
        .agg(graft.functions.HllSketch.hllState(col("doc_id")).as("sk"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_groups"),
          round(graft.functions.HllSketch.hllMergeEstimate(col("sk")), 4)
            .as("u_hll"))
    }),
    "q134_grouping_sets" -> ((s, dir) => {
      // disjoint grouping sets (l_returnflag), (l_linestatus) in one
      // pass: cube + grouping_id pruning — the Expand emits each row
      // once per surviving set, never one shuffle per dimension
      val t = Tables(s, dir)
      t.lineitem.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping_id().as("gid"))
        .filter(col("gid").isin(1, 2))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"), col("n"), col("gid").cast("int").as("gid"))
    }),
    "q131_mode" -> ((s, dir) => {
      // most frequent language per source: O(1)-state max(struct)
      // mode, deterministic greatest-value tie-break, no window
      val t = Tables(s, dir)
      Rollups.modePerKey(t.documents, Seq("source"), "lang")
    }),
    "q132_dim_stats" -> ((s, dir) => {
      // feature standardization fit: per-dimension mean/std of the
      // quantized embeddings from exact integer sums
      val t = Tables(s, dir)
      SimilaritySearch.dimStats(t.embeddings)
    }),
    "q133_time_weighted" -> ((s, dir) => {
      // duration-weighted average event value per user (step-function
      // holding semantics); exact cents x whole-seconds integers
      val t = Tables(s, dir)
      EventWindows.timeWeightedAvg(t.events)
    }),
    "q130_skyline" -> ((s, dir) => {
      // Pareto frontier of parts (minimize retail price AND size):
      // lossless bucket-local pruning, then one tiny global pass —
      // the raw table is never globally sorted
      val t = Tables(s, dir)
      Rollups.skyline2d(t.part, "p_retailprice", "p_size")
    }),
    "q126_window_topk_rewrite" -> ((s, dir) => {
      // written as the classic windowed top-k — per-source top-3 docs
      // by a hash priority — and REWRITTEN by the RewriteWindowTopK
      // optimizer rule into the bounded-state aggregate + posexplode
      // (plan pinned: no Window survives); the oracle replays the
      // window formulation, pinning the rewrite's semantics
      val t = Tables(s, dir)
      import org.apache.spark.sql.expressions.{Window => W}
      val prio = conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":wtk"))), 1, 13), 16, 10).cast("long")
      val w = W.partitionBy("source").orderBy(prio)
      t.documents.select("doc_id", "source", "lang", "n_chars")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
    }),
    "q124_fuzzy_match" -> ((s, dir) => {
      // blocked fuzzy record linkage: nation-blocked customer pairs
      // within Levenshtein distance 1 (native edit distance on both
      // engines — integer-exact gate)
      val t = Tables(s, dir)
      Dedup.fuzzyPairs(t.customer, "c_nationkey", "c_name", "c_custkey")
    }),
    "q125_k_anonymity" -> ((s, dir) => {
      // privacy audit: k-anonymity (group size >= 5) and l-diversity
      // (>= 3 distinct balances) over (nation, segment, balance-kilo)
      // quasi-identifiers
      val t = Tables(s, dir)
      Privacy.kAnonymity(
        t.customer,
        Seq(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).as("bal_k")),
        col("c_acctbal"), k = 5, l = 3)
    }),
    "q127_profile" -> ((s, dir) => {
      // one-scan data profile of four lineitem columns: null counts,
      // exact distincts, numeric ranges — N columns, one pass
      val t = Tables(s, dir)
      Profile.numericProfile(t.lineitem,
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_suppkey"))
    }),
    "q122_jl_project" -> ((s, dir) => {
      // Johnson-Lindenstrauss reduction 64 -> 8 dims: ±1 sign
      // projection over the quantized integer embeddings — a pure
      // per-row projection, zero shuffle; norm_ratio concentrates
      // near 1 (the JL guarantee, pinned in spec)
      val t = Tables(s, dir)
      SimilaritySearch.jlProject(t.embeddings, outDims = 8)
    }),
    "q121_ppjoin" -> ((s, dir) => {
      // EXACT similarity self-join (prefix filtering): every document
      // pair with shingle-Jaccard >= 1/2, guaranteed — the
      // deterministic complement to MinHash LSH's probabilistic
      // recall; integer threshold arithmetic end to end
      val t = Tables(s, dir)
      Dedup.prefixJaccardJoin(t.documents)
    }),
    "q120_ewma" -> ((s, dir) => {
      // EWMA-smoothed overall association score (α = 1/2): the
      // closed-form running-sum formulation rides the scoring chain's
      // (pair) exchange; power-of-two scaling keeps every step an
      // exact exponent shift, so the smoother is bit-identical across
      // engines
      val t = Tables(s, dir)
      val overall = AssociationScore.overall(
        AssociationScore.byDatasource(t.evidence), t.weights)
        .filter(col("year").isNotNull) // dated series only: engines
        // disagree on NULL sort position, and smoothing the undated
        // surrogate row is meaningless anyway
        .withColumn("s0", coalesce(col("score"), lit(0.0)))
      Rollups.ewmaHalf(overall, Seq("diseaseId", "targetId"), "year", "s0")
        .select(col("diseaseId"), col("targetId"), col("year"),
          round(col("s0"), 4).as("score"), round(col("ewma"), 4).as("ewma"))
    }),
    "q119_interpolate" -> ((s, dir) => {
      // linear gap-fill of sparse (part, supplier) yearly quantity
      // series: segment explode + endpoint blend, no calendar
      // scaffold join, one (keys) exchange
      val t = Tables(s, dir)
      val series = t.lineitem
        .groupBy(col("l_partkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("year"))
        .agg(sum(col("l_quantity").cast("long")).as("v"))
      Rollups.interpolate(series, Seq("l_partkey", "l_suppkey"))
    }),
    "q110_zorder" -> ((s, dir) => {
      // write-time Z-order layout: Morton cell per row (a z-prefix IS
      // a quadtree cell — pure projection, no global sort), per-cell
      // footer min/max stats, and pruning verdict for a query box.
      // Dimensions (quantity 1..50, day-of-year 1..366) have
      // SF-invariant ranges, so the cell grid is meaningful at every
      // scale without a normalization pre-pass.
      val t = Tables(s, dir)
      Layout.zorderStats(
        t.lineitem.select(
          col("l_quantity").cast("long").as("qty"),
          dayofyear(col("l_shipdate")).as("doy")),
        "qty", "doy", bits = 9, cellBits = 4,
        x0 = 10, x1 = 30, y0 = 90, y1 = 180)
    }),
    "q107_windowed_hll" -> ((s, dir) => {
      // approx-distinct users per tumbling hour: the HLL sketch under
      // a fixed-width epoch window (engine-portable tumbling), exact
      // count alongside
      val t = Tables(s, dir)
      t.events
        .withColumn("hour", floor(unix_micros(col("ts")) / 3600000000L).cast("long"))
        .groupBy("hour")
        .agg(
          countDistinct(col("user_id")).as("u_exact"),
          round(graft.functions.HllSketch.hllDistinct(col("user_id")), 4).as("u_hll"))
    }),
    "q99_semdedup" -> ((s, dir) => {
      // SemDeDup: embedding-cosine near-dup pairs (LSH-bucketed, q45's
      // machinery) -> connected components -> keeper = min vec_id;
      // singletons keep themselves
      val t = Tables(s, dir)
      val pairs = SimilaritySearch.cosineNearDupPairs(t.embeddings)
        .select("idA", "idB")
      val comp = Dedup.clusters(pairs).withColumnRenamed("id", "vec_id")
      t.embeddings.select(col("vec_id"))
        .join(comp, Seq("vec_id"), "left")
        .withColumn("keeper", coalesce(col("comp"), col("vec_id")))
        .withColumn("kept", col("keeper") === col("vec_id"))
        .select("vec_id", "keeper", "kept")
    }),
    "q100_epoch_mix" -> ((s, dir) => {
      // epoch-based upsampling to deterministic per-source targets
      // (0.5..3.4 epochs derived from the source hash): floor copies
      // plus a fractional md5-uniform top-up
      val t = Tables(s, dir)
      val targets = t.documents.select("source").distinct()
        .withColumn("epochs",
          lit(0.5) + (Sampling.hashBucket(col("source"), "ep") % 30)
            .cast("double") / 10.0)
      Sampling.epochMix(t.documents, targets)
        .select(col("doc_id"), col("source"), col("epochs"),
          col("n_copies"), col("epoch"))
    }),
    "q98_bpe_pairs" -> ((s, dir) => {
      // BPE training inner loop: adjacent char-pair counts weighted by
      // word frequency, computed over the distinct-word vocabulary
      val t = Tables(s, dir)
      TextAnalysis.bpePairCounts(t.documents, k = 20)
    }),
    "q97_retention" -> ((s, dir) => {
      // weekly cohort retention: cohort = first active 7-day epoch
      // period per user; rate = active users at offset / cohort size
      val t = Tables(s, dir)
      EventWindows.retention(t.events, periodDays = 7)
        .select(col("cohort_period"), col("offset"),
          col("n_active"), col("n_cohort"), col("rate"))
    }),
    "q95_funnel" -> ((s, dir) => {
      // sequential conversion funnel: earliest view -> first click at
      // or after it -> first purchase at or after that, per user
      val t = Tables(s, dir)
      EventWindows.funnel(t.events, Seq("view", "click", "purchase"))
    }),
    "q94_hist_quantiles" -> ((s, dir) => {
      // constant-state approximate quantiles: 1024-bin histogram per
      // event type (state independent of row count — q50's exact
      // percentile sorts every value), linear interpolation in-bin
      val t = Tables(s, dir)
      Rollups.histogramQuantiles(t.events, "value", Seq("event_type"),
        ps = Seq(0.5, 0.9, 0.99), lo = 0.0, hi = 400.0)
    }),
    "q51_rollup" -> ((s, dir) => {
      // ROLLUP subtotals over (datasourceId, year): per-source-year,
      // per-source, and grand-total rows in one pass
      val t = Tables(s, dir)
      t.evidence.rollup("datasourceId", "year")
        .agg(count(lit(1)).as("n"), round(sum("score"), 4).as("sum_score"))
    }),
    "q30_dedup_exact" -> ((s, dir) => {
      val t = Tables(s, dir)
      Dedup.exactRank(t.documents)
        .select("doc_id", "fp", "n_copies", "dup_rank")
    }),
    "q31_dedup_minhash" -> ((s, dir) => {
      val t = Tables(s, dir)
      Dedup.minhashLshPairs(t.documents)
    }),
    "q47_dedup_clusters" -> ((s, dir) => {
      // near-dup components: keeper = min id per cluster
      val t = Tables(s, dir)
      Dedup.clusters(Dedup.minhashLshPairs(t.documents).select("idA", "idB"))
    }),
    "q32_dedup_simhash" -> ((s, dir) => {
      val t = Tables(s, dir)
      Dedup.simhash(t.documents)
    }),
    "q33_ngram_jaccard" -> ((s, dir) => {
      val t = Tables(s, dir)
      Dedup.ngramJaccard(t.documents, blockCol = "source")
    }),
    "q34_ann_topk" -> ((s, dir) => {
      val t = Tables(s, dir)
      SimilaritySearch.bruteForceTopK(
        t.embeddings, t.embeddings.filter(col("vec_id") % 50 === 0))
    }),
    "q96_pq_ann" -> ((s, dir) => {
      // product-quantization ANN: 4 subspaces x 8-entry codebooks,
      // corpus encoded to 4 code ints, ADC search via per-query
      // lookup tables — integer squared-L2 throughout
      val t = Tables(s, dir)
      SimilaritySearch.pqTopK(
        t.embeddings, t.embeddings.filter(col("vec_id") % 50 === 0))
    }),
    "q90_int8_ann" -> ((s, dir) => {
      // quantized-index ANN: all search math on per-vector-scaled int8
      // codes (scales cancel in cosine), 4x memory of f32 saved
      val t = Tables(s, dir)
      SimilaritySearch.int8TopK(
        t.embeddings, t.embeddings.filter(col("vec_id") % 50 === 0))
    }),
    "q35_ann_lsh" -> ((s, dir) => {
      val t = Tables(s, dir)
      SimilaritySearch.lshTopK(
        t.embeddings, t.embeddings.filter(col("vec_id") % 50 === 0))
    }),
    "q39_ann_ivf" -> ((s, dir) => {
      val t = Tables(s, dir)
      SimilaritySearch.ivfTopK(
        t.embeddings, t.embeddings.filter(col("vec_id") % 50 === 0))
    }),
    "q45_cosine_neardup" -> ((s, dir) => {
      val t = Tables(s, dir)
      SimilaritySearch.cosineNearDupPairs(t.embeddings)
    }),
    "q49_ann_ivf_trained" -> ((s, dir) => {
      // the Lloyd-trained, spill-replicated IVF path (same config the
      // recall spec pins at >= 0.9)
      val t = Tables(s, dir)
      SimilaritySearch.ivfTopK(
        t.embeddings, t.embeddings.filter(col("vec_id") % 50 === 0),
        nCentroids = 8, nProbe = 4, lloydIters = 2, replication = 4)
    }),
    "q36_langid" -> ((s, dir) => {
      val t = Tables(s, dir)
      TextAnalysis.langId(t.documents)
        .select("doc_id", "lang", "score_de", "score_en", "score_es", "score_fr", "lang_pred")
    }),
    "q37_quality" -> ((s, dir) => {
      val t = Tables(s, dir)
      TextAnalysis.quality(TextAnalysis.tokens(t.documents))
        .withColumn("n_bpe", TextAnalysis.bpeTokenCount(col("text")))
        .withColumn("punct_ratio", TextAnalysis.punctRatio(col("text")))
        .select("doc_id", "n_tokens", "n_bpe", "n_distinct", "avg_token_len",
          "punct_ratio", "quality")
    }),
    "q46_rolling_fp" -> ((s, dir) => {
      // shift-robust rolling-hash fingerprint (vs q30's whole-content
      // md5): min Rabin-Karp hash over 16-byte windows
      val t = Tables(s, dir)
      t.documents.select(col("doc_id"),
        graft.functions.rollingMinHash(col("text"), 16).as("rfp"))
    }),
    "q52_gopher_rules" -> ((s, dir) => {
      // Gopher-style quality-filter flags, all integer-exact
      val t = Tables(s, dir)
      TextAnalysis.gopherRules(t.documents)
        .select("doc_id", "n_words", "alpha_words", "stop_hits",
          "ok_words", "ok_mean_len", "ok_alpha", "ok_stop", "ok_symbol",
          "gopher_pass")
    }),
    "q53_repetition" -> ((s, dir) => {
      // intra-doc repetition signals via the shuffle-free run-length fold
      val t = Tables(s, dir)
      TextAnalysis.repetition(t.documents)
        .select("doc_id", "n_grams", "top_count", "dup_count",
          "top_frac", "dup_frac")
    }),
    "q54_hash_split" -> ((s, dir) => {
      val t = Tables(s, dir)
      Sampling.hashSplit(t.documents).select("doc_id", "bucket", "split")
    }),
    "q55_contamination" -> ((s, dir) => {
      // train/eval overlap scan: benchmark = every 20th doc, corpus = rest
      val t = Tables(s, dir)
      Dedup.crossContamination(
        t.documents.filter(col("doc_id") % 20 =!= 0),
        t.documents.filter(col("doc_id") % 20 === 0),
        minShared = 5)
    }),
    "q129_decontaminate" -> ((s, dir) => {
      // surgical decontamination: excise every corpus word covered by
      // a benchmark-shared 3-gram (q55's scan, now applied); output
      // the cleaned-text hash so the gate pins the repaired bytes
      val t = Tables(s, dir)
      Dedup.decontaminate(
        t.documents.filter(col("doc_id") % 20 =!= 0),
        t.documents.filter(col("doc_id") % 20 === 0))
    }),
    "q56_stratified_sample" -> ((s, dir) => {
      // per-source sampling rates (20..90, derived deterministically
      // from the source name) applied as a broadcast dim + hash filter
      val t = Tables(s, dir)
      val rates = t.documents.select("source").distinct()
        .withColumn("pct",
          conv(substring(md5(col("source")), 1, 1), 16, 10).cast("int") % 8 * 10 + 20)
      Sampling.stratifiedHashSample(t.documents, rates, "source")
        .select("doc_id", "source", "bucket", "pct")
    }),
    "q57_token_freq" -> ((s, dir) => {
      // corpus vocabulary: top-100 words by frequency — partial (map-
      // side) aggregation on the word key, then a TakeOrdered top-k,
      // never a global sort
      val t = Tables(s, dir)
      t.documents
        .select(explode(TextAnalysis.words(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word")).limit(100)
    }),
    "q92_bloom_join" -> ((s, dir) => {
      // bloom-pruned semi-join: lineitem rows are dropped scan-side by
      // a broadcast 16 KB bloom over the urgent orders' keys before
      // the exact semi-join removes false positives — result identical
      // to the plain semi-join (the oracle), shuffle volume isn't
      val t = Tables(s, dir)
      val urgent = t.orders.filter(col("o_orderpriority") === "1-URGENT")
      BloomSemiJoin(t.lineitem, urgent, "l_orderkey", "o_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast("long").as("n"),
          round(sum("l_quantity"), 2).as("sum_qty"))
    }),
    "q91_cms_topk" -> ((s, dir) => {
      // heavy hitters via a native count-min sketch: one global 4x1024
      // counter matrix over every corpus word (32 KB state, map-side
      // combined), then point estimates for the exact top-20 against
      // the broadcast one-row sketch. CMS never under-counts; the
      // oracle rebuilds the identical counters from the same md5
      // bucket arithmetic.
      val t = Tables(s, dir)
      val words = t.documents
        .select(explode(TextAnalysis.words(col("text"))).as("word"))
      val sk = words.agg(graft.functions.CmsSketch.cmsSketch(col("word")).as("sk"))
      val top = words.groupBy("word").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("word")).limit(20)
      top.join(broadcast(sk))
        .select(col("word"), col("exact_n"),
          graft.functions.CmsSketch.cmsEstimate(col("sk"), col("word")).as("cms_n"))
    }),
    "q58_curation" -> ((s, dir) => {
      // end-to-end corpus curation: Gopher quality gate → exact dedup
      // (keeper = lowest doc_id per content hash AMONG the survivors) →
      // deterministic split assignment → per-(split, lang) rollup
      val t = Tables(s, dir)
      val quality = TextAnalysis.gopherRules(t.documents, minStopwords = 1)
        .filter(col("gopher_pass"))
      val deduped = Dedup.exactRank(quality).filter(col("dup_rank") === 1)
      Sampling.hashSplit(deduped)
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_words"))
    }),
    "q59_unigram_lm" -> ((s, dir) => {
      // CCNet-style perplexity filter reduced to unigrams: train the
      // corpus unigram LM and score every document's mean surprisal
      // in one job (two keyed aggregations, word-keyed vocab join)
      val t = Tables(s, dir)
      TextAnalysis.unigramLm(t.documents)
    }),
    "q70_snapshot_diff" -> ((s, dir) => {
      // incremental crawl refresh: diff two deterministic snapshot
      // views of the corpus (old = buckets 0–89; new = buckets 5–99
      // with every bucket%7==0 doc revised) and roll up change
      // classes per source — the join ships only (id, md5, source)
      val t = Tables(s, dir)
      val b = t.documents
        .withColumn("bucket", Sampling.hashBucket(col("doc_id"), "snap"))
      val oldSnap = b.filter(col("bucket") < 90)
      val newSnap = b.filter(col("bucket") >= 5)
        .withColumn("text",
          when(col("bucket") % 7 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")))
      Snapshot.diff(oldSnap, newSnap, passthrough = Seq("source"))
        .groupBy("change", "source")
        .agg(count(lit(1)).as("n_docs"))
    }),
    "q71_centroid_classify" -> ((s, dir) => {
      // nearest-centroid domain classifier: 80/20 modulo split,
      // per-label integer-sum centroids, broadcast scoring, true
      // label rides along for the confusion readout
      val t = Tables(s, dir)
      SimilaritySearch.centroidClassify(
        t.embeddings.filter(col("vec_id") % 5 =!= 0),
        t.embeddings.filter(col("vec_id") % 5 === 0),
        keep = Seq("label"))
    }),
    "q74_weighted_sample" -> ((s, dir) => {
      // data mixing: cut the corpus to a 200-doc budget under
      // per-source quality weights via deterministic A-ES priorities —
      // broadcast weight dim + TakeOrdered, zero corpus shuffle
      val t = Tables(s, dir)
      val weights = t.documents.select(col("source")).distinct()
        .withColumn("weight",
          (Sampling.hashBucket(col("source"), "w") % 9 + 1).cast("double")
            / lit(10).cast("double"))
      Sampling.weightedPrioritySample(t.documents, weights, "source")
        .select(col("doc_id"), col("source"), round(col("priority"), 4).as("priority"))
    }),
    "q73_hll_distinct" -> ((s, dir) => {
      // the native HLL sketch aggregate next to the exact counts it
      // approximates — two cardinality regimes per group (150 users →
      // linear-counting branch; thousands of event ids → raw
      // estimator at larger scale factors)
      val t = Tables(s, dir)
      t.events.groupBy("event_type").agg(
        countDistinct(col("user_id")).as("u_exact"),
        round(graft.functions.HllSketch.hllDistinct(col("user_id")), 4).as("u_hll"),
        countDistinct(col("event_id")).as("e_exact"),
        round(graft.functions.HllSketch.hllDistinct(col("event_id")), 4).as("e_hll"))
    }),
    "q72_tfidf" -> ((s, dir) => {
      // per-doc top-3 TF-IDF keywords — word-keyed df join, one-row
      // broadcast doc count, per-doc window for the top-k
      val t = Tables(s, dir)
      TextAnalysis.tfidfTopK(t.documents)
    }),
    "q64_stream_enrich" -> ((s, dir) => {
      // stream-static dimension enrichment: deterministic per-type
      // weight dim broadcast into every micro-batch, tumbling weighted
      // sums, append-mode watermark finalization as in q60
      val t = Tables(s, dir)
      val dim = t.events.select(col("event_type")).distinct()
        .withColumn("weight",
          ((Sampling.hashBucket(col("event_type"), "w") % 9 + 1).cast("double")
            / lit(10).cast("double")))
      StreamQueries.materialize(
          EventStream.enrichedTumbling(
            StreamQueries.streamEvents(s, dir), dim, "1 hour", "2 hours"))
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), round(col("wsum"), 4).as("wsum"))
    }),
    "q60_stream_tumbling" -> ((s, dir) => {
      // the streaming runtime end-to-end: file-source replay, 2h
      // watermark, append mode — only FINALIZED windows (window end ≤
      // max event time − 2h) are emitted, which no batch split changes
      StreamQueries.materialize(
          EventStream.tumblingCounts(
            StreamQueries.streamEvents(s, dir), "1 hour", "2 hours"))
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"),
          round(col("sum_value"), 4).as("sum_value"))
    }),
    "q109_stream_hll" -> ((s, dir) => {
      // the HLL sketch as streaming state: approx-distinct users per
      // finalized tumbling hour (2h watermark, append mode)
      StreamQueries.materialize(
          EventStream.tumblingDistinctSketch(
            StreamQueries.streamEvents(s, dir), "1 hour", "2 hours"))
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("n"), round(col("u_hll"), 4).as("u_hll"))
    }),
    "q61_stream_sessions" -> ((s, dir) => {
      // streaming gap sessionization (session_window): finalized
      // sessions only (end = last event + gap ≤ max event time − 2h)
      StreamQueries.materialize(
          EventStream.sessionCounts(
            StreamQueries.streamEvents(s, dir), "30 minutes", "2 hours"))
        .select(col("user_id"), col("n_events"),
          unix_micros(col("start_ts")).as("start_us"),
          unix_micros(col("end_ts")).as("end_us"))
    }),
    "q128_stream_dynamic_sessions" -> ((s, dir) => {
      // dynamic-gap streaming sessionization: the idle timeout is an
      // expression of the event (purchase 60 min, else 20); finalized
      // sessions only, gated by the interval-merge batch replay
      StreamQueries.materialize(
          EventStream.sessionCountsDynamicGap(
            StreamQueries.streamEvents(s, dir), "2 hours"))
        .select(col("user_id"), col("n_events"),
          unix_micros(col("start_ts")).as("start_us"),
          unix_micros(col("end_ts")).as("end_us"))
    }),
    "q62_stream_dedup" -> ((s, dir) => {
      // streaming exact dedup; the watermark outlives the replay so no
      // state expires and the surviving KEY SET (projected here) is
      // exactly the distinct keys, however the input is micro-batched
      StreamQueries.materialize(
          EventStream.dedupeExact(StreamQueries.streamEvents(s, dir),
            Seq("user_id", "event_type"), watermark = "3650 days"))
        .select("user_id", "event_type")
    }),
    "q63_stream_assoc" -> ((s, dir) => {
      // the flagship chain's streaming twin: cumulative top-K harmonic
      // scores via mapGroupsWithState, reduced to the final state per
      // (pair, source) — batch-split-invariant because the top-K
      // multiset and evidence count are order-independent
      import s.implicits._
      val ev = StreamQueries.streamEvidence(s, dir)
        .as[AssociationStream.EvidenceEvent]
      val updates = StreamQueries.materialize(
        AssociationStream.cumulativeScores(ev), mode = "update")
      StreamQueries.latestByKey(updates,
          Seq("diseaseId", "targetId", "datasourceId"), "n_evidence")
        .withColumn("score", round(col("score"), 4))
    }),
    "q170_stream_peaks" -> ((s, dir) => {
      // H7 streaming novelty-peak detection END-TO-END: Append-mode
      // flatMapGroupsWithState fires whenever a key's cumulative top-K
      // harmonic rises above its previous batch value. WHICH batches
      // fire depends on the micro-batch split by design, but the
      // harmonic is monotone nondecreasing in the evidence multiset,
      // so the MAX emitted score per key equals the final cumulative
      // score and the emitting keys are exactly {harmonic > 0} — both
      // split-invariant (the q65 slice pattern), gated by the batch
      // harmonic oracle.
      import s.implicits._
      val ev = StreamQueries.streamEvidence(s, dir)
        .as[AssociationStream.EvidenceEvent]
      val peaks = StreamQueries.materialize(
        AssociationStream.noveltyPeaks(ev).toDF(), mode = "append")
      peaks.groupBy("diseaseId", "targetId", "datasourceId")
        .agg(round(max(col("score")), 4).as("peak_score"))
    }),
    "q85_stream_join" -> ((s, dir) => {
      // stream–stream correlation: every purchase matched to the same
      // user's clicks in the preceding hour, both sides live streams
      // with watermarks + an event-time range bounding the join state.
      // The watermark outlives the replay (cf. q62), so the match set
      // equals the batch join however the input is micro-batched.
      val ev = StreamQueries.streamEvents(s, dir)
      StreamQueries.materialize(
        EventStream.streamStreamJoin(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"),
          range = "1 hour", watermark = "3650 days"))
    }),
    "q123_stream_ivm" -> ((s, dir) => {
      // streaming IVM: every micro-batch folds its mergeable state
      // into a persisted parquet rollup (foreachBatch, alternating
      // state dirs); exact integer cents make the fold
      // split-invariant, so the batch aggregate oracle gates the
      // whole refresh loop
      val ev = StreamQueries.streamEvents(s, dir)
        .select(col("user_id"),
          round(col("value") * 100).cast("long").as("v_i"))
      StreamQueries.incrementalStateReplay(ev, Seq("user_id"), "v_i")
        .select(col("user_id"), col("st_n").as("n"),
          round(col("st_sum").cast("double") / 100, 4).as("sum_v"),
          round(col("st_min").cast("double") / 100, 4).as("min_v"),
          round(col("st_max").cast("double") / 100, 4).as("max_v"))
    }),
    "q117_stream_outer" -> ((s, dir) => {
      // stream-stream LEFT OUTER join end-to-end: purchases with and
      // WITHOUT a same-user click in the preceding hour, null rows
      // emitted by real watermark-driven state expiry. Registered
      // slice = left events ≥ watermark+range behind both sides' max
      // event time, whose outer verdict no micro-batch split can
      // change — so the batch left-join oracle gates it exactly.
      val ev = StreamQueries.streamEvents(s, dir)
      val out = StreamQueries.materialize(
        EventStream.streamStreamLeftJoin(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"),
          range = "1 hour", watermark = "1 hour"))
      val t = Tables(s, dir)
      val cut = t.events
        .filter(col("event_type").isin("purchase", "click"))
        .groupBy("event_type").agg(max(unix_micros(col("ts"))).as("m"))
        .agg((min("m") - 7200000000L).as("cut_us"))
      out.crossJoin(broadcast(cut))
        .filter(col("l_ts_us") <= col("cut_us"))
        .select("user_id", "left_id", "right_id")
    }),
    "q65_stream_evict" -> ((s, dir) => {
      // H9 event-time state eviction END-TO-END: the EventTimeTimeout
      // variant of the cumulative chain runs with a real watermark and
      // per-key timeout registration. The horizon (200y) outlives the
      // data span, so no key evicts under ANY micro-batch split and
      // the final state is deterministic — the oracle gates the same
      // result as the non-evicting twin while the eviction machinery
      // (watermark clock, setTimeoutTimestamp, hasTimedOut) executes.
      import s.implicits._
      val ev = StreamQueries.streamTable(s, dir, "lineitem").select(
          col("l_suppkey").cast("long").as("diseaseId"),
          col("l_partkey").cast("long").as("targetId"),
          col("l_returnflag").as("datasourceId"),
          (col("l_discount") * 10).cast("double").as("score"),
          col("l_shipdate").cast("timestamp").as("ts"))
        .as[AssociationStream.TimedEvidenceEvent]
      val updates = StreamQueries.materialize(
        AssociationStream.cumulativeScoresEvicting(ev,
          // the watermark outlives the replayed span (cf. q62), so no
          // batch split can mark a row late; the timeout still
          // registers against the real watermark clock
          watermark = "3650 days", evictAfterMs = 200L * 365 * 24 * 3600 * 1000),
        mode = "update")
      StreamQueries.latestByKey(updates,
          Seq("diseaseId", "targetId", "datasourceId"), "n_evidence")
        .withColumn("score", round(col("score"), 4))
    }),
    "q66_sql_surface" -> ((s, dir) => {
      // I5: the injected SQL functions driven through spark.sql — the
      // flagship harmonic scoring written as plain SQL over the
      // evidence view. harmonic_score sorts its input internally, so
      // collect_list's nondeterministic order cannot leak.
      GraftExtensions.register(s)
      Tables(s, dir).lineitem.createOrReplaceTempView("lineitem_q66")
      s.sql(
        """SELECT CAST(l_suppkey AS BIGINT) AS diseaseId,
          |       CAST(l_partkey AS BIGINT) AS targetId,
          |       l_returnflag AS datasourceId,
          |       round(harmonic_score(
          |         collect_list(CAST(l_discount * 10 AS DOUBLE)),
          |         50, 1.6449340668482264), 4) AS score
          |FROM lineitem_q66
          |GROUP BY 1, 2, 3""".stripMargin)
    }),
    "q69_pack_sequences" -> ((s, dir) => {
      // training-sequence packing: greedy contiguous fill to a 512-
      // token budget, sequential by doc_id within (source, md5-shard)
      // lanes so every running-sum window partition is bounded
      val t = Tables(s, dir)
      Sampling.packSequences(t.documents, budgetTokens = 512)
        .select(col("doc_id"), col("source"), col("shard"),
          col("n_tokens"), col("bin"), col("bin_tokens"))
    }),
    "q75_salted_agg" -> ((s, dir) => {
      // I1: two-phase salted aggregation — result identical to the
      // plain groupBy (the oracle), rows per hot key spread over 8
      // reducers. Floats round only at the combine projection.
      val t = Tables(s, dir)
      Skew.saltedAgg(t.events, Seq("event_type"), 8)(
        partial = Seq(count(lit(1)).as("c"), sum("value").as("sv"),
          sum("user_id").as("su"), max("value").as("mx")),
        combine = Seq(sum("c").cast("long").as("n"),
          round(sum("sv"), 4).as("sum_value"),
          sum("su").cast("long").as("sum_user"),
          round(max("mx"), 4).as("max_value")))
    }),
    "q76_salted_join" -> ((s, dir) => {
      // I2: salted equi-join against a replicated non-broadcast dim —
      // same rows as the plain join, one hot event_type spread over 8
      // tasks. Aggregated to a deterministic per-type summary.
      val t = Tables(s, dir)
      val dim = t.events.select(col("event_type")).distinct()
        .withColumn("weight",
          (Sampling.hashBucket(col("event_type"), "w") % 9 + 1).cast("double")
            / lit(10).cast("double"))
      Skew.saltedJoin(t.events, dim, Seq("event_type"), 8)
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n"),
          round(sum(col("value") * col("weight")), 4).as("wsum"))
    }),
    "q77_bucketed_join" -> ((s, dir) => {
      // I3: bucketed co-located fact-fact join — both sides written
      // bucketBy(8, join key) so the equi-join plans with no exchange
      // (pinned in ScaleDesignSpec); result equals the plain join.
      q77Cleanup // register the exit hook that removes these tables
      for (tb <- Seq("li_q77", "ord_q77")) {
        s.sql(s"DROP TABLE IF EXISTS $tb")
        Scratch.deleteTree(java.nio.file.Paths.get(s"spark-warehouse/$tb"))
      }
      val t = Tables(s, dir)
      Io.writeBucketed(t.lineitem.select("l_orderkey", "l_extendedprice"),
        "li_q77", "l_orderkey", 8)
      Io.writeBucketed(t.orders.select("o_orderkey", "o_custkey"),
        "ord_q77", "o_orderkey", 8)
      s.table("li_q77")
        .join(s.table("ord_q77"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(sum("l_extendedprice"), 4).as("rev"))
    }),
    "q78_io_roundtrip" -> ((s, dir) => {
      // I4: CSV / JSON-lines / ORC round-trips — write the events
      // projection, read it back through each adapter (explicit
      // schema, no inference pass), and summarize; any fidelity loss
      // in a format path breaks that format's row against the oracle.
      val base = Tables(s, dir).events
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      val tmp = scratchDir("q78")
      Io.writeCsv(base, s"$tmp/csv")
      Io.writeJsonLines(base, s"$tmp/jsonl")
      Io.writeOrc(base, s"$tmp/orc")
      Seq(
          "csv" -> Io.readCsv(s, s"$tmp/csv", base.schema),
          "jsonl" -> Io.readJsonLines(s, s"$tmp/jsonl", base.schema),
          "orc" -> Io.readOrc(s, s"$tmp/orc"))
        .map { case (fmt, d) =>
          d.agg(count(lit(1)).cast("long").as("n"),
              sum("user_id").cast("long").as("sum_user"),
              round(sum("value"), 4).as("sum_value"))
            .withColumn("fmt", lit(fmt))
        }
        .reduce(_.unionByName(_))
    }),
    "q79_partition_refresh" -> ((s, dir) => {
      // I4: partitioned write → dynamic single-partition overwrite →
      // small-file compaction of the refreshed partition → read back.
      // Only src0 is rewritten (n_chars + 1000); every other partition
      // must come through untouched for the oracle to match.
      val t = Tables(s, dir)
      val tmp = scratchDir("q79") + "/docs"
      val base = t.documents.select(col("doc_id"), col("source"), col("n_chars"))
      Io.writeParquetPartitioned(base, tmp, Seq("source"))
      Io.overwritePartitions(
        base.filter(col("source") === "src0")
          .withColumn("n_chars", col("n_chars") + 1000),
        tmp, Seq("source"))
      Io.compact(s, s"$tmp/source=src0", 1)
      s.read.parquet(tmp)
        .groupBy("source")
        .agg(count(lit(1)).cast("long").as("n"),
          sum("n_chars").cast("long").as("sum_chars"))
    }),
    "q172_attribution" -> ((s, dir) => {
      // H28 last-touch attribution: purchases credited to the latest
      // same-user click/view within 7 days via ONE as-of sort-merge
      // pass — never a windowed self-join of the event table
      val t = Tables(s, dir)
      EventWindows.attribution(t.events)
    }),
    "q173_bootstrap_ci" -> ((s, dir) => {
      // F18 Poisson-bootstrap CI of the mean value per event type:
      // all 64 resample means from one pass (map-side rep explosion
      // absorbed by the (key, rep) combine), exact integer cents
      val t = Tables(s, dir)
      Rollups.bootstrapMeanCI(t.events, Seq("event_type"), "value", "event_id")
    }),
    "q174_weighted_median" -> ((s, dir) => {
      // F19 exact weighted median: value at which cumulative props.k
      // weight crosses half the total — all-integer crossing test on
      // one (event_type) exchange, zero interpolation
      val t = Tables(s, dir)
      val ev = t.events.withColumn("k",
        get_json_object(col("props"), "$.k").cast("long"))
      Rollups.weightedQuantile(ev, Seq("event_type"), "value", "k", "event_id")
        .withColumn("wq_value", round(col("wq_value"), 4))
    }),
    "q175_mutual_info" -> ((s, dir) => {
      // F20 categorical mutual information lang ⇄ source: exact-count
      // cell table with PMI + MI contributions; corpus touched once
      val t = Tables(s, dir)
      Rollups.mutualInfo(t.documents, "lang", "source")
    }),
    "q176_zipf" -> ((s, dir) => {
      // G60 Zipf power-law fit of each source's vocabulary head:
      // micro-nat integer logs into linearTrend's exact-sum machinery
      val t = Tables(s, dir)
      TextAnalysis.zipfFit(t.documents, maxRank = 200, minFreq = 2)
    }),
    "q177_zone_map" -> ((s, dir) => {
      // I22 zone-map skip report: arrival vs range-clustered layouts
      // of events under value∈[150,200] — the quantified case for
      // write-time clustering; corpus scanned once, (layout, file)
      // grain shuffle only
      val t = Tables(s, dir)
      Layout.zoneMapReport(t.events, "event_id", "value",
        arrivalRowsPerFile = 500, clusterBuckets = 16, lo = 150.0, hi = 200.0)
    }),
    "q178_fdr" -> ((s, dir) => {
      // F21 Benjamini–Hochberg FDR over q19's correlation p-values —
      // the multiple-testing correction analysis.ipynb stops short
      // of; global windows run over the HYPOTHESIS table, never data
      val t = Tables(s, dir)
      Rollups.bhAdjust(
        Rollups.peakYearCorrelation(AssociationScore.byDatasource(t.evidence)),
        "p_value", Seq("datasourceIdA", "datasourceIdB"))
    }),
    "q179_dhash_pairs" -> ((s, dir) => {
      // G61 near-dup image pairs: 16-bit band buckets over the dHash
      // (pigeonhole-exact recall at hamming ≤ 3), capped buckets,
      // codegen'd xor/bit_count verify — LSH for pixels
      val t = Tables(s, dir)
      // threshold 12: the synthetic corpus has no true near-dup
      // renders (min candidate hamming 7-9), so the demo threshold
      // sits above it; band recall is exact only <= 3 (see operator)
      Multimodal.dhashPairs(
        Multimodal.dhash(Multimodal.textToBmp(t.documents)).toDF(),
        maxHamming = 12)
    }),
    "q180_funnel_timing" -> ((s, dir) => {
      // H29 time-to-convert distribution over q95's funnel: exact
      // interpolated percentiles of (t_conv − t_first) for converted
      // users — the "how fast" report the step counts can't answer
      val t = Tables(s, dir)
      EventWindows.funnel(t.events, Seq("view", "click", "purchase"))
        .filter(col("t_conv_us").isNotNull)
        .withColumn("d", col("t_conv_us") - col("t_first_us"))
        .agg(count(lit(1)).as("n_converted"),
          // report in DAYS: percentile interpolation noise is ~1e-4 us
          // absolute, far beyond 4dp at 1e11-us magnitudes; /8.64e10
          // pushes it to 1e-15 of the 4dp day grain on both engines
          round(expr("percentile(d, 0.5)") / 86400e6, 4).as("p50_days"),
          round(expr("percentile(d, 0.9)") / 86400e6, 4).as("p90_days"),
          round(avg(col("d")) / 86400e6, 4).as("avg_days"))
    }),
    "q181_constraint_audit" -> ((s, dir) => {
      // I23 declarative data-contract audit of lineitem: PK
      // uniqueness, NOT NULLs, FK orphans against three dims, ranges —
      // nulls/ranges/count in ONE scan, FKs as anti-joins
      val t = Tables(s, dir)
      Profile.constraintAudit(
        t.lineitem,
        pkCols = Seq("l_orderkey", "l_linenumber"),
        notNullCols = Seq("l_shipdate", "l_quantity"),
        fks = Seq(
          ("l_orderkey", t.orders, "o_orderkey"),
          ("l_partkey", t.part, "p_partkey"),
          ("l_suppkey", t.supplier, "s_suppkey")),
        ranges = Seq(("l_quantity", 1.0, 45.0), ("l_discount", 0.0, 0.1)))
    }),
    "q182_chi_square" -> ((s, dir) => {
      // F22 Pearson χ² + Cramér's V for lang ⇄ source — q175's
      // hypothesis-test companion; empty cells folded in closed form
      val t = Tables(s, dir)
      Rollups.chiSquare(t.documents, "lang", "source")
    }),
    "q183_calibration" -> ((s, dir) => {
      // G62 filter-calibration curve: quality-score deciles × Gopher
      // pass rate — the threshold-tuning reliability diagram for the
      // quality filter; one map-side-combined aggregate over the
      // per-doc scores, exact-integer mean quality per bin
      val t = Tables(s, dir)
      val scored = TextAnalysis.gopherRules(TextAnalysis.quality(t.documents))
      scored
        .withColumn("bin", least(floor(col("quality") * 10).cast("int"), lit(9)))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          sum(round(col("quality") * 10000).cast("long")).as("_sq"),
          sum(when(col("gopher_pass"), 1L).otherwise(0L)).as("n_pass"))
        .withColumn("mean_quality",
          round(col("_sq").cast("double") / col("n").cast("double") / 10000.0, 4))
        .withColumn("pass_rate",
          round(col("n_pass").cast("double") / col("n").cast("double"), 4))
        .drop("_sq")
    }),
    "q184_new_returning" -> ((s, dir) => {
      // H30 daily new-vs-returning actives: first-seen day per user
      // and the (user, day) activity grain share one hash(user)
      // exchange; the day rollup runs on the user-day frame
      val t = Tables(s, dir)
      val ev = t.events.select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      val firstDay = ev.groupBy("user_id").agg(min("day").as("first_day"))
      ev.distinct().join(firstDay, Seq("user_id"))
        .groupBy("day")
        .agg(count(lit(1)).as("active_users"),
          sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
            .as("new_users"))
        .withColumn("returning_users", col("active_users") - col("new_users"))
    }),
    "q185_join_blowup" -> ((s, dir) => {
      // I24 pre-flight skew forecast for a user-keyed self-join of
      // events: per-key |A|·|B| output cardinality, top-20 — the
      // diagnosis that sizes saltBuckets before the 100 TB join
      val t = Tables(s, dir)
      Skew.joinBlowupForecast(t.events, t.events, "user_id", "user_id")
    }),
    "q186_interarrival" -> ((s, dir) => {
      // H31 event-cadence report: per event type, the distribution of
      // consecutive-event gaps within each (user, type) series —
      // exact long micros, lag window on the series exchange
      val t = Tables(s, dir)
      EventWindows.interArrival(t.events)
    }),
    "q187_ucb1" -> ((s, dir) => {
      // F23 UCB1 bandit index per event_type arm over `value` rewards
      // — one arm-grain combine; ln/sqrt only in the 6dp projection
      val t = Tables(s, dir)
      Rollups.ucbArms(t.events, "event_type", "value")
    }),
    "q188_vocab_build" -> ((s, dir) => {
      // G63 tokenizer vocab: top-500 tokens get dense ids in (freq
      // desc, token) order + cumulative corpus coverage — TakeOrdered
      // heap, windows only over the kept slice
      val t = Tables(s, dir)
      TextAnalysis.vocabBuild(t.documents)
    }),
    "q189_basket_lift" -> ((s, dir) => {
      // F24 market-basket pair lift over order baskets: in-row pair
      // expansion bounded by basket width, TakeOrdered top-20
      val t = Tables(s, dir)
      Baskets.pairLift(t.lineitem, "l_orderkey", "l_partkey",
        k = 20, minSupport = 3)
    }),
    "q190_xcorr" -> ((s, dir) => {
      // D14 does 'view' lead 'purchase'? Pearson r per lag −3..3 over
      // the dense daily calendar — exact centered long sums
      val t = Tables(s, dir)
      Rollups.laggedCrossCorr(t.events, "view", "purchase")
    }),
    "q191_ann_recall" -> ((s, dir) => {
      // G65 recall@5 of the LSH index vs brute-force ground truth —
      // the eval that prices the bucketed ANN path's miss rate
      val t = Tables(s, dir)
      val qs = t.embeddings.filter(col("vec_id") % 50 === 0)
      SimilaritySearch.recallAtK(
        SimilaritySearch.bruteForceTopK(t.embeddings, qs),
        SimilaritySearch.lshTopK(t.embeddings, qs))
    }),
    "q192_ks_test" -> ((s, dir) => {
      // F25 two-sample KS: did click and view draw their values from
      // the same distribution? Exact long CDF gaps, one report row
      val t = Tables(s, dir)
      Rollups.ksTest(t.events, "event_type", "value", "click", "view")
    }),
    "q193_dp_counts" -> ((s, dir) => {
      // G66 ε-DP daily event counts via the geometric mechanism —
      // seeded integer-threshold noise both engines replay exactly
      val t = Tables(s, dir)
      val ev = t.events.withColumn("day",
        expr("unix_micros(ts) div 86400000000"))
      Privacy.dpCounts(ev, Seq("event_type", "day"))
    }),
    "q195_theil_sen" -> ((s, dir) => {
      // D15 robust yearly trend per datasource: median of all pairwise
      // slopes, in-row over the calendar-bounded year series
      val t = Tables(s, dir)
      val series = t.evidence.groupBy("datasourceId", "year")
        .agg(count(lit(1)).as("n"))
      Rollups.theilSen(series, Seq("datasourceId"), "year", "n")
    }),
    "q196_spearman" -> ((s, dir) => {
      // F26 monotone value-vs-time drift per event type: Spearman rho
      // on integer double-average-ranks, one (type) exchange
      val t = Tables(s, dir)
      val e = t.events.filter(col("value").isNotNull)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("v"),
          expr("unix_micros(ts)").as("tus"))
      Rollups.spearman(e, Seq("event_type"), "v", "tus")
    }),
    "q197_changepoint" -> ((s, dir) => {
      // D16 level-shift locator: the split day maximizing between-
      // segment SSE gain over each event type's daily count series
      val t = Tables(s, dir)
      val series = t.events
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("y"))
      Rollups.changepoint(series, Seq("event_type"), "day", "y")
    }),
    "q213_centroid_outliers" -> ((s, dir) => {
      // G71 label-noise candidates: per label, the 5 vectors least
      // like their own centroid
      val t = Tables(s, dir)
      SimilaritySearch.centroidOutliers(t.embeddings)
    }),
    "q214_bootstrap_diff" -> ((s, dir) => {
      // F33 resampling CI around the click-vs-view mean gap — the
      // q173 Poisson machinery pointed at the A/B effect
      val t = Tables(s, dir)
      Rollups.bootstrapDiffCI(t.events, "event_type", "value",
        "click", "view", "event_id")
    }),
    "q215_psi" -> ((s, dir) => {
      // I25 population-stability drift gate: click values binned by
      // the view distribution's published deciles
      val t = Tables(s, dir)
      Profile.psi(t.events, "event_type", "value", "view", "click")
    }),
    "q216_auc" -> ((s, dir) => {
      // F34 threshold-free classifier quality: does value separate
      // clicks from views? AUC via the F27 rank statistic
      val t = Tables(s, dir)
      Rollups.rocAuc(t.events, "event_type", "value", "click", "view")
    }),
    "q217_gini" -> ((s, dir) => {
      // F35 corpus mass concentration: how unequally is character
      // mass spread across documents?
      val t = Tables(s, dir)
      Rollups.giniConcentration(t.documents, "n_chars")
    }),
    "q218_ols2" -> ((s, dir) => {
      // F36 two-regressor OLS in closed form: price on quantity
      // controlling for discount, one scan, Cramer on exact moments
      val t = Tables(s, dir)
      Rollups.ols2(t.lineitem, "l_extendedprice", "l_quantity", "l_discount")
    }),
    "q219_partial_corr" -> ((s, dir) => {
      // F37 confounder screen: quantity-price dependence with the
      // discount channel partialled out
      val t = Tables(s, dir)
      Rollups.partialCorr(t.lineitem, "l_quantity", "l_extendedprice",
        "l_discount")
    }),
    "q220_cohort_ltv" -> ((s, dir) => {
      // H36 cohort lifetime-value matrix: first-seen-week cohorts,
      // cumulative revenue per user as each cohort ages
      val t = Tables(s, dir)
      EventWindows.cohortLtv(t.events)
    }),
    "q221_jw_blocked" -> ((s, dir) => {
      // G72 Jaro-Winkler blocked linkage over part names — the
      // native codegen'd scorer on G67's blocking frame
      val t = Tables(s, dir)
      val names = t.part.groupBy("p_name").agg(count(lit(1)).as("n_parts"))
        .withColumn("block", element_at(split(col("p_name"), " "), 2))
      Dedup.blockedJaroWinkler(names, "p_name", "block", minSim = 0.8)
    }),
    "q222_degree_powerlaw" -> ((s, dir) => {
      // G73 graph-shape diagnostic: degree-histogram ln-ln slope of
      // the MinHash near-dup graph
      val t = Tables(s, dir)
      Graph.degreePowerLaw(
        Dedup.minhashLshPairs(t.documents).select("idA", "idB"),
        "idA", "idB")
    }),
    "q223_canonical_pick" -> ((s, dir) => {
      // G74 keep-best curation: quality-ranked keeper per near-dup
      // cluster (G2b components x G8 quality)
      val t = Tables(s, dir)
      Dedup.canonicalPick(t.documents,
        Dedup.minhashLshPairs(t.documents).select("idA", "idB"))
    }),
    "q268_brier" -> ((s, dir) => {
      // F56 proper-score check: does the quality score, read as a
      // pass probability, beat the base-rate forecast?
      val t = Tables(s, dir)
      val scored = TextAnalysis.gopherRules(TextAnalysis.quality(t.documents))
      Rollups.brierScore(scored, "quality", "gopher_pass")
    }),
    "q267_mcc" -> ((s, dir) => {
      // F55 Matthews correlation of the quality filter vs the Gopher
      // gate — the imbalance-honest single number
      val t = Tables(s, dir)
      val scored = TextAnalysis.gopherRules(TextAnalysis.quality(t.documents))
        .withColumn("q_pass", col("quality") >= 0.5)
      Rollups.matthewsCorr(scored, "q_pass", "gopher_pass")
    }),
    "q265_kappa" -> ((s, dir) => {
      // F54 chance-corrected filter agreement: does quality >= 0.5
      // agree with the Gopher gate beyond base rates?
      val t = Tables(s, dir)
      val scored = TextAnalysis.gopherRules(TextAnalysis.quality(t.documents))
        .withColumn("q_pass", col("quality") >= 0.5)
      Rollups.cohenKappa(scored, "q_pass", "gopher_pass")
    }),
    "q266_dup_by_source" -> ((s, dir) => {
      // G84 which feeds contribute the duplication: per-source
      // near-dup shares from one G2 pair pass
      val t = Tables(s, dir)
      Dedup.dupShareBySlice(t.documents)
    }),
    "q263_pr_curve" -> ((s, dir) => {
      // F52 precision-recall sweep + average precision — the
      // imbalance-honest companion to q262
      val t = Tables(s, dir)
      val scored = TextAnalysis.gopherRules(TextAnalysis.quality(t.documents))
      Rollups.prCurve(scored, "quality", "gopher_pass")
    }),
    "q264_best_f1" -> ((s, dir) => {
      // F53 deployable threshold: the decile cut maximizing F1
      val t = Tables(s, dir)
      val scored = TextAnalysis.gopherRules(TextAnalysis.quality(t.documents))
      Rollups.bestF1Threshold(scored, "quality", "gopher_pass")
    }),
    "q262_roc_curve" -> ((s, dir) => {
      // F51 ROC operating points: TPR/FPR per quality decile against
      // the Gopher pass label — the table behind q216's AUC
      val t = Tables(s, dir)
      val scored = TextAnalysis.gopherRules(TextAnalysis.quality(t.documents))
      Rollups.rocCurve(scored, "quality", "gopher_pass")
    }),
    "q261_boilerplate" -> ((s, dir) => {
      // G83 templated-mass report: shingles in >= 1% of docs — the
      // list that poisons pair expansions and inflates jaccard
      val t = Tables(s, dir)
      Dedup.boilerplateShingles(t.documents)
    }),
    "q260_dataset_card" -> ((s, dir) => {
      // G82 the release datasheet: size, languages, token mass,
      // quality, Gopher pass rate, near-dup share — one row
      val t = Tables(s, dir)
      TextAnalysis.datasetCard(t.documents)
    }),
    "q258_readability" -> ((s, dir) => {
      // G80 Flesch-style readability per doc (vowel-group syllable
      // proxy) — the prose-complexity curation feature
      val t = Tables(s, dir)
      TextAnalysis.readability(t.documents)
        .select(col("doc_id"), col("n_sentences"), col("n_words"),
          col("n_syllables"), col("flesch"))
    }),
    "q259_label_balance" -> ((s, dir) => {
      // G81 supervised-label balance: shares, entropy vs uniform,
      // imbalance ratio over the embedding labels
      val t = Tables(s, dir)
      SimilaritySearch.labelBalance(t.embeddings)
    }),
    "q256_permutation" -> ((s, dir) => {
      // F49 randomization test: assumption-free p for the click-vs-
      // view value gap via 64 seeded md5 relabels
      val t = Tables(s, dir)
      Rollups.permutationDiffTest(t.events, "event_type", "value",
        "click", "view", "event_id")
    }),
    "q257_yuen" -> ((s, dir) => {
      // F50 Yuen 20%-trimmed robust mean test, click vs view values
      val t = Tables(s, dir)
      Rollups.yuenTrimmed(t.events, "event_type", "value", "click", "view")
    }),
    "q254_component_sizes" -> ((s, dir) => {
      // G79 giant-component alarm: size histogram of the MinHash
      // near-dup clustering with node shares
      val t = Tables(s, dir)
      Graph.componentSizes(
        Dedup.minhashLshPairs(t.documents).select("idA", "idB"))
    }),
    "q255_heterogeneity" -> ((s, dir) => {
      // F48 Cochran's Q across event-type segments: is the parity-arm
      // value gap ONE effect or segment-specific?
      val t = Tables(s, dir)
      Rollups.effectHeterogeneity(
        t.events.withColumn("arm",
          when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B")),
        "event_type", "arm", "value", "A", "B")
    }),
    "q252_rake" -> ((s, dir) => {
      // G78 RAKE keyword extraction: top stopword-delimited phrases
      // by degree/frequency word scores
      val t = Tables(s, dir)
      TextAnalysis.rakeKeywords(t.documents)
    }),
    "q253_stl_anomalies" -> ((s, dir) => {
      // D20 seasonal-aware anomaly days per event type: residual
      // beyond 3 sigma after trend AND weekly effect removal
      val t = Tables(s, dir)
      val series = t.events
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("y"))
      Rollups.seasonalAnomalies(series, Seq("event_type"), "day", "y",
        nSigma = 2.0)
    }),
    "q250_entropy_rate" -> ((s, dir) => {
      // H47 sequence predictability: entropy rate + perplexity of
      // the empirical transition matrix (the bits behind H40's floor)
      val t = Tables(s, dir)
      EventWindows.entropyRate(t.events)
    }),
    "q251_bot_flags" -> ((s, dir) => {
      // H48 cadence-regularity flags: busy users whose inter-arrival
      // CV is low for this corpus (timers, not people)
      val t = Tables(s, dir)
      EventWindows.botFlags(t.events, minEvents = 20, maxCv = 0.9)
    }),
    "q247_daily_bands" -> ((s, dir) => {
      // H44 daily p10/p50/p90 envelope of event values — the spread
      // view a daily mean hides
      val t = Tables(s, dir)
      EventWindows.dailyQuantileBands(t.events)
    }),
    "q248_mix_shift" -> ((s, dir) => {
      // H45 daily JS divergence of the event-type mix vs the corpus
      // baseline — the one-number-per-day composition drift monitor
      val t = Tables(s, dir)
      EventWindows.mixShift(t.events)
    }),
    "q249_audience_overlap" -> ((s, dir) => {
      // H46 audience Jaccard per event-type pair — do these features
      // share users?
      val t = Tables(s, dir)
      EventWindows.audienceOverlap(t.events)
    }),
    "q246_stream_srm" -> ((s, dir) => {
      // H43 streaming experiment integrity: per finalized hour, the
      // arm split's one-df chi-square against 50/50 (F41's gate run
      // continuously — a mid-experiment assignment break shows up in
      // THAT hour, not at readout)
      val wins = StreamQueries.materialize(
        EventStream.tumblingGroupCounts(
          StreamQueries.streamEvents(s, dir),
          when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B")))
      val d = (c: org.apache.spark.sql.Column) => c.cast("double")
      wins.groupBy("window_start")
        .agg(
          coalesce(sum(when(col("grp") === "A", col("n"))), lit(0L)).as("n_a"),
          coalesce(sum(when(col("grp") === "B", col("n"))), lit(0L)).as("n_b"))
        .withColumn("__e", d(col("n_a") + col("n_b")) * 0.5)
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("n_a"), col("n_b"),
          round((d(col("n_a")) - col("__e")) * (d(col("n_a")) - col("__e")) / col("__e") +
            (d(col("n_b")) - col("__e")) * (d(col("n_b")) - col("__e")) / col("__e"), 4)
            .as("chi2"))
        .withColumn("srm", col("chi2") > 3.8415)
    }),
    "q244_cuped" -> ((s, dir) => {
      // F46 CUPED variance reduction: post-cutoff spend tested with
      // the pre-cutoff spend covariate removed (parity arms)
      val t = Tables(s, dir)
      val day = expr("unix_micros(ts) div 86400000000")
      val anchor = broadcast(t.events.agg((max(day) - 6).as("__cut")))
      val users = t.events
        .select(col("user_id"), day.as("__d"),
          coalesce(round(col("value") * 100).cast("long"), lit(0L)).as("__c"))
        .crossJoin(anchor)
        .groupBy("user_id")
        .agg(
          sum(when(col("__d") < col("__cut"), col("__c")).otherwise(0L)).as("__pre"),
          sum(when(col("__d") >= col("__cut"), col("__c")).otherwise(0L)).as("__post"))
        .select(col("user_id"),
          (col("__pre") / lit(100.0)).as("pre"),
          (col("__post") / lit(100.0)).as("post"),
          when(pmod(col("user_id"), lit(2)) === 1, "B").otherwise("A").as("arm"))
      Rollups.cuped(users, "arm", "post", "pre", "A", "B")
    }),
    "q245_ratio_delta" -> ((s, dir) => {
      // F47 delta-method ratio metric: clicks-per-view tested at the
      // USER grain — the correct SE for a ratio of sums
      val t = Tables(s, dir)
      val users = t.events.groupBy("user_id").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("y"))
        .withColumn("arm",
          when(pmod(col("user_id"), lit(2)) === 1, "B").otherwise("A"))
      Rollups.ratioMetricDelta(users, "arm", "x", "y", "A", "B")
    }),
    "q241_qini" -> ((s, dir) => {
      // F43 uplift targeting eval: does spend rank find the users
      // the (parity-arm) treatment moves to purchase?
      val t = Tables(s, dir)
      val users = t.events.groupBy("user_id").agg(
        coalesce(sum(round(col("value") * 100).cast("long")), lit(0L))
          .as("__sc"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("__conv"))
        .select(col("user_id"),
          (col("__sc") / lit(100.0)).as("score"),
          (pmod(col("user_id"), lit(2)) === 1).as("treat"),
          (col("__conv") === 1L).as("converted"))
      Rollups.qiniCurve(users, "score", "treat", "converted")
    }),
    "q242_triples" -> ((s, dir) => {
      // F44 bundle mining: top item triples by support, in-row
      // C(w,3) expansion on the collapsed baskets
      val t = Tables(s, dir)
      Baskets.tripleSupport(t.lineitem, "l_orderkey", "l_partkey")
    }),
    "q243_outliers" -> ((s, dir) => {
      // F45 robust outlier listing: the |modified z| > 3.5 rows per
      // event type — F17's dispersion summary turned into the triage
      // list
      val t = Tables(s, dir)
      Rollups.madOutliers(t.events, Seq("event_type"), "value", "event_id")
    }),
    "q238_lift_curve" -> ((s, dir) => {
      // F42 cumulative gains/lift: does the quality ORDERING find
      // the Gopher-passing docs? (F39 asks if the probabilities are
      // honest; this asks if the ranking targets well)
      val t = Tables(s, dir)
      val scored = TextAnalysis.gopherRules(TextAnalysis.quality(t.documents))
      Rollups.liftCurve(scored, "quality", "gopher_pass")
    }),
    "q239_cum_hazard" -> ((s, dir) => {
      // H41 Nelson-Aalen cumulative conversion hazard on the q144
      // survival frame — the additive risk view per first-action
      // cohort
      val t = Tables(s, dir)
      val ev = t.events.select(col("user_id"), col("event_type"),
        col("event_id"), unix_micros(col("ts")).as("us"))
      val horizon = broadcast(ev.agg(max("us").as("hz")))
      val users = ev.groupBy("user_id")
        .agg(min("us").as("t0"),
          min_by(col("event_type"), struct(col("us"), col("event_id")))
            .as("cohort"),
          min(when(col("event_type") === "purchase", col("us"))).as("tp"))
      val subjects = users.join(horizon)
        .withColumn("event", when(col("tp").isNotNull, 1L).otherwise(0L))
        .withColumn("duration", expr("(coalesce(tp, hz) - t0) DIV 86400000000"))
      EventWindows.cumulativeHazard(subjects, Seq("cohort"))
    }),
    "q240_churn_labels" -> ((s, dir) => {
      // H42 supervised churn labels: pre-cutoff actives labeled by
      // whether they return in the trailing 7-day window (the
      // testdata spans ~30 days; a 30-day window would empty W1)
      val t = Tables(s, dir)
      EventWindows.churnLabels(t.events, observationDays = 7)
    }),
    "q236_schema_evolution" -> ((s, dir) => {
      // I26 mergeSchema across parquet epochs: v1 lacks n_chars, v2
      // adds it; the union reads v1's missing column as null
      val t = Tables(s, dir)
      val tmp = scratchDir("q236")
      t.documents.select(col("doc_id"), col("lang"))
        .write.mode("overwrite").parquet(s"$tmp/v1")
      t.documents.select(col("doc_id"), col("lang"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$tmp/v2")
      Io.readParquetMerged(s, Seq(s"$tmp/v1", s"$tmp/v2"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("n_chars").isNull, 1L).otherwise(0L)).as("n_missing"),
          coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"))
    }),
    "q237_csv_quarantine" -> ((s, dir) => {
      // I27 permissive ingest gate: deterministically corrupt every
      // 100th row's value, quarantine instead of dropping, report
      val t = Tables(s, dir)
      val tmp = scratchDir("q237")
      t.events
        .filter(col("value").isNotNull)
        .select(concat_ws(",", col("event_id"), col("user_id"),
          when(pmod(col("event_id"), lit(100)) === 0,
            concat(lit("x"), col("value").cast("string")))
            .otherwise(col("value").cast("string"))).as("value"))
        .write.mode("overwrite").text(s"$tmp/csv")
      val schema = new org.apache.spark.sql.types.StructType()
        .add("event_id", "long").add("user_id", "long").add("value", "double")
      // the parsed `value` must appear in the output: CSV column
      // pruning would otherwise skip parsing it and never trip the
      // quarantine (malformed detection only covers parsed columns)
      Io.readCsvQuarantine(s, s"$tmp/csv", schema)
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
            .as("n_quarantined"),
          sum(when(col("_corrupt_record").isNull, col("user_id"))
            .otherwise(0L)).as("sum_user_good"),
          round(sum(when(col("_corrupt_record").isNull, col("value"))
            .otherwise(0d)), 4).as("sum_value_good"))
    }),
    "q233_srm" -> ((s, dir) => {
      // F41 sample-ratio-mismatch gate on the q156 A/B arms: does
      // the observed split match the intended 50/50?
      val t = Tables(s, dir)
      Rollups.srmCheck(
        t.events.withColumn("arm",
          when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B")),
        "arm", "A", "B")
    }),
    "q234_int8_fidelity" -> ((s, dir) => {
      // G77 quantization-fidelity report: cosine between each exact
      // vector and its int8 code — the pre-flight for the code path
      val t = Tables(s, dir)
      SimilaritySearch.int8Fidelity(t.embeddings)
    }),
    "q235_transition_acc" -> ((s, dir) => {
      // H40 majority-transition baseline accuracy over user event
      // sequences — the floor any sequence model must beat
      val t = Tables(s, dir)
      EventWindows.transitionAccuracy(t.events)
    }),
    "q231_item_cosine" -> ((s, dir) => {
      // F40 item-based CF similarity: cosine of part audiences from
      // order-basket co-occurrence, threshold on the rounded score
      val t = Tables(s, dir)
      Baskets.itemCosine(t.lineitem, "l_orderkey", "l_partkey",
        minCos = 0.1)
    }),
    "q232_banding_eval" -> ((s, dir) => {
      // G76 measured banding recall: exact all-pairs truth on a 5%
      // sample vs the bucketed MinHash candidates
      val t = Tables(s, dir)
      Dedup.bandingEval(t.documents)
    }),
    "q228_decay_score" -> ((s, dir) => {
      // H38 recency-weighted engagement score: value·2^(−age_days)
      // per user, exact shift-based decay, corpus-anchored
      val t = Tables(s, dir)
      EventWindows.decayScore(t.events)
    }),
    "q229_burst_audit" -> ((s, dir) => {
      // H39 rate-limit audit: each user's peak trailing-60s arrival
      // count with its first instant, users peaking >= 2
      val t = Tables(s, dir)
      EventWindows.burstAudit(t.events)
    }),
    "q230_seasonal_decompose" -> ((s, dir) => {
      // D19 STL-lite: centered-MA trend, weekly phase effects, and
      // residual spread over each event type's daily count series
      val t = Tables(s, dir)
      val series = t.events
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("y"))
      Rollups.seasonalDecompose(series, Seq("event_type"), "day", "y")
    }),
    "q225_ndcg" -> ((s, dir) => {
      // G75 position-aware index eval: NDCG@5 of the LSH index vs
      // brute-force ground truth (q191's inputs, rank-discounted)
      val t = Tables(s, dir)
      val qs = t.embeddings.filter(col("vec_id") % 50 === 0)
      SimilaritySearch.ndcgAtK(
        SimilaritySearch.bruteForceTopK(t.embeddings, qs),
        SimilaritySearch.lshTopK(t.embeddings, qs))
    }),
    "q226_paired_uplift" -> ((s, dir) => {
      // F38 within-user matched-pair effect: click value vs the same
      // user's nearest preceding view, paired t
      val t = Tables(s, dir)
      EventWindows.pairedUplift(t.events, "click", "view")
    }),
    "q227_ece" -> ((s, dir) => {
      // F39 expected calibration error of the quality score against
      // the Gopher pass outcome — G62's diagram as one number
      val t = Tables(s, dir)
      val scored = TextAnalysis.gopherRules(TextAnalysis.quality(t.documents))
      Rollups.calibrationError(scored, "quality", "gopher_pass")
    }),
    "q224_stream_cms" -> ((s, dir) => {
      // H37 streaming heavy hitters: the CMS counter matrix as
      // per-window streaming state, point-estimated per event type
      // against the finalized windows (counter addition = exact
      // merge, so any micro-batch split emits the same sketch)
      val t = Tables(s, dir)
      val wins = StreamQueries.materialize(
        EventStream.tumblingCms(StreamQueries.streamEvents(s, dir)))
      val types = t.events.select(col("event_type")).distinct()
      wins.crossJoin(broadcast(types))
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("n"), col("event_type"),
          graft.functions.CmsSketch.cmsEstimate(col("sk"), col("event_type"))
            .as("cms_n"))
    }),
    "q210_mde" -> ((s, dir) => {
      // F32 experiment sizing: smallest mean gap the click-vs-view
      // sample could detect at α=0.05 / 80% power
      val t = Tables(s, dir)
      Rollups.minDetectableEffect(t.events, "event_type", "value",
        "click", "view")
    }),
    "q211_ewma_backtest" -> ((s, dir) => {
      // D18 one-step-ahead forecast skill of D6's smoother on the
      // yearly datasource series
      val t = Tables(s, dir)
      val series = t.evidence.groupBy("datasourceId", "year")
        .agg(count(lit(1)).as("n"))
      Rollups.ewmaBacktest(series, Seq("datasourceId"), "year", "n")
    }),
    "q212_label_confusion" -> ((s, dir) => {
      // G70 hard-negative mining summary: which labels sit nearest
      // a sampled query's label in embedding space?
      val t = Tables(s, dir)
      SimilaritySearch.labelConfusion(t.embeddings,
        t.embeddings.filter(col("vec_id") % 10 === 0))
    }),
    "q207_anova" -> ((s, dir) => {
      // F30 one-way ANOVA: does ANY event type's mean value differ?
      // one dim-sized combine + a one-row reduce, exact cent sums
      val t = Tables(s, dir)
      Rollups.anovaF(t.events, "event_type", "value")
    }),
    "q208_welch" -> ((s, dir) => {
      // F31 Welch unequal-variance t-test, click vs view values
      val t = Tables(s, dir)
      Rollups.welchT(t.events, "event_type", "value", "click", "view")
    }),
    "q209_trending" -> ((s, dir) => {
      // H35 daily top-3 trending event types with rank movement since
      // each item's previous appearance
      val t = Tables(s, dir)
      EventWindows.trending(t.events)
    }),
    "q204_corr_matrix" -> ((s, dir) => {
      // F29 pairwise correlation matrix over four lineitem measures
      // in ONE scan — a single O(k²)-state combine, then a stack
      val t = Tables(s, dir)
      Rollups.corrMatrix(t.lineitem,
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    }),
    "q205_durbin_watson" -> ((s, dir) => {
      // D17 residual autocorrelation of D9's yearly fit — did the
      // straight line leave structure behind?
      val t = Tables(s, dir)
      val series = t.evidence.groupBy("datasourceId", "year")
        .agg(count(lit(1)).as("n"))
      Rollups.durbinWatson(series, Seq("datasourceId"), "year", "n")
    }),
    "q206_embedding_drift" -> ((s, dir) => {
      // G69 per-dimension drift between the two vec_id parities (the
      // train/serve split surrogate), ranked by standardized gap
      val t = Tables(s, dir)
      SimilaritySearch.embeddingDrift(
        t.embeddings.withColumn("split", pmod(col("vec_id"), lit(2))), "split")
    }),
    "q201_benford" -> ((s, dir) => {
      // F28 Benford first-digit audit of extended prices — the
      // synthetic-data/fraud detector; digit from the integer-cent
      // decimal string, nine-row digit table
      val t = Tables(s, dir)
      Profile.benfordAudit(t.lineitem, "l_extendedprice")
    }),
    "q202_stickiness" -> ((s, dir) => {
      // H33 DAU/WAU/MAU + stickiness ratios from one user-day grain
      // with bounded offset fans — never a distinct-over-window
      val t = Tables(s, dir)
      EventWindows.stickiness(t.events)
    }),
    "q203_funnel_steps" -> ((s, dir) => {
      // H34 step-level funnel report over H14's per-user frame:
      // reach counts + step-to-step conversion on a 4-row spine
      val t = Tables(s, dir)
      val f = EventWindows.funnel(t.events, Seq("view", "click", "purchase"))
      val counts = f.groupBy("steps_completed").agg(count(lit(1)).as("__n"))
      val spine = s.range(0, 4).select(col("id").cast("int").as("step"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("step")
      spine.join(counts, col("steps_completed") >= col("step"), "left")
        .groupBy("step")
        .agg(coalesce(sum(col("__n")), lit(0L)).as("n_reached"))
        .withColumn("conv",
          round(col("n_reached").cast("double") / lag(col("n_reached"), 1).over(w), 4))
    }),
    "q198_dedup_curve" -> ((s, dir) => {
      // G68 dedup threshold-tuning curve: pair and affected-doc counts
      // per verification threshold over the banded candidate set —
      // the report that picks minJaccard before a 100 TB dedup run
      val t = Tables(s, dir)
      val pairs = Dedup.minhashLshPairs(t.documents, minJaccard = 0.5)
      val th = s.range(10, 20).select((col("id") * lit(0.05)).as("t"))
      pairs.crossJoin(broadcast(th))
        .filter(col("jaccard") >= col("t"))
        .select(col("t"), explode(array(col("idA"), col("idB"))).as("id"))
        .groupBy("t")
        .agg((count(lit(1)) / 2).cast("long").as("n_pairs"),
          countDistinct(col("id")).as("n_docs"))
        .select(round(col("t"), 2).as("t"), col("n_pairs"), col("n_docs"))
    }),
    "q199_mann_whitney" -> ((s, dir) => {
      // F27 rank-sum location test click vs view — the tie-corrected
      // U/z from exact integer double-ranks
      val t = Tables(s, dir)
      Rollups.mannWhitney(t.events, "event_type", "value", "click", "view")
    }),
    "q200_concurrency" -> ((s, dir) => {
      // H32 peak simultaneous open shipments per supplier: sweep-line
      // over [ship_day, ship_day + quantity days) intervals
      val t = Tables(s, dir)
      val day = expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
      val iv = t.lineitem.select(col("l_suppkey"), day.as("s"),
        (day + col("l_quantity").cast("long")).as("e"))
      EventWindows.maxConcurrency(iv, Seq("l_suppkey"), "s", "e")
    }),
    "q194_er_blocked" -> ((s, dir) => {
      // G67 blocked-Levenshtein linkage over part names (block = the
      // noun token); pair volume carried via broadcast name counts
      val t = Tables(s, dir)
      val names = t.part.groupBy("p_name")
        .agg(count(lit(1)).as("n_parts"))
        .withColumn("block", element_at(split(col("p_name"), " "), 2))
      Dedup.blockedLevenshtein(names, "p_name", "block", maxDist = 3)
        .withColumn("lev", col("lev").cast("long"))
        .join(broadcast(names.select(col("p_name").as("name_a"),
          col("n_parts").as("n_a"))), Seq("name_a"))
        .join(broadcast(names.select(col("p_name").as("name_b"),
          col("n_parts").as("n_b"))), Seq("name_b"))
        .select(col("name_a"), col("name_b"), col("lev"), col("n_a"), col("n_b"))
    }),
  )

  /** DuckDB replay of textToBmp + dhash ending in CTE
    * `bits(doc_id, dhash_hi, dhash_lo)` - shared by q115/q179.
    */
  private val DhashBitsSql =
    """b AS (
        |  SELECT doc_id, text, CAST(CASE WHEN length(text) = 0 THEN 1
        |    ELSE length(text) END AS INT) AS n FROM documents
        |),
        |d AS (
        |  SELECT doc_id, text, n, 8 + (n % 8) AS w, 8 + ((n // 8) % 8) AS h
        |  FROM b
        |),
        |o AS (SELECT doc_id, text, n, w, h, unnest(range(0, 72)) AS p FROM d),
        |m AS (
        |  SELECT doc_id, text, n, CAST(p % 9 AS INT) AS x, CAST(p // 9 AS INT) AS y,
        |         ((p // 9) * h // 8) * w + ((p % 9) * w // 9) AS k
        |  FROM o
        |),
        |g AS (
        |  SELECT doc_id, x, y,
        |         (ascii(substring(text, CAST((3*k + 2) % n AS INT) + 1, 1))
        |        + ascii(substring(text, CAST((3*k + 1) % n AS INT) + 1, 1))
        |        + ascii(substring(text, CAST((3*k) % n AS INT) + 1, 1))) // 3 AS gray
        |  FROM m
        |),
        |bits AS (
        |  SELECT a.doc_id,
        |         CAST(sum(CASE WHEN nb.gray > a.gray AND a.y*8 + a.x >= 32
        |             THEN CAST(pow(2, a.y*8 + a.x - 32) AS BIGINT) ELSE 0 END)
        |           AS BIGINT) AS dhash_hi,
        |         CAST(sum(CASE WHEN nb.gray > a.gray AND a.y*8 + a.x < 32
        |             THEN CAST(pow(2, a.y*8 + a.x) AS BIGINT) ELSE 0 END)
        |           AS BIGINT) AS dhash_lo
        |  FROM g a JOIN g nb ON nb.doc_id = a.doc_id AND nb.y = a.y
        |    AND nb.x = a.x + 1
        |  WHERE a.x < 8
        |  GROUP BY 1
        |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_assoc_datasource" ->
      s"""WITH $BySourceSql
         |SELECT diseaseId, targetId, datasourceId,
         |       CASE WHEN year = 2002 THEN NULL ELSE year END AS year,
         |       round(score, 4) AS score
         |FROM bysource""".stripMargin,
    "q02_assoc_overall" ->
      s"""WITH $OverallSql
         |SELECT diseaseId, targetId,
         |       CASE WHEN year = 2002 THEN NULL ELSE year END AS year,
         |       round(score, 4) AS score
         |FROM overall""".stripMargin,
    "q03_novelty" ->
      s"""WITH $OverallSql,
         |$NoveltyTailSql""".stripMargin,
    // the q171 pivot: list(x ORDER BY year) per pair, serialized to the
    // same exact-integer CSV grain as the Spark projection
    "q171_timeline" ->
      s"""WITH $OverallSql,
         |$NoveltyCtesSql,
         |f AS (
         |  SELECT diseaseId, targetId,
         |         coalesce(year, 2002) AS y,
         |         CAST(round(coalesce(score, 0) * 10000) AS BIGINT) AS sc,
         |         CAST(round(novelty * 1000) AS BIGINT) AS nv
         |  FROM att
         |)
         |SELECT diseaseId, targetId,
         |       array_to_string(list(CAST(y AS VARCHAR) ORDER BY y), ',') AS years_csv,
         |       array_to_string(list(CAST(sc AS VARCHAR) ORDER BY y), ',') AS scores_csv,
         |       array_to_string(list(CAST(nv AS VARCHAR) ORDER BY y), ',') AS novelty_csv
         |FROM f GROUP BY 1, 2""".stripMargin,
    "q10_full_pipeline" ->
      s"""WITH $IndirectEvSql,
         |$BySourceTail,
         |$OverallTail,
         |$NoveltyTailSql""".stripMargin,
    "q04_novelty_datasource" ->
      s"""WITH $BySourceSql,
         |peaks AS (
         |  SELECT diseaseId, targetId, datasourceId, year AS peakYear,
         |         coalesce(score, 0) - lag(coalesce(score, 0)) OVER (
         |           PARTITION BY diseaseId, targetId, datasourceId ORDER BY year) AS peak
         |  FROM bysource
         |),
         |decayed AS (
         |  SELECT diseaseId, targetId, datasourceId, peakYear + d.delta AS year,
         |         round(max(peak / (1 + exp(2.0 * (d.delta - 2.0)))), 3) AS novelty
         |  FROM peaks CROSS JOIN (SELECT unnest(range(0, 11)) AS delta) d
         |  WHERE peak > 0
         |  GROUP BY 1, 2, 3, 4
         |)
         |SELECT b.diseaseId, b.targetId, b.datasourceId,
         |       CASE WHEN b.year = 2002 THEN NULL ELSE b.year END AS year,
         |       round(b.score, 4) AS score,
         |       coalesce(n.novelty, 0.0) AS novelty
         |FROM bysource b
         |LEFT JOIN decayed n
         |  ON n.diseaseId = b.diseaseId AND n.targetId = b.targetId
         | AND n.datasourceId = b.datasourceId AND n.year = b.year""".stripMargin,
    "q05_indirect" ->
      s"""WITH $EvSql,
         |ont AS (
         |  SELECT s.s_suppkey AS id,
         |         list_distinct([CAST(s.s_suppkey AS BIGINT),
         |          CAST(s.s_nationkey + 100 AS BIGINT),
         |          CAST(n.n_regionkey + 200 AS BIGINT)]) AS nodes
         |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
         |),
         |prop AS (
         |  SELECT unnest(o.nodes) AS diseaseId, e.targetId, e.datasourceId, e.score
         |  FROM ev e JOIN ont o ON e.diseaseId = o.id
         |)
         |SELECT diseaseId, datasourceId,
         |       CAST(count(*) AS BIGINT) AS n_evidence,
         |       round(sum(score), 4) AS sum_score
         |FROM prop GROUP BY 1, 2""".stripMargin,
    "q06_evidence_dating" ->
      """WITH candidates AS (
        |  SELECT l.l_orderkey, l.l_returnflag,
        |         CASE WHEN l.l_returnflag = 'R'
        |              THEN CAST(year(l.l_shipdate) AS INT) END AS studyYear,
        |         CASE WHEN l.l_linenumber <= 2
        |              THEN CAST(year(l.l_shipdate) AS INT) - 1 END AS curationYear,
        |         CAST(year(o.o_orderdate) AS INT) AS orderYear
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |)
        |SELECT l_orderkey AS orderkey,
        |       min(coalesce(studyYear, curationYear, orderYear)) AS year,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       array_to_string(list_sort(list_distinct(list(l_returnflag))), ',') AS flags
        |FROM candidates GROUP BY 1""".stripMargin,
    "q07_union_recover" ->
      """WITH enriched AS (
        |  SELECT *, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |  FROM events WHERE event_type IN ('click', 'view')
        |),
        |recovered AS (
        |  SELECT * FROM enriched
        |  UNION ALL
        |  SELECT e.*, NULL AS k FROM events e
        |  ANTI JOIN enriched en ON e.event_id = en.event_id
        |)
        |SELECT event_type,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(k) AS BIGINT) AS n_k,
        |       CAST(sum(k) AS BIGINT) AS sum_k
        |FROM recovered GROUP BY 1""".stripMargin,
    "q08_dated_counts" ->
      """WITH sparse AS (
        |  SELECT l_returnflag AS datasourceId,
        |         CASE WHEN l_returnflag = 'R' THEN CAST(year(l_shipdate) AS INT)
        |              WHEN l_linenumber <= 2 THEN CAST(year(l_shipdate) AS INT) - 1
        |         END AS year
        |  FROM lineitem
        |)
        |SELECT datasourceId,
        |       CAST(count(*) AS BIGINT) AS n_evidence,
        |       CAST(count(year) AS BIGINT) AS n_dated
        |FROM sparse GROUP BY 1""".stripMargin,
    "q09_peaks" ->
      s"""WITH $OverallSql,
         |peaks AS (
         |  SELECT diseaseId, targetId, year AS peakYear,
         |         coalesce(score, 0) - lag(coalesce(score, 0)) OVER (
         |           PARTITION BY diseaseId, targetId ORDER BY year) AS peak
         |  FROM overall
         |)
         |SELECT diseaseId, targetId, peakYear, round(peak, 4) AS peak
         |FROM peaks WHERE round(peak, 4) > 0""".stripMargin,
    "q11_top_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (
        |           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank
        |  FROM orders
        |) WHERE rank <= 1""".stripMargin,
    "q12_first_year" ->
      s"""WITH $EvSql
         |SELECT DISTINCT targetId, datasourceId,
         |       min(year) OVER (PARTITION BY targetId) AS first_year,
         |       round(max(score) OVER (PARTITION BY targetId, datasourceId), 4) AS max_score
         |FROM ev""".stripMargin,
    "q13_distinct_rollup" ->
      s"""WITH $EvSql
         |SELECT year, datasourceId,
         |       CAST(count(DISTINCT targetId) AS BIGINT) AS n_targets,
         |       CAST(count(DISTINCT CAST(diseaseId AS VARCHAR) || '|' || CAST(targetId AS VARCHAR)) AS BIGINT) AS n_pairs
         |FROM ev GROUP BY 1, 2""".stripMargin,
    "q14_crosstab" ->
      s"""WITH $EvSql
         |SELECT year,
         |       CAST(count(CASE WHEN datasourceId = 'A' THEN 1 END) AS BIGINT) AS n_A,
         |       CAST(count(CASE WHEN datasourceId = 'N' THEN 1 END) AS BIGINT) AS n_N,
         |       CAST(count(CASE WHEN datasourceId = 'R' THEN 1 END) AS BIGINT) AS n_R
         |FROM ev GROUP BY 1""".stripMargin,
    "q15_approval_composite" ->
      s"""WITH $BySourceSql,
         |peaks AS (
         |  SELECT diseaseId, targetId, datasourceId, year AS peakYear,
         |         coalesce(score, 0) - lag(coalesce(score, 0)) OVER (
         |           PARTITION BY diseaseId, targetId, datasourceId ORDER BY year) AS peak
         |  FROM bysource
         |),
         |decayed AS (
         |  SELECT diseaseId, targetId, datasourceId, peakYear + d.delta AS year,
         |         round(max(peak / (1 + exp(2.0 * (d.delta - 2.0)))), 3) AS novelty
         |  FROM peaks CROSS JOIN (SELECT unnest(range(0, 11)) AS delta) d
         |  WHERE peak > 0
         |  GROUP BY 1, 2, 3, 4
         |),
         |nv AS (
         |  SELECT b.diseaseId, b.targetId, b.datasourceId,
         |         CASE WHEN b.year = 2002 THEN NULL ELSE b.year END AS year,
         |         coalesce(n.novelty, 0.0) AS novelty
         |  FROM bysource b
         |  LEFT JOIN decayed n
         |    ON n.diseaseId = b.diseaseId AND n.targetId = b.targetId
         |   AND n.datasourceId = b.datasourceId AND n.year = b.year
         |),
         |drugs AS (
         |  SELECT o_orderkey AS drugId, CAST(year(o_orderdate) AS INT) AS approvalYear
         |  FROM orders
         |),
         |links AS (
         |  SELECT DISTINCT l_orderkey AS drugId, l_partkey AS targetId, l_suppkey AS diseaseId
         |  FROM lineitem WHERE l_linenumber = 4
         |),
         |ndt AS (
         |  SELECT DISTINCT targetId, diseaseId, approvalYear FROM (
         |    SELECT l.targetId, l.diseaseId, d.approvalYear,
         |           min(d.approvalYear) OVER (PARTITION BY l.targetId) AS minYear
         |    FROM drugs d JOIN links l USING (drugId)
         |  ) WHERE approvalYear = minYear
         |),
         |res AS (
         |  SELECT targetId, datasourceId, novelty, approvalYear,
         |         max(novelty) OVER (PARTITION BY targetId, datasourceId) AS maxN
         |  FROM ndt JOIN nv USING (diseaseId, targetId)
         |  WHERE novelty > 0 AND year IS NOT NULL
         |),
         |dtypes(datasourceId, datatypeId) AS
         |  (VALUES ('A', 'genetic'), ('N', 'literature'), ('R', 'clinical'))
         |SELECT dt.datatypeId, CAST(count(DISTINCT r.targetId) AS BIGINT) AS targets
         |FROM res r JOIN dtypes dt USING (datasourceId)
         |WHERE r.novelty = r.maxN AND r.approvalYear BETWEEN 1995 AND 1998
         |GROUP BY 1""".stripMargin,
    "q17_phase_union" ->
      s"""WITH $BySourceSql,
         |peaks AS (
         |  SELECT diseaseId, targetId, datasourceId, year AS peakYear,
         |         coalesce(score, 0) - lag(coalesce(score, 0)) OVER (
         |           PARTITION BY diseaseId, targetId, datasourceId ORDER BY year) AS peak
         |  FROM bysource
         |),
         |decayed AS (
         |  SELECT diseaseId, targetId, datasourceId, peakYear + d.delta AS year,
         |         round(max(peak / (1 + exp(2.0 * (d.delta - 2.0)))), 3) AS novelty
         |  FROM peaks CROSS JOIN (SELECT unnest(range(0, 11)) AS delta) d
         |  WHERE peak > 0
         |  GROUP BY 1, 2, 3, 4
         |),
         |nv AS (
         |  SELECT b.diseaseId, b.targetId, b.datasourceId,
         |         CASE WHEN b.year = 2002 THEN NULL ELSE b.year END AS year,
         |         coalesce(n.novelty, 0.0) AS novelty
         |  FROM bysource b
         |  LEFT JOIN decayed n
         |    ON n.diseaseId = b.diseaseId AND n.targetId = b.targetId
         |   AND n.datasourceId = b.datasourceId AND n.year = b.year
         |),
         |drugs AS (
         |  SELECT o_orderkey AS drugId, CAST(year(o_orderdate) AS INT) AS approvalYear
         |  FROM orders
         |),
         |links AS (
         |  SELECT DISTINCT l_orderkey AS drugId, l_partkey AS targetId, l_suppkey AS diseaseId
         |  FROM lineitem WHERE l_linenumber = 4
         |),
         |nd AS (
         |  SELECT DISTINCT drugId, targetId, diseaseId, approvalYear FROM (
         |    SELECT d.drugId, l.targetId, l.diseaseId, d.approvalYear,
         |           min(d.approvalYear) OVER (PARTITION BY l.targetId) AS minY
         |    FROM drugs d JOIN links l USING (drugId)
         |  ) WHERE approvalYear = minY
         |),
         |novrows AS (
         |  SELECT targetId, datasourceId, approvalYear, year, novelty FROM (
         |    SELECT nd.targetId, nv.datasourceId, nd.approvalYear, nv.year, nv.novelty,
         |           max(nv.novelty) OVER (PARTITION BY nd.targetId, nv.datasourceId) AS maxN
         |    FROM nd JOIN nv USING (diseaseId, targetId)
         |    WHERE nv.novelty > 0 AND nv.year IS NOT NULL
         |  ) WHERE novelty = maxN
         |),
         |phs AS (
         |  SELECT targetId, datasourceId, approvalYear, min(evYear) AS year FROM (
         |    SELECT l.l_orderkey AS drugId, l.l_partkey AS targetId,
         |           CASE WHEN l.l_linenumber IN (1, 2) THEN '1/2'
         |                ELSE CAST(l.l_linenumber AS VARCHAR) END AS datasourceId,
         |           CAST(year(l.l_shipdate) AS INT) AS evYear, n.approvalYear
         |    FROM lineitem l
         |    JOIN (SELECT DISTINCT drugId, targetId, approvalYear FROM nd) n
         |      ON n.drugId = l.l_orderkey AND n.targetId = l.l_partkey
         |  ) GROUP BY targetId, datasourceId, drugId, approvalYear
         |),
         |union_all AS (
         |  SELECT targetId, datasourceId, approvalYear, year, novelty FROM novrows
         |  UNION ALL
         |  SELECT targetId, datasourceId, approvalYear, year, 1.0 AS novelty FROM phs
         |),
         |dtypes(datasourceId, datatypeId) AS
         |  (VALUES ('A', 'genetic'), ('N', 'literature'), ('R', 'clinical'))
         |SELECT coalesce(dt.datatypeId, u.datasourceId) AS datatypeId,
         |       CAST(count(DISTINCT u.targetId) AS BIGINT) AS targets
         |FROM union_all u LEFT JOIN dtypes dt USING (datasourceId)
         |WHERE NOT (u.approvalYear < u.year AND u.datasourceId IN ('1/2', '3'))
         |GROUP BY 1""".stripMargin,
    "q16_ta_ranked" ->
      """WITH expl AS (
        |  SELECT CAST(s.s_suppkey AS BIGINT) AS diseaseId,
        |         unnest([CAST(s.s_nationkey + 100 AS BIGINT),
        |                 CAST(n.n_regionkey + 200 AS BIGINT)]) AS ta
        |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |),
        |pri(ta, ranking) AS
        |  (VALUES (CAST(202 AS BIGINT), 0), (CAST(200 AS BIGINT), 1), (CAST(104 AS BIGINT), 2)),
        |ranked AS (
        |  SELECT diseaseId, ta,
        |         row_number() OVER (
        |           PARTITION BY diseaseId ORDER BY coalesce(p.ranking, 1000), ta) AS r
        |  FROM expl LEFT JOIN pri p USING (ta)
        |),
        |names AS (
        |  SELECT CAST(n_nationkey + 100 AS BIGINT) AS ta, n_name AS taName FROM nation
        |  UNION ALL
        |  SELECT CAST(r_regionkey + 200 AS BIGINT), r_name FROM region
        |)
        |SELECT rk.diseaseId, rk.ta AS therapeuticArea, nm.taName AS therapeuticAreaName
        |FROM ranked rk LEFT JOIN names nm USING (ta)
        |WHERE rk.r = 1""".stripMargin,
    "q18_novel_by_ta" ->
      s"""WITH $BySourceSql,
         |peaks AS (
         |  SELECT diseaseId, targetId, datasourceId, year AS peakYear,
         |         coalesce(score, 0) - lag(coalesce(score, 0)) OVER (
         |           PARTITION BY diseaseId, targetId, datasourceId ORDER BY year) AS peak
         |  FROM bysource
         |),
         |decayed AS (
         |  SELECT diseaseId, targetId, datasourceId, peakYear + d.delta AS year,
         |         round(max(peak / (1 + exp(2.0 * (d.delta - 2.0)))), 3) AS novelty
         |  FROM peaks CROSS JOIN (SELECT unnest(range(0, 11)) AS delta) d
         |  WHERE peak > 0
         |  GROUP BY 1, 2, 3, 4
         |),
         |nv AS (
         |  SELECT b.diseaseId, b.targetId, b.datasourceId,
         |         CASE WHEN b.year = 2002 THEN NULL ELSE b.year END AS year,
         |         coalesce(n.novelty, 0.0) AS novelty
         |  FROM bysource b
         |  LEFT JOIN decayed n
         |    ON n.diseaseId = b.diseaseId AND n.targetId = b.targetId
         |   AND n.datasourceId = b.datasourceId AND n.year = b.year
         |),
         |expl AS (
         |  SELECT CAST(s.s_suppkey AS BIGINT) AS diseaseId,
         |         unnest([CAST(s.s_nationkey + 100 AS BIGINT),
         |                 CAST(n.n_regionkey + 200 AS BIGINT)]) AS ta
         |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
         |),
         |pri(ta, ranking) AS
         |  (VALUES (CAST(202 AS BIGINT), 0), (CAST(200 AS BIGINT), 1), (CAST(104 AS BIGINT), 2)),
         |tarank AS (
         |  SELECT diseaseId, ta,
         |         row_number() OVER (
         |           PARTITION BY diseaseId ORDER BY coalesce(p.ranking, 1000), ta) AS r
         |  FROM expl LEFT JOIN pri p USING (ta)
         |),
         |names AS (
         |  SELECT CAST(n_nationkey + 100 AS BIGINT) AS ta, n_name AS taName FROM nation
         |  UNION ALL
         |  SELECT CAST(r_regionkey + 200 AS BIGINT), r_name FROM region
         |),
         |tamap AS (
         |  SELECT rk.diseaseId, rk.ta, nm.taName
         |  FROM tarank rk LEFT JOIN names nm USING (ta) WHERE rk.r = 1
         |)
         |SELECT v.datasourceId, t.taName,
         |       CAST(count(DISTINCT (CAST(v.targetId AS VARCHAR) || '|' || CAST(v.diseaseId AS VARCHAR))) AS BIGINT)
         |         AS association
         |FROM nv v JOIN tamap t USING (diseaseId)
         |WHERE v.novelty >= 0.1 AND v.year = 1999 AND t.ta NOT IN (203, 204)
         |GROUP BY 1, 2""".stripMargin,
    "q20_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2""".stripMargin,
    "q21_join_topk" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, revenue FROM (
        |  SELECT o_orderkey, o_orderdate,
        |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |  FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE c_mktsegment = 'BUILDING'
        |  GROUP BY 1, 2
        |) ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q22_asof" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_type FROM events
        |),
        |clicks AS (
        |  SELECT user_id, ts, max(event_id) AS click_event_id
        |  FROM ev WHERE event_type = 'click' GROUP BY 1, 2
        |),
        |purchases AS (SELECT event_id, user_id, ts, value FROM ev WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.value, c.click_event_id,
        |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM purchases p
        |ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,
    "q40_window_tumbling" ->
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q41_window_sliding" ->
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)) - (h.h * INTERVAL 1 HOUR),
        |                '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type, CAST(count(*) AS BIGINT) AS n
        |FROM events CROSS JOIN (VALUES (0), (1)) h(h)
        |GROUP BY 1, 2""".stripMargin,
    "q42_sessionize" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |gapped AS (
        |  SELECT *, epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM ev
        |),
        |flagged AS (
        |  SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM gapped
        |),
        |sess AS (
        |  SELECT *, CAST(sum(new_s) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
        |       min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us,
        |       max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
        |FROM sess GROUP BY 1, 2""".stripMargin,
    "q43_json_extract" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events
        |)
        |SELECT event_type,
        |       CAST(count(k) AS BIGINT) AS n_k,
        |       round(avg(k), 4) AS avg_k,
        |       max(k) AS max_k,
        |       CAST(count(CASE WHEN k > 50 THEN 1 END) AS BIGINT) AS n_high
        |FROM ev GROUP BY 1""".stripMargin,
    "q30_dedup_exact" ->
      """SELECT doc_id, md5(text) AS fp,
        |       CAST(count(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS n_copies,
        |       CAST(row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS INT) AS dup_rank
        |FROM documents""".stripMargin,
    "q31_dedup_minhash" ->
      s"""WITH $MinhashPairsSql
         |SELECT idA, idB, jaccard FROM lshpairs""".stripMargin,
    // Components replay: undirected reachability via a recursive CTE,
    // then min-label per node — identical to hash-to-min convergence.
    "q47_dedup_clusters" ->
      s"""WITH RECURSIVE $MinhashPairsSql,
         |edges AS (
         |  SELECT idA AS src, idB AS dst FROM lshpairs
         |  UNION ALL
         |  SELECT idB AS src, idA AS dst FROM lshpairs
         |),
         |walk(id, comp) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.src, w.comp FROM edges e JOIN walk w ON e.dst = w.id
         |)
         |SELECT id, min(comp) AS comp FROM walk GROUP BY id""".stripMargin,
    "q32_dedup_simhash" ->
      """WITH docs AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS w FROM documents
        |),
        |toks AS (SELECT doc_id, md5(t) AS h FROM (SELECT doc_id, unnest(w) AS t FROM docs)),
        |votes AS (
        |  SELECT doc_id, i,
        |         sum(CASE WHEN substring(h, i, 1) IN ('8','9','a','b','c','d','e','f')
        |                  THEN 1 ELSE -1 END) AS v
        |  FROM toks CROSS JOIN (SELECT CAST(unnest(range(1, 33)) AS INT) AS i) pos
        |  GROUP BY 1, 2
        |),
        |hashes AS (
        |  SELECT doc_id, string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY i) AS simhash
        |  FROM votes GROUP BY 1
        |),
        |buckets AS (SELECT doc_id, simhash, substring(simhash, 1, 16) AS bucket FROM hashes)
        |SELECT doc_id, simhash, bucket,
        |       CAST(count(*) OVER (PARTITION BY bucket) AS BIGINT) AS bucket_size
        |FROM buckets""".stripMargin,
    "q33_ngram_jaccard" ->
      s"""WITH $ShinglesSql,
         |blocked AS (
         |  SELECT d.source AS block, s.id, list_distinct(s.sh) AS sh
         |  FROM shingled s JOIN documents d ON d.doc_id = s.id
         |),
         |inv AS (SELECT block, id, len(sh) AS sz, unnest(sh) AS s FROM blocked),
         |dfc AS (SELECT block, s, count(*) AS df FROM inv GROUP BY 1, 2),
         |kept AS (
         |  SELECT i.block, i.id, i.sz, i.s
         |  FROM inv i JOIN dfc ON dfc.block = i.block AND dfc.s = i.s
         |  WHERE dfc.df BETWEEN 2 AND ${graft.GraftConf.NgramMaxDf}
         |),
         |pairs AS (
         |  SELECT a.block, a.id AS idA, b.id AS idB, a.sz AS szA, b.sz AS szB,
         |         count(*) AS common
         |  FROM kept a JOIN kept b
         |    ON a.block = b.block AND a.s = b.s AND a.id < b.id
         |  GROUP BY 1, 2, 3, 4, 5
         |)
         |SELECT block, idA, idB,
         |       round(CAST(common AS DOUBLE) / (szA + szB - common), 3) AS jaccard
         |FROM pairs
         |WHERE round(CAST(common AS DOUBLE) / (szA + szB - common), 3) >= 0.5""".stripMargin,
    "q168_containment" ->
      s"""WITH $ShinglesSql,
         |blocked AS (
         |  SELECT d.source AS block, s.id, list_distinct(s.sh) AS sh
         |  FROM shingled s JOIN documents d ON d.doc_id = s.id
         |),
         |inv AS (SELECT block, id, len(sh) AS sz, unnest(sh) AS s FROM blocked),
         |dfc AS (SELECT block, s, count(*) AS df FROM inv GROUP BY 1, 2),
         |kept AS (
         |  SELECT i.block, i.id, i.sz, i.s
         |  FROM inv i JOIN dfc ON dfc.block = i.block AND dfc.s = i.s
         |  WHERE dfc.df BETWEEN 2 AND ${graft.GraftConf.NgramMaxDf}
         |),
         |pairs AS (
         |  SELECT a.block, a.id AS idA, b.id AS idB, a.sz AS szA, b.sz AS szB,
         |         count(*) AS common
         |  FROM kept a JOIN kept b
         |    ON a.block = b.block AND a.s = b.s AND a.id < b.id
         |  GROUP BY 1, 2, 3, 4, 5
         |)
         |SELECT block, idA, idB,
         |       round(CAST(common AS DOUBLE) / szA, 3) AS c_ab,
         |       round(CAST(common AS DOUBLE) / szB, 3) AS c_ba
         |FROM pairs
         |WHERE greatest(round(CAST(common AS DOUBLE) / szA, 3),
         |               round(CAST(common AS DOUBLE) / szB, 3)) >= 0.6""".stripMargin,
    "q34_ann_topk" ->
      s"""WITH $EmbSql,
         |qs AS (SELECT vec_id AS query_id, q AS qq, n AS qn FROM nrm WHERE vec_id % 50 = 0),
         |scored AS (
         |  SELECT c.vec_id AS id, q.query_id,
         |         CAST(list_sum(list_transform(range(1, 65), i -> c.q[i] * q.qq[i])) AS DOUBLE)
         |           / (c.n * q.qn) AS cos
         |  FROM nrm c CROSS JOIN qs q WHERE c.vec_id != q.query_id
         |),
         |ranked AS (
         |  SELECT query_id, id,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS INT) AS rank,
         |         cos
         |  FROM scored
         |)
         |SELECT query_id, id, rank, round(cos, 4) AS cos FROM ranked WHERE rank <= 5""".stripMargin,
    // PQ replay: md5-ordered codebook seeds, per-(vector, subspace,
    // entry) integer squared-L2 distances in one table, codes =
    // argmin with (d, ci) ties, ADC shortlist of 100 = sum of the
    // query's distances at the corpus codes, then exact integer-
    // cosine re-rank of the shortlist. 16 subspaces of 4 dims.
    "q96_pq_ann" ->
      s"""WITH $EmbSql,
         |cb AS (
         |  SELECT row_number() OVER (ORDER BY h) - 1 AS ci, q AS cq
         |  FROM (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, q
         |        FROM nrm ORDER BY h LIMIT 16)
         |),
         |js AS (SELECT unnest(range(0, 16)) AS j),
         |dist AS (
         |  SELECT e.vec_id, j.j, c.ci,
         |         CAST(list_sum(list_transform(range(1, 5), t ->
         |           (e.q[j.j * 4 + t] - c.cq[j.j * 4 + t])
         |             * (e.q[j.j * 4 + t] - c.cq[j.j * 4 + t]))) AS BIGINT) AS d
         |  FROM nrm e CROSS JOIN js j CROSS JOIN cb c
         |),
         |codes AS (
         |  SELECT vec_id, j, ci AS code FROM (
         |    SELECT vec_id, j, ci,
         |           row_number() OVER (PARTITION BY vec_id, j ORDER BY d, ci) AS r
         |    FROM dist
         |  ) WHERE r = 1
         |),
         |scored AS (
         |  SELECT c.vec_id AS id, qd.vec_id AS query_id,
         |         CAST(sum(qd.d) AS BIGINT) AS adist
         |  FROM codes c
         |  JOIN dist qd ON qd.j = c.j AND qd.ci = c.code
         |    AND qd.vec_id % 50 = 0 AND qd.vec_id != c.vec_id
         |  GROUP BY 1, 2
         |),
         |cand AS (
         |  SELECT query_id, id FROM (
         |    SELECT query_id, id,
         |           row_number() OVER (PARTITION BY query_id ORDER BY adist, id) AS arank
         |    FROM scored
         |  ) WHERE arank <= 100
         |),
         |rescored AS (
         |  SELECT cand.query_id, cand.id,
         |         CAST(list_sum(list_transform(range(1, 65), i -> c.q[i] * qv.q[i])) AS DOUBLE)
         |           / (c.n * qv.n) AS cos
         |  FROM cand
         |  JOIN nrm c ON c.vec_id = cand.id
         |  JOIN nrm qv ON qv.vec_id = cand.query_id
         |),
         |ranked AS (
         |  SELECT query_id, id,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS INT) AS rank,
         |         cos
         |  FROM rescored
         |)
         |SELECT query_id, id, rank, round(cos, 4) AS cos FROM ranked WHERE rank <= 5""".stripMargin,
    // Int8-ANN replay: per-vector max|x| scale, round-half-away int8
    // codes, integer dots — every FP step (widen, ×, ÷, round) is
    // IEEE-exact so the codes agree bit-for-bit across engines.
    "q90_int8_ann" ->
      """WITH b AS (
        |  SELECT vec_id, embedding,
        |         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |  FROM embeddings
        |),
        |q8 AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x ->
        |           CASE WHEN mx = 0 THEN 0
        |                ELSE CAST(round(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT)
        |           END) AS q
        |  FROM b
        |),
        |nz AS (
        |  SELECT vec_id, q,
        |         sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS n
        |  FROM q8
        |  WHERE list_sum(list_transform(q, x -> x * x)) > 0
        |),
        |qs AS (SELECT vec_id AS query_id, q AS qq, n AS qn FROM nz WHERE vec_id % 50 = 0),
        |scored AS (
        |  SELECT c.vec_id AS id, q.query_id,
        |         CAST(list_sum(list_transform(range(1, 65), i -> c.q[i] * q.qq[i])) AS DOUBLE)
        |           / (c.n * q.qn) AS cos8
        |  FROM nz c CROSS JOIN qs q WHERE c.vec_id != q.query_id
        |),
        |ranked AS (
        |  SELECT query_id, id,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos8 DESC, id) AS INT) AS rank,
        |         cos8
        |  FROM scored
        |)
        |SELECT query_id, id, rank, round(cos8, 4) AS cos8 FROM ranked WHERE rank <= 5""".stripMargin,
    "q35_ann_lsh" ->
      s"""WITH $EmbSql,
         |$LshSql,
         |qs AS (SELECT vec_id AS query_id, q AS qq, n AS qn, bucket FROM withb WHERE vec_id % 50 = 0),
         |scored AS (
         |  SELECT c.vec_id AS id, q.query_id,
         |         CAST(list_sum(list_transform(range(1, 65), i -> c.q[i] * q.qq[i])) AS DOUBLE)
         |           / (c.n * q.qn) AS cos
         |  FROM withb c JOIN qs q USING (bucket) WHERE c.vec_id != q.query_id
         |),
         |ranked AS (
         |  SELECT query_id, id,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS INT) AS rank,
         |         cos
         |  FROM scored
         |)
         |SELECT query_id, id, rank, round(cos, 4) AS cos FROM ranked WHERE rank <= 5""".stripMargin,
    "q36_langid" ->
      s"""WITH $LangPredSql
         |SELECT doc_id, lang, score_de, score_en, score_es, score_fr, lang_pred
         |FROM langpred""".stripMargin,
    "q37_quality" ->
      """WITH base AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS w,
        |         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT) AS n_tokens
        |  FROM documents
        |)
        |SELECT doc_id, n_tokens,
        |       CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS INT) AS n_bpe,
        |       CASE WHEN length(text) = 0 THEN 0.0
        |            ELSE round(CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
        |                       / length(text), 4) END AS punct_ratio,
        |       CAST(len(list_distinct(w)) AS INT) AS n_distinct,
        |       round(CAST(length(text) - (n_tokens - 1) AS DOUBLE) / n_tokens, 4) AS avg_token_len,
        |       CAST((CAST(4 * least(n_tokens, 100) * n_tokens
        |                  + 300 * len(list_distinct(w))
        |                  + 300 * (n_tokens - len(list_filter(w, x -> x = 'the'))
        |                                    - len(list_filter(w, x -> x = 'a'))) AS BIGINT)
        |              * 20000 + 1000 * n_tokens) // (2000 * n_tokens) AS DOUBLE) / 10000.0 AS quality
        |FROM base""".stripMargin,
    "q50_percentiles" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 4) AS p50,
        |       round(quantile_cont(value, 0.9), 4) AS p90,
        |       round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type""".stripMargin,
    "q51_rollup" ->
      s"""WITH $EvSql
         |SELECT datasourceId, year, CAST(count(*) AS BIGINT) AS n,
         |       round(sum(score), 4) AS sum_score
         |FROM ev GROUP BY ROLLUP (datasourceId, year)""".stripMargin,
    // Rolling-fingerprint replay: direct per-window polynomial sums
    // with the Scala-precomputed 257^k mod 1e9+7 powers table — same
    // residues as the engine's O(n) rolling recurrence.
    "q46_rolling_fp" ->
      s"""WITH b AS (
         |  SELECT doc_id, text, CAST(length(text) AS INT) AS n FROM documents
         |),
         |wins AS (
         |  SELECT doc_id, text, unnest(range(0, n - 15)) AS j FROM b WHERE n >= 16
         |),
         |hashes AS (
         |  SELECT doc_id,
         |         CAST(list_sum(list_transform(range(0, 16),
         |           k -> CAST(ascii(substring(text, CAST(j + k + 1 AS INT), 1)) AS BIGINT)
         |                * ($RollingPowsSql)[CAST(k + 1 AS INT)] % 1000000007))
         |              % 1000000007 AS BIGINT) AS h
         |  FROM wins
         |),
         |m AS (SELECT doc_id, min(h) AS rfp FROM hashes GROUP BY 1)
         |SELECT b.doc_id, m.rfp FROM b LEFT JOIN m USING (doc_id)""".stripMargin,
    // The stub decoder is deterministic byte arithmetic over the UTF-8
    // payload (Multimodal.decodeStub); document text is ASCII, so DuckDB
    // can replay it with ascii(substring(...)) per 8-stride position.
    // feat0 is (acc % 1000)/1000f — 3 decimals, so the float detour
    // rounds exactly at 4dp on both sides.
    // replays the BMP round trip from first principles: pixel k's
    // channels are text bytes (3k+2, 3k+1, 3k) mod n, dims are
    // (8 + n%8) × (8 + (n/8)%8), file size 54 + stride·h with 4-byte
    // row padding — a decoder stride/offset/row-order bug mismatches
    "q38_multimodal" ->
      """WITH b AS (
        |  SELECT doc_id, text, CAST(CASE WHEN length(text) = 0 THEN 1
        |    ELSE length(text) END AS INT) AS n FROM documents
        |),
        |d AS (
        |  SELECT doc_id, text, n, 8 + (n % 8) AS w, 8 + ((n // 8) % 8) AS h
        |  FROM b
        |),
        |px AS (SELECT doc_id, text, n, w, h, unnest(range(0, w * h)) AS k FROM d),
        |s AS (
        |  SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
        |         sum(ascii(substring(text, CAST((3*k + 2) % n AS INT) + 1, 1))) AS rs,
        |         sum(ascii(substring(text, CAST((3*k + 1) % n AS INT) + 1, 1))) AS gs,
        |         sum(ascii(substring(text, CAST((3*k) % n AS INT) + 1, 1))) AS bs
        |  FROM px GROUP BY doc_id
        |)
        |SELECT doc_id,
        |       CAST(54 + ((3*w + 3) // 4) * 4 * h AS INT) AS n_bytes,
        |       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |       round(CAST(rs AS DOUBLE) / (w * h) / 255.0, 4) AS r_mean,
        |       round(CAST(gs AS DOUBLE) / (w * h) / 255.0, 4) AS g_mean,
        |       round(CAST(bs AS DOUBLE) / (w * h) / 255.0, 4) AS b_mean
        |FROM s""".stripMargin,
    "q67_wav_decode" ->
      """WITH b AS (
        |  SELECT doc_id, text, CAST(CASE WHEN length(text) = 0 THEN 1
        |    ELSE length(text) END AS INT) AS n FROM documents
        |),
        |sm AS (SELECT doc_id, text, n, unnest(range(0, 200)) AS i FROM b),
        |v AS (
        |  SELECT doc_id,
        |         abs(ascii(substring(text, CAST((2*i) % n AS INT) + 1, 1)) * 256
        |             + ascii(substring(text, CAST((2*i + 1) % n AS INT) + 1, 1))
        |             - 32768) AS a
        |  FROM sm
        |)
        |SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
        |       CAST(200 AS INT) AS n_samples,
        |       round(CAST(sum(a) AS DOUBLE) / 200, 4) AS mean_abs
        |FROM v GROUP BY doc_id""".stripMargin,
    // nearest-neighbor resize replay: output pixel p=(x,y) of the 8×8
    // target samples source pixel (x·w//8, y·h//8) of the synthesized
    // image, whose channels are the same (3k+c) mod n byte lookups
    "q68_bmp_resize" ->
      """WITH b AS (
        |  SELECT doc_id, text, CAST(CASE WHEN length(text) = 0 THEN 1
        |    ELSE length(text) END AS INT) AS n FROM documents
        |),
        |d AS (
        |  SELECT doc_id, text, n, 8 + (n % 8) AS w, 8 + ((n // 8) % 8) AS h
        |  FROM b
        |),
        |o AS (SELECT doc_id, text, n, w, h, unnest(range(0, 64)) AS p FROM d),
        |m AS (
        |  SELECT doc_id, text, n,
        |         ((p // 8) * h // 8) * w + ((p % 8) * w // 8) AS k
        |  FROM o
        |),
        |s AS (
        |  SELECT doc_id,
        |         sum(ascii(substring(text, CAST((3*k + 2) % n AS INT) + 1, 1))) AS rs,
        |         sum(ascii(substring(text, CAST((3*k + 1) % n AS INT) + 1, 1))) AS gs,
        |         sum(ascii(substring(text, CAST((3*k) % n AS INT) + 1, 1))) AS bs
        |  FROM m GROUP BY doc_id
        |)
        |SELECT doc_id, CAST(246 AS INT) AS n_bytes,
        |       CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
        |       round(CAST(rs AS DOUBLE) / 64 / 255.0, 4) AS r_mean,
        |       round(CAST(gs AS DOUBLE) / 64 / 255.0, 4) AS g_mean,
        |       round(CAST(bs AS DOUBLE) / 64 / 255.0, 4) AS b_mean
        |FROM s""".stripMargin,
    // Trained-IVF replay: seed pick, two unrolled Lloyd steps, then
    // replication-4 corpus / nProbe-4 query assignment over the
    // trained centroids; DISTINCT collapses pairs meeting in several
    // cells (cos is identical per pair).
    "q49_ann_ivf_trained" ->
      s"""WITH $EmbSql,
         |c0 AS (
         |  SELECT md5(CAST(vec_id AS VARCHAR)) AS cell, q AS cv, n AS cn
         |  FROM nrm ORDER BY cell LIMIT 8
         |),
         |${IvfAssignSql("c0", "a1", 1)},
         |${IvfLloydSql("a1", "c1")},
         |${IvfAssignSql("c1", "a2", 1)},
         |${IvfLloydSql("a2", "c2")},
         |${IvfAssignSql("c2", "casgn", 4)},
         |${IvfAssignSql("c2", "qasgn0", 4, "WHERE e.vec_id % 50 = 0")},
         |qasgn AS (SELECT vec_id AS query_id, q AS qq, n AS qn, cell FROM qasgn0),
         |scored AS (
         |  SELECT DISTINCT c.vec_id AS id, qx.query_id,
         |         CAST(list_sum(list_transform(range(1, 65), i -> c.q[i] * qx.qq[i])) AS DOUBLE)
         |           / (c.n * qx.qn) AS cos
         |  FROM casgn c JOIN qasgn qx USING (cell) WHERE c.vec_id != qx.query_id
         |),
         |ranked AS (
         |  SELECT query_id, id,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS INT) AS rank,
         |         cos
         |  FROM scored
         |)
         |SELECT query_id, id, rank, round(cos, 4) AS cos FROM ranked WHERE rank <= 5""".stripMargin,
    // Cosine near-dup replay: pairs sharing an LSH bucket (bucket-cap
    // guarded like q31) with unrounded cosine >= 0.35.
    "q45_cosine_neardup" ->
      s"""WITH $EmbSql,
         |$LshSql,
         |bsz AS (SELECT bucket, count(*) AS bn FROM withb GROUP BY 1),
         |ok AS (
         |  SELECT w.* FROM withb w JOIN bsz USING (bucket)
         |  WHERE bn > 1 AND bn <= ${graft.GraftConf.LshBucketCap}
         |)
         |SELECT a.vec_id AS idA, b.vec_id AS idB,
         |       round(CAST(list_sum(list_transform(range(1, 65), i -> a.q[i] * b.q[i])) AS DOUBLE)
         |             / (a.n * b.n), 4) AS cos
         |FROM ok a JOIN ok b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE CAST(list_sum(list_transform(range(1, 65), i -> a.q[i] * b.q[i])) AS DOUBLE)
         |      / (a.n * b.n) >= 0.35""".stripMargin,
    // Range-join replay: a plain SQL interval predicate — the binned
    // reformulation must be exactly equivalent.
    "q48_range_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
        |),
        |clicks AS (
        |  SELECT user_id, event_id AS click_id, ts FROM ev WHERE event_type = 'click'
        |),
        |purchases AS (
        |  SELECT user_id, event_id AS purchase_id, ts AS p_start,
        |         ts + INTERVAL 2 HOUR AS p_end
        |  FROM ev WHERE event_type = 'purchase'
        |)
        |SELECT c.user_id, c.click_id, p.purchase_id,
        |       CAST(epoch_us(c.ts) - epoch_us(p.p_start) AS BIGINT) AS gap_us
        |FROM clicks c JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts >= p.p_start AND c.ts <= p.p_end""".stripMargin,
    // Frame sampling replay: every 4th full 64-byte window of the
    // ASCII payload, hashed — byte-identical to the stub pipeline.
    "q44_frame_sample" ->
      """WITH b AS (
        |  SELECT doc_id, text, CAST(length(text) AS INT) AS n FROM documents
        |),
        |fr AS (
        |  SELECT doc_id, unnest(range(0, n // 64, 4)) AS fidx, text
        |  FROM b WHERE n >= 64
        |)
        |SELECT doc_id, CAST(fidx AS INT) AS frame_idx,
        |       md5(substring(text, CAST(fidx * 64 + 1 AS INT), 64)) AS frame_md5
        |FROM fr""".stripMargin,
    // IVF replay: same md5-ordered seed pick, Voronoi assignment with
    // (sim DESC, cell) tie-break, nProbe=4 probe cells, exact integer
    // dots — bit-identical doubles end to end.
    "q39_ann_ivf" ->
      s"""WITH $EmbSql,
         |cent AS (
         |  SELECT md5(CAST(vec_id AS VARCHAR)) AS cell, q AS cv, n AS cn
         |  FROM nrm ORDER BY cell LIMIT 16
         |),
         |casgn AS (
         |  SELECT vec_id, q, n, cell FROM (
         |    SELECT e.vec_id, e.q, e.n, c.cell,
         |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |             CAST(list_sum(list_transform(range(1, 65), i -> e.q[i] * c.cv[i])) AS DOUBLE)
         |               / (e.n * c.cn) DESC, c.cell) AS r
         |    FROM nrm e CROSS JOIN cent c
         |  ) WHERE r = 1
         |),
         |qasgn AS (
         |  SELECT vec_id AS query_id, q AS qq, n AS qn, cell FROM (
         |    SELECT e.vec_id, e.q, e.n, c.cell,
         |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |             CAST(list_sum(list_transform(range(1, 65), i -> e.q[i] * c.cv[i])) AS DOUBLE)
         |               / (e.n * c.cn) DESC, c.cell) AS r
         |    FROM nrm e CROSS JOIN cent c
         |    WHERE e.vec_id % 50 = 0
         |  ) WHERE r <= 4
         |),
         |scored AS (
         |  SELECT c.vec_id AS id, q.query_id,
         |         CAST(list_sum(list_transform(range(1, 65), i -> c.q[i] * q.qq[i])) AS DOUBLE)
         |           / (c.n * q.qn) AS cos
         |  FROM casgn c JOIN qasgn q USING (cell) WHERE c.vec_id != q.query_id
         |),
         |ranked AS (
         |  SELECT query_id, id,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS INT) AS rank,
         |         cos
         |  FROM scored
         |)
         |SELECT query_id, id, rank, round(cos, 4) AS cos FROM ranked WHERE rank <= 5""".stripMargin,
    // Gopher rules: every flag re-derived in the same INTEGER
    // arithmetic, so booleans are exact in both engines.
    "q52_gopher_rules" ->
      s"""WITH $GopherDocSql
         |SELECT doc_id, n AS n_words, aw AS alpha_words, sh AS stop_hits,
         |       (n BETWEEN 30 AND 100000) AS ok_words,
         |       (n > 0 AND (l - (n - 1)) >= 3 * n AND (l - (n - 1)) <= 10 * n) AS ok_mean_len,
         |       (aw * 10 >= n * 8) AS ok_alpha,
         |       (sh >= 2) AS ok_stop,
         |       (sym * 10 <= l) AS ok_symbol,
         |       (${gopherPassPred(2)}) AS gopher_pass
         |FROM d""".stripMargin,
    // Repetition replay via the naive explode→group-by formulation —
    // the engine's shuffle-free run-length fold must agree exactly.
    "q53_repetition" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 2
        |),
        |c AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY 1, 2),
        |a AS (
        |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total, max(cnt) AS mx,
        |         CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup
        |  FROM c GROUP BY 1
        |)
        |SELECT d.doc_id,
        |       coalesce(a.total, 0) AS n_grams,
        |       coalesce(a.mx, 0) AS top_count,
        |       coalesce(a.dup, 0) AS dup_count,
        |       CASE WHEN coalesce(a.total, 0) = 0 THEN 0.0
        |            ELSE CAST((a.mx * 20000 + a.total) // (a.total * 2) AS DOUBLE) / 10000 END AS top_frac,
        |       CASE WHEN coalesce(a.total, 0) = 0 THEN 0.0
        |            ELSE CAST((a.dup * 20000 + a.total) // (a.total * 2) AS DOUBLE) / 10000 END AS dup_frac
        |FROM documents d LEFT JOIN a USING (doc_id)""".stripMargin,
    "q54_hash_split" ->
      s"""WITH h AS (
         |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':split') AS h FROM documents
         |),
         |b AS (SELECT doc_id, ${HexBucketSql("h")} AS bucket FROM h)
         |SELECT doc_id, bucket,
         |       CASE WHEN bucket < 80 THEN 'train'
         |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
         |FROM b""".stripMargin,
    "q55_contamination" ->
      s"""WITH $ShinglesSql,
         |b AS (SELECT id AS bench_id, unnest(list_distinct(sh)) AS s FROM shingled WHERE id % 20 = 0),
         |c AS (SELECT id, unnest(list_distinct(sh)) AS s FROM shingled WHERE id % 20 <> 0)
         |SELECT c.id AS doc_id,
         |       CAST(count(DISTINCT c.s) AS BIGINT) AS n_shared,
         |       CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs
         |FROM c JOIN b USING (s)
         |GROUP BY 1
         |HAVING count(DISTINCT c.s) >= 5""".stripMargin,
    // excision replay: 1-based positional shingles, covered word
    // positions via the 0..2 offset cross join, string_agg rebuild
    "q129_decontaminate" ->
      """WITH w AS (
        |  SELECT doc_id AS id, string_split(text, ' ') AS w
        |  FROM documents WHERE doc_id % 20 <> 0
        |),
        |bsh AS (
        |  SELECT DISTINCT unnest(list_transform(range(1, len(w) - 1),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents
        |        WHERE doc_id % 20 = 0)
        |  WHERE len(w) >= 3
        |),
        |cpos AS (
        |  SELECT id, w, unnest(range(1, len(w) - 1)) AS i
        |  FROM w WHERE len(w) >= 3
        |),
        |csh AS (SELECT id, i, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM cpos),
        |hits AS (SELECT DISTINCT c.id, c.i FROM csh c JOIN bsh b USING (s)),
        |cov AS (
        |  SELECT DISTINCT id, i + x AS p
        |  FROM hits CROSS JOIN (SELECT unnest(range(0, 3)) AS x)
        |),
        |wpos AS (
        |  SELECT id, unnest(w) AS word, unnest(range(1, len(w) + 1)) AS p FROM w
        |),
        |k AS (
        |  SELECT wp.id,
        |         string_agg(CASE WHEN c.p IS NULL THEN wp.word END, ' '
        |           ORDER BY wp.p) AS cleaned,
        |         CAST(sum(CASE WHEN c.p IS NOT NULL THEN 1 ELSE 0 END) AS INT)
        |           AS n_removed
        |  FROM wpos wp LEFT JOIN cov c ON c.id = wp.id AND c.p = wp.p
        |  GROUP BY 1
        |)
        |SELECT w.id AS doc_id, CAST(len(w.w) AS INT) AS n_words,
        |       k.n_removed, md5(coalesce(k.cleaned, '')) AS clean_hash,
        |       k.n_removed > 0 AS contaminated
        |FROM w JOIN k ON k.id = w.id""".stripMargin,
    "q56_stratified_sample" ->
      s"""WITH r AS (
         |  SELECT source,
         |         ((CASE WHEN ascii(substring(md5(source), 1, 1)) >= 97
         |                THEN ascii(substring(md5(source), 1, 1)) - 87
         |                ELSE ascii(substring(md5(source), 1, 1)) - 48 END) % 8) * 10 + 20 AS pct
         |  FROM (SELECT DISTINCT source FROM documents)
         |),
         |h AS (
         |  SELECT d.doc_id, d.source, r.pct,
         |         ${HexBucketSql("md5(CAST(d.doc_id AS VARCHAR) || ':strat')")} AS bucket
         |  FROM documents d JOIN r USING (source)
         |)
         |SELECT doc_id, source, bucket, pct FROM h WHERE bucket < pct""".stripMargin,
    "q57_token_freq" ->
      """SELECT word, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY 1 ORDER BY n DESC, word LIMIT 100""".stripMargin,
    // Incremental-agg oracle: aggregate the FULL input directly — the
    // merged history⊕delta state must land on identical numbers.
    "q101_incremental_agg" ->
      """SELECT event_type,
        |       CAST(count(value) AS BIGINT) AS n,
        |       round(sum(value), 4) AS sum_v,
        |       round(min(value), 4) AS min_v,
        |       round(max(value), 4) AS max_v,
        |       round(sum(value) / count(value), 4) AS avg_v
        |FROM events GROUP BY event_type""".stripMargin,
    // TPC-H Q3 replay (adapted: no shippriority column in this
    // schema; date bracket around one cutoff).
    "q102_tpch_q3" ->
      """SELECT l.l_orderkey,
        |       strftime(CAST(o.o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS o_date,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l.l_shipdate > TIMESTAMP '1997-06-01'
        |GROUP BY l.l_orderkey, o.o_orderdate
        |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin,
    "q103_session_transitions" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
        |),
        |gapped AS (
        |  SELECT *, epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM ev
        |),
        |flagged AS (
        |  SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM gapped
        |),
        |sess AS (
        |  SELECT *, sum(new_s) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM flagged
        |),
        |pr AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (
        |           PARTITION BY user_id, session_id ORDER BY ts, event_id) AS to_type
        |  FROM sess
        |),
        |c AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM pr WHERE to_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n,
        |       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 4) AS p
        |FROM c""".stripMargin,
    // Rolling-anomaly oracle: the variance is spelled as the identical
    // sum/sum-of-squares expression the Scala side evaluates, so both
    // engines hit the same fp formula; 1e-12 floors a constant
    // baseline on both sides.
    "q104_rolling_anomaly" ->
      s"""WITH $OverallSql,
         |s AS (
         |  SELECT diseaseId, targetId, year, coalesce(score, 0) AS s0 FROM overall
         |),
         |r AS (
         |  SELECT diseaseId, targetId, year, s0,
         |         CAST(count(*) OVER w AS DOUBLE) AS n,
         |         sum(s0) OVER w AS sm,
         |         sum(s0 * s0) OVER w AS s2
         |  FROM s
         |  WINDOW w AS (PARTITION BY diseaseId, targetId ORDER BY year
         |               ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
         |)
         |SELECT diseaseId, targetId, year, round(s0, 4) AS score,
         |       round((s0 - sm / n) / sqrt((s2 - sm * sm / n) / (n - 1)), 4) AS z
         |FROM r
         |WHERE n >= 3 AND (s2 - sm * sm / n) / (n - 1) > 1e-12
         |  AND round((s0 - sm / n) / sqrt((s2 - sm * sm / n) / (n - 1)), 4) >= 2.0""".stripMargin,
    // DSIR oracle: integer bucket counts rebuilt from scratch, the
    // same Laplace smoothing, ln-ratio, and per-doc sum; rounding at
    // the projection absorbs ln()/fold-order ulps.
    "q105_dsir_select" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t
         |  FROM documents
         |),
         |b AS (SELECT doc_id, t, ${HexValSql("md5(w)", 1, 6)} % 64 AS bkt FROM tok),
         |cnt AS (
         |  SELECT bkt, CAST(count(*) AS BIGINT) AS cc, CAST(sum(t) AS BIGINT) AS tc
         |  FROM b GROUP BY 1
         |),
         |tot AS (SELECT sum(cc) + 64.0 AS ct, sum(tc) + 64.0 AS tt FROM cnt),
         |ratio AS (
         |  SELECT bkt, ln((tc + 1.0) / tt) - ln((cc + 1.0) / ct) AS r FROM cnt, tot
         |),
         |docw AS (
         |  SELECT b.doc_id, sum(r.r) AS logw
         |  FROM b JOIN ratio r USING (bkt) GROUP BY 1
         |)
         |SELECT d.doc_id, d.source, d.lang, round(w.logw, 4) AS logw
         |FROM docw w JOIN documents d USING (doc_id)
         |ORDER BY w.logw DESC, d.doc_id LIMIT 50""".stripMargin,
    // Stratum-cap oracle: the window spelling of the same sample —
    // rank by the identical md5-uniform, keep rk <= 10. The Scala
    // side's bounded aggregate must land on the same kept set.
    // PageRank oracle: the driver-side loop unrolled as chained CTEs —
    // identical start vector, per-round formula, and damping
    // arithmetic ((1 - 0.85), not a pre-folded 0.15, so both engines
    // hit the same doubles).
    "q108_pagerank" ->
      s"""WITH $EmbSql,
         |$LshSql,
         |bsz AS (SELECT bucket, count(*) AS bn FROM withb GROUP BY 1),
         |ok AS (
         |  SELECT w.* FROM withb w JOIN bsz USING (bucket)
         |  WHERE bn > 1 AND bn <= ${graft.GraftConf.LshBucketCap}
         |),
         |prs AS (
         |  SELECT a.vec_id AS idA, b.vec_id AS idB
         |  FROM ok a JOIN ok b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE CAST(list_sum(list_transform(range(1, 65), i -> a.q[i] * b.q[i])) AS DOUBLE)
         |        / (a.n * b.n) >= 0.35
         |),
         |edges AS (
         |  SELECT idA AS src, idB AS dst FROM prs
         |  UNION ALL
         |  SELECT idB AS src, idA AS dst FROM prs
         |),
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         |r0 AS (SELECT id, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
         |$PageRankItersSql
         |SELECT id, round(rank, 6) AS rank FROM r8""".stripMargin,
    // Triangle oracle: the naive id-ordered closure (a<b<c via
    // e(a,b)⋈e(b,c)⋈e(a,c)) over the q31 pair set —
    // orientation-invariant, so it must land on the Scala side's
    // degree-oriented counts exactly.
    "q111_triangles" ->
      s"""WITH $MinhashPairsSql,
         |prs AS (SELECT idA, idB FROM lshpairs),
         |tw AS (
         |  SELECT e1.idA AS x, e1.idB AS y, e2.idB AS z
         |  FROM prs e1
         |  JOIN prs e2 ON e1.idB = e2.idA
         |  JOIN prs e3 ON e3.idA = e1.idA AND e3.idB = e2.idB
         |),
         |m AS (
         |  SELECT x AS id FROM tw
         |  UNION ALL SELECT y FROM tw
         |  UNION ALL SELECT z FROM tw
         |)
         |SELECT id, CAST(count(*) AS BIGINT) AS tri FROM m GROUP BY id""".stripMargin,
    // KMV replay: the sketch IS the k smallest hashes, so row_number
    // over the same 60-bit md5 values rebuilds it exactly; union /
    // membership flags replay the array set ops
    "q113_kmv_overlap" ->
      s"""WITH h AS (
         |  SELECT DISTINCT event_type AS seg,
         |    ${HexValSql("md5(CAST(user_id AS VARCHAR) || ':kmv')", 1, 15)} AS h
         |  FROM events
         |),
         |r AS (
         |  SELECT seg, h, row_number() OVER (PARTITION BY seg ORDER BY h) AS rn,
         |         count(*) OVER (PARTITION BY seg) AS n_exact
         |  FROM h
         |),
         |sk AS (SELECT seg, h, n_exact FROM r WHERE rn <= 64),
         |est AS (
         |  SELECT seg, max(n_exact) AS n_exact, count(*) AS ksize,
         |         CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
         |              ELSE 63.0 / (CAST(max(h) AS DOUBLE) / 1152921504606846976.0)
         |         END AS d_est
         |  FROM sk GROUP BY 1
         |),
         |pairs AS (
         |  SELECT a.seg AS seg_a, b.seg AS seg_b
         |  FROM est a JOIN est b ON a.seg < b.seg
         |),
         |uh AS (
         |  SELECT p.seg_a, p.seg_b, s.h,
         |         max(CASE WHEN s.seg = p.seg_a THEN 1 ELSE 0 END) AS in_a,
         |         max(CASE WHEN s.seg = p.seg_b THEN 1 ELSE 0 END) AS in_b
         |  FROM pairs p JOIN sk s ON s.seg IN (p.seg_a, p.seg_b)
         |  GROUP BY 1, 2, 3
         |),
         |ur AS (
         |  SELECT seg_a, seg_b, h, in_a, in_b,
         |         row_number() OVER (PARTITION BY seg_a, seg_b ORDER BY h) AS rn
         |  FROM uh
         |),
         |ue AS (
         |  SELECT seg_a, seg_b, count(*) AS ku,
         |         sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS inter,
         |         CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
         |              ELSE 63.0 / (CAST(max(h) AS DOUBLE) / 1152921504606846976.0)
         |         END AS du
         |  FROM ur WHERE rn <= 64 GROUP BY 1, 2
         |)
         |SELECT u.seg_a, u.seg_b,
         |       CAST(ea.n_exact AS BIGINT) AS n_a,
         |       CAST(eb.n_exact AS BIGINT) AS n_b,
         |       round(ea.d_est, 4) AS est_a, round(eb.d_est, 4) AS est_b,
         |       round(u.du, 4) AS est_union,
         |       round(CAST(u.inter AS DOUBLE) / u.ku, 4) AS est_jaccard,
         |       round(CAST(u.inter AS DOUBLE) / u.ku * u.du, 4) AS est_intersect
         |FROM ue u
         |JOIN est ea ON ea.seg = u.seg_a
         |JOIN est eb ON eb.seg = u.seg_b""".stripMargin,
    "q136_cdc_apply" ->
      """WITH log AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         CAST(round(value * 100) AS BIGINT) AS v_i
        |  FROM events
        |),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY us DESC, event_id DESC) AS rk
        |  FROM log
        |)
        |SELECT user_id, round(CAST(v_i AS DOUBLE) / 100, 4) AS last_v
        |FROM r WHERE rk = 1 AND op <> 'D'""".stripMargin,
    "q146_bm25" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |),
        |t AS (
        |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
        |         CAST(len(list_filter(w, x -> x = 'spark')) AS BIGINT) AS tf0,
        |         CAST(len(list_filter(w, x -> x = 'stream')) AS BIGINT) AS tf1,
        |         CAST(len(list_filter(w, x -> x = 'vector')) AS BIGINT) AS tf2
        |  FROM d
        |),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nd,
        |         CAST(sum(dl) AS BIGINT) AS tdl,
        |         CAST(count(CASE WHEN tf0 > 0 THEN 1 END) AS BIGINT) AS df0,
        |         CAST(count(CASE WHEN tf1 > 0 THEN 1 END) AS BIGINT) AS df1,
        |         CAST(count(CASE WHEN tf2 > 0 THEN 1 END) AS BIGINT) AS df2
        |  FROM t
        |),
        |sc AS (
        |  SELECT doc_id,
        |    round(
        |      (CASE WHEN tf0 > 0 THEN
        |         ln(1.0 + (CAST(nd AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5)
        |              / (CAST(df0 AS DOUBLE) + 0.5))
        |         * CAST(tf0 AS DOUBLE) * 2.2
        |         / (CAST(tf0 AS DOUBLE) + 1.2 * (1.0 - 0.75
        |             + 0.75 * CAST(dl AS DOUBLE)
        |               / (CAST(tdl AS DOUBLE) / CAST(nd AS DOUBLE))))
        |       ELSE 0.0 END)
        |      + (CASE WHEN tf1 > 0 THEN
        |         ln(1.0 + (CAST(nd AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5)
        |              / (CAST(df1 AS DOUBLE) + 0.5))
        |         * CAST(tf1 AS DOUBLE) * 2.2
        |         / (CAST(tf1 AS DOUBLE) + 1.2 * (1.0 - 0.75
        |             + 0.75 * CAST(dl AS DOUBLE)
        |               / (CAST(tdl AS DOUBLE) / CAST(nd AS DOUBLE))))
        |       ELSE 0.0 END)
        |      + (CASE WHEN tf2 > 0 THEN
        |         ln(1.0 + (CAST(nd AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5)
        |              / (CAST(df2 AS DOUBLE) + 0.5))
        |         * CAST(tf2 AS DOUBLE) * 2.2
        |         / (CAST(tf2 AS DOUBLE) + 1.2 * (1.0 - 0.75
        |             + 0.75 * CAST(dl AS DOUBLE)
        |               / (CAST(tdl AS DOUBLE) / CAST(nd AS DOUBLE))))
        |       ELSE 0.0 END), 4) AS bm25
        |  FROM t CROSS JOIN s
        |)
        |SELECT doc_id, bm25 FROM sc WHERE bm25 > 0
        |ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin,
    "q147_linear_trend" ->
      """WITH series AS (
        |  SELECT l_returnflag AS datasourceId,
        |         CAST(year(l_shipdate) AS BIGINT) AS x,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1, 2
        |),
        |m AS (
        |  SELECT datasourceId,
        |         CAST(count(*) AS HUGEINT) AS n,
        |         CAST(sum(x) AS HUGEINT) AS sx,
        |         CAST(sum(y) AS HUGEINT) AS sy,
        |         CAST(sum(x*y) AS HUGEINT) AS sxy,
        |         CAST(sum(x*x) AS HUGEINT) AS sxx,
        |         CAST(sum(y*y) AS HUGEINT) AS syy
        |  FROM series GROUP BY 1
        |),
        |f AS (
        |  SELECT datasourceId, n,
        |         n*sxy - sx*sy AS num,
        |         n*sxx - sx*sx AS varx,
        |         n*syy - sy*sy AS vary,
        |         sx, sy
        |  FROM m
        |  WHERE n >= 2 AND n*sxx - sx*sx > 0
        |)
        |SELECT datasourceId,
        |       CAST(n AS BIGINT) AS n_points,
        |       round(CAST(num AS DOUBLE) / CAST(varx AS DOUBLE), 4) AS slope,
        |       round((CAST(sy AS DOUBLE)
        |           - (CAST(num AS DOUBLE) / CAST(varx AS DOUBLE))
        |             * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 4) AS intercept,
        |       CASE WHEN vary > 0
        |         THEN round(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
        |                / (CAST(varx AS DOUBLE) * CAST(vary AS DOUBLE)), 4)
        |       END AS r2
        |FROM f""".stripMargin,
    // Silhouette replay: q39's seed pick, full 16-way in-row scoring,
    // top-2 by (sim desc, cell) → a/b distances → per-cell mean.
    "q161_silhouette" ->
      s"""WITH $EmbSql,
         |cent AS (
         |  SELECT md5(CAST(vec_id AS VARCHAR)) AS cell, q AS cv, n AS cn
         |  FROM nrm ORDER BY cell LIMIT 16
         |),
         |sims AS (
         |  SELECT e.vec_id, c.cell,
         |         CAST(list_sum(list_transform(range(1, 65), i -> e.q[i] * c.cv[i])) AS DOUBLE)
         |           / (e.n * c.cn) AS sim
         |  FROM nrm e CROSS JOIN cent c
         |),
         |rk AS (
         |  SELECT vec_id, cell, 1 - sim AS d,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS r
         |  FROM sims
         |),
         |sil AS (
         |  SELECT a.vec_id, a.cell,
         |         CASE WHEN greatest(a.d, b.d) > 0
         |           THEN (b.d - a.d) / greatest(a.d, b.d) ELSE 0 END AS s
         |  FROM rk a JOIN rk b ON a.vec_id = b.vec_id AND a.r = 1 AND b.r = 2
         |)
         |SELECT cell, CAST(count(*) AS BIGINT) AS n,
         |       round(avg(s), 4) AS avg_silhouette
         |FROM sil GROUP BY 1""".stripMargin,
    "q162_js_divergence" ->
      """WITH c AS (
        |  SELECT cat, tok, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT source AS cat, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  GROUP BY 1, 2
        |),
        |tt AS (SELECT cat, CAST(sum(c) AS BIGINT) AS t FROM c GROUP BY 1),
        |p AS (SELECT c.cat, c.tok, CAST(c.c AS DOUBLE) / tt.t AS p
        |      FROM c JOIN tt USING (cat)),
        |j AS (
        |  SELECT a.cat AS cat_a, b.cat AS cat_b, CAST(count(*) AS BIGINT) AS n_common,
        |         sum(a.p * ln(2 * a.p / (a.p + b.p))) AS s1,
        |         sum(b.p * ln(2 * b.p / (a.p + b.p))) AS s2,
        |         sum(a.p) AS pm, sum(b.p) AS qm
        |  FROM p a JOIN p b ON a.tok = b.tok AND a.cat < b.cat
        |  GROUP BY 1, 2
        |)
        |SELECT cat_a, cat_b, n_common,
        |       round((s1 + ln(2) * (1 - pm)) / 2
        |           + (s2 + ln(2) * (1 - qm)) / 2, 4) AS js
        |FROM j""".stripMargin,
    "q163_rfm" ->
      """WITH u AS (
        |  SELECT user_id, max(epoch_us(ts)) AS last_us,
        |         CAST(count(*) AS BIGINT) AS frequency,
        |         round(sum(value), 4) AS monetary
        |  FROM events GROUP BY 1
        |),
        |h AS (SELECT max(last_us) AS h FROM u),
        |s AS (
        |  SELECT user_id,
        |         CAST((h.h - last_us) // 86400000000 AS BIGINT) AS recency_days,
        |         frequency, monetary
        |  FROM u, h
        |),
        |t AS (
        |  SELECT list_transform(quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]),
        |                        x -> round(x, 4)) AS rt,
        |         list_transform(quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]),
        |                        x -> round(x, 4)) AS ft,
        |         list_transform(quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]),
        |                        x -> round(x, 4)) AS mt
        |  FROM s
        |)
        |SELECT user_id, recency_days, frequency, monetary,
        |       CAST(5 - len(list_filter(rt, x -> recency_days > x)) AS INT) AS r_score,
        |       CAST(1 + len(list_filter(ft, x -> frequency > x)) AS INT) AS f_score,
        |       CAST(1 + len(list_filter(mt, x -> monetary > x)) AS INT) AS m_score,
        |       CAST((5 - len(list_filter(rt, x -> recency_days > x))) * 100
        |          + (1 + len(list_filter(ft, x -> frequency > x))) * 10
        |          + (1 + len(list_filter(mt, x -> monetary > x))) AS INT) AS rfm
        |FROM s, t""".stripMargin,
    "q164_user_paths" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events
        |),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 3 GROUP BY user_id
        |)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_users
        |FROM p GROUP BY 1""".stripMargin,
    "q165_growth" ->
      s"""WITH $EvSql,
         |series AS (
         |  SELECT datasourceId, year, CAST(count(*) AS BIGINT) AS n
         |  FROM ev GROUP BY 1, 2
         |),
         |g AS (
         |  SELECT datasourceId, year, n,
         |         lag(n) OVER (PARTITION BY datasourceId ORDER BY year) AS prev,
         |         arg_min(n, year) OVER (PARTITION BY datasourceId) AS fv,
         |         arg_max(n, year) OVER (PARTITION BY datasourceId) AS lv,
         |         max(year) OVER (PARTITION BY datasourceId)
         |           - min(year) OVER (PARTITION BY datasourceId) AS span
         |  FROM series
         |)
         |SELECT datasourceId, year, n,
         |       round(CAST(n AS DOUBLE) / prev - 1, 4) AS yoy,
         |       CASE WHEN span > 0 AND fv > 0
         |         THEN round(pow(CAST(lv AS DOUBLE) / fv, 1.0 / span) - 1, 4)
         |       END AS cagr
         |FROM g""".stripMargin,
    "q166_langid_confusion" ->
      s"""WITH $LangPredSql,
         |m AS (
         |  SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
         |  FROM langpred GROUP BY 1, 2
         |)
         |SELECT lang, lang_pred, n,
         |       round(CAST(n AS DOUBLE)
         |         / sum(n) OVER (PARTITION BY lang), 4) AS share
         |FROM m""".stripMargin,
    "q167_percent_rank" ->
      """SELECT doc_id, source, n_chars,
        |       round(percent_rank() OVER (
        |         PARTITION BY source ORDER BY n_chars), 4) AS pr
        |FROM documents""".stripMargin,
    "q169_mad" ->
      """WITH med AS (
        |  SELECT event_type, round(quantile_cont(value, 0.5), 4) AS median
        |  FROM events GROUP BY 1
        |),
        |dev AS (
        |  SELECT e.event_type, e.value, m.median,
        |         abs(e.value - m.median) AS ad
        |  FROM events e JOIN med m USING (event_type)
        |),
        |md AS (
        |  SELECT event_type, round(quantile_cont(ad, 0.5), 4) AS mad
        |  FROM dev GROUP BY 1
        |)
        |SELECT d.event_type, any_value(d.median) AS median,
        |       any_value(m.mad) AS mad,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(CASE WHEN d.ad > 3.0 * 1.4826 * m.mad THEN 1 END)
        |         AS BIGINT) AS n_outliers
        |FROM dev d JOIN md m USING (event_type)
        |GROUP BY 1""".stripMargin,
    "q158_cube" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q159_seasonal" ->
      """WITH m AS (
        |  SELECT event_type, CAST(month(CAST(ts AS TIMESTAMP)) AS INT) AS month,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, month, n,
        |       round(12.0 * n / sum(n) OVER (PARTITION BY event_type), 4) AS idx
        |FROM m""".stripMargin,
    "q160_vocab_overlap" ->
      """WITH v AS (
        |  SELECT DISTINCT cat, tok FROM (
        |    SELECT source AS cat, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |),
        |sz AS (SELECT cat, CAST(count(*) AS BIGINT) AS sz FROM v GROUP BY 1),
        |i AS (
        |  SELECT a.cat AS cat_a, b.cat AS cat_b, CAST(count(*) AS BIGINT) AS n_common
        |  FROM v a JOIN v b USING (tok) WHERE a.cat < b.cat
        |  GROUP BY 1, 2
        |)
        |SELECT cat_a, cat_b, n_common,
        |       round(CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common), 4) AS jaccard
        |FROM i JOIN sz sa ON sa.cat = i.cat_a JOIN sz sb ON sb.cat = i.cat_b""".stripMargin,
    "q153_stream_ohlc" ->
      """WITH ev AS (
        |  SELECT event_type, value, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events
        |),
        |mx AS (SELECT max(ts) AS mt FROM ev),
        |r AS (
        |  SELECT date_trunc('hour', ts) AS ws, event_type, value,
        |         row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
        |           ORDER BY us, event_id) AS ra,
        |         row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
        |           ORDER BY us DESC, event_id DESC) AS rd
        |  FROM ev
        |),
        |w AS (
        |  SELECT ws, event_type,
        |         round(max(CASE WHEN ra = 1 THEN value END), 4) AS open,
        |         round(max(value), 4) AS high,
        |         round(min(value), 4) AS low,
        |         round(max(CASE WHEN rd = 1 THEN value END), 4) AS close,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM r GROUP BY 1, 2
        |)
        |SELECT strftime(w.ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |       w.event_type, w.open, w.high, w.low, w.close, w.n
        |FROM w, mx WHERE w.ws + INTERVAL 1 HOUR <= mx.mt - INTERVAL 2 HOUR""".stripMargin,
    "q154_rrf" ->
      """WITH a AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x = 'spark'))
        |           AS DOUBLE) AS s
        |  FROM documents
        |),
        |ar AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
        |  FROM a QUALIFY r <= 50
        |),
        |b AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS s FROM documents),
        |br AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
        |  FROM b QUALIFY r <= 50
        |),
        |u AS (SELECT * FROM ar UNION ALL SELECT * FROM br)
        |SELECT doc_id, round(sum(1.0 / (r + 60)), 6) AS rrf,
        |       CAST(count(*) AS BIGINT) AS n_lists
        |FROM u GROUP BY 1
        |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    "q155_mixture_entropy" ->
      """WITH c AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2
        |),
        |m AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_cats,
        |         CAST(sum(c) AS BIGINT) AS n_rows,
        |         sum(CAST(c AS DOUBLE) * ln(c)) AS cl
        |  FROM c GROUP BY 1
        |)
        |SELECT lang, n_cats, n_rows,
        |       round(ln(n_rows) - cl / n_rows, 4) AS entropy,
        |       round(exp(ln(n_rows) - cl / n_rows), 4) AS eff_cats
        |FROM m""".stripMargin,
    "q156_ab_ztest" ->
      """WITH g AS (
        |  SELECT event_type,
        |         CAST(count(CASE WHEN user_id % 2 = 0 THEN 1 END) AS BIGINT) AS n_a,
        |         CAST(count(CASE WHEN user_id % 2 = 0 AND value > 0.5 THEN 1 END) AS BIGINT) AS x_a,
        |         CAST(count(CASE WHEN user_id % 2 = 1 THEN 1 END) AS BIGINT) AS n_b,
        |         CAST(count(CASE WHEN user_id % 2 = 1 AND value > 0.5 THEN 1 END) AS BIGINT) AS x_b
        |  FROM events GROUP BY 1
        |)
        |SELECT event_type, n_a, x_a, n_b, x_b,
        |       CASE WHEN n_a > 0 AND n_b > 0
        |                 AND (x_a + x_b) > 0 AND (x_a + x_b) < (n_a + n_b)
        |         THEN round(
        |           (CAST(x_b AS DOUBLE)/n_b - CAST(x_a AS DOUBLE)/n_a)
        |           / sqrt((CAST(x_a + x_b AS DOUBLE)/(n_a + n_b))
        |                  * (1 - CAST(x_a + x_b AS DOUBLE)/(n_a + n_b))
        |                  * (1.0/n_a + 1.0/n_b)), 4)
        |       END AS z
        |FROM g""".stripMargin,
    "q157_winsorize" ->
      """WITH th AS (
        |  SELECT event_type, round(quantile_cont(value, 0.1), 4) AS lo_th,
        |         round(quantile_cont(value, 0.9), 4) AS hi_th
        |  FROM events GROUP BY 1
        |)
        |SELECT e.event_type, any_value(lo_th) AS lo_th, any_value(hi_th) AS hi_th,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(CASE WHEN value < lo_th OR value > hi_th THEN 1 END) AS BIGINT) AS n_clipped,
        |       round(avg(value), 4) AS mean_raw,
        |       round(avg(least(greatest(value, lo_th), hi_th)), 4) AS mean_wins
        |FROM events e JOIN th USING (event_type)
        |GROUP BY 1""".stripMargin,
    "q148_chunk" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents
        |),
        |s AS (
        |  SELECT doc_id, w, n, unnest(range(0, n, 40)) AS start FROM w
        |)
        |SELECT doc_id,
        |       CAST(start // 40 AS INT) AS chunk_idx,
        |       array_to_string(list_slice(w, start + 1, least(start + 50, n)), ' ')
        |         AS chunk_text,
        |       CAST(least(50, n - start) AS INT) AS n_tokens
        |FROM s""".stripMargin,
    "q149_ohlc" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS bar, value,
        |         epoch_us(ts) AS us, event_id
        |  FROM events
        |),
        |r AS (
        |  SELECT event_type, bar, value,
        |         row_number() OVER (PARTITION BY event_type, bar
        |           ORDER BY us, event_id) AS ra,
        |         row_number() OVER (PARTITION BY event_type, bar
        |           ORDER BY us DESC, event_id DESC) AS rd
        |  FROM e
        |)
        |SELECT event_type, CAST(bar AS BIGINT) AS bar,
        |       round(max(CASE WHEN ra = 1 THEN value END), 4) AS open,
        |       round(max(value), 4) AS high,
        |       round(min(value), 4) AS low,
        |       round(max(CASE WHEN rd = 1 THEN value END), 4) AS close,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM r GROUP BY 1, 2""".stripMargin,
    "q150_compaction" ->
      """WITH f AS (
        |  SELECT o_orderpriority AS part, o_custkey AS file,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS bytes
        |  FROM orders GROUP BY 1, 2
        |),
        |c AS (
        |  SELECT part, file, bytes,
        |         sum(bytes) OVER (PARTITION BY part ORDER BY bytes DESC, file
        |           ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM f
        |)
        |SELECT part, file, bytes, CAST((cum - bytes) // 2000000 AS BIGINT) AS grp
        |FROM c""".stripMargin,
    "q151_token_budget" ->
      """WITH s AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS quality,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |),
        |c AS (
        |  SELECT doc_id, quality, n_tokens,
        |         sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
        |           ROWS UNBOUNDED PRECEDING) AS cum_tokens
        |  FROM s
        |)
        |SELECT doc_id, quality, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM c WHERE cum_tokens <= 50000""".stripMargin,
    "q152_locf" ->
      """WITH series AS (
        |  SELECT l_returnflag AS datasourceId,
        |         CAST(year(l_shipdate) AS INT) AS year,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1, 2
        |),
        |l AS (
        |  SELECT *, lead(year) OVER (PARTITION BY datasourceId ORDER BY year) AS ny
        |  FROM series
        |),
        |d AS (
        |  SELECT datasourceId, year, n,
        |         unnest(range(year, coalesce(ny - 1, year) + 1)) AS yo
        |  FROM l
        |)
        |SELECT datasourceId, CAST(yo AS INT) AS year, n, (yo <> year) AS filled
        |FROM d""".stripMargin,
    "q145_pmi_collocations" ->
      """WITH wd AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |),
        |bg AS (
        |  SELECT w[i-1] AS p, w[i] AS c
        |  FROM (SELECT w, unnest(range(2, len(w) + 1)) AS i FROM wd)
        |),
        |pr AS (
        |  SELECT p, c, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM bg GROUP BY 1, 2 HAVING count(*) >= 5
        |),
        |uni AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS n_w
        |  FROM (SELECT unnest(w) AS word FROM wd) GROUP BY 1
        |),
        |tot AS (
        |  SELECT CAST(sum(len(w)) AS BIGINT) AS tw,
        |         CAST(sum(greatest(len(w) - 1, 0)) AS BIGINT) AS tp
        |  FROM wd
        |)
        |SELECT pr.p, pr.c, pr.n_ab,
        |       round(ln(CAST(pr.n_ab AS DOUBLE) * tot.tw * tot.tw
        |         / (CAST(tot.tp AS DOUBLE) * ua.n_w * ub.n_w)), 4) AS pmi
        |FROM pr
        |JOIN uni ua ON ua.word = pr.p
        |JOIN uni ub ON ub.word = pr.c
        |CROSS JOIN tot
        |ORDER BY pmi DESC, pr.p, pr.c
        |LIMIT 20""".stripMargin,
    "q144_kaplan_meier" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events
        |),
        |hz AS (SELECT max(us) AS hz FROM e),
        |u AS (
        |  SELECT user_id, min(us) AS t0,
        |         min(CASE WHEN event_type = 'purchase' THEN us END) AS tp
        |  FROM e GROUP BY 1
        |),
        |f AS (
        |  SELECT user_id, event_type AS cohort FROM (
        |    SELECT user_id, event_type,
        |           row_number() OVER (PARTITION BY user_id
        |             ORDER BY us, event_id) AS rk
        |    FROM e)
        |  WHERE rk = 1
        |),
        |s AS (
        |  SELECT f.cohort,
        |         CASE WHEN u.tp IS NOT NULL THEN 1 ELSE 0 END AS ev,
        |         (coalesce(u.tp, hz.hz) - u.t0) // 86400000000 AS duration
        |  FROM u JOIN f USING (user_id) CROSS JOIN hz
        |),
        |g AS (
        |  SELECT cohort, duration, CAST(sum(ev) AS BIGINT) AS d,
        |         CAST(sum(1 - ev) AS BIGINT) AS c
        |  FROM s GROUP BY 1, 2
        |),
        |w AS (
        |  SELECT *,
        |    CAST(sum(d + c) OVER (PARTITION BY cohort)
        |      - (sum(d + c) OVER (PARTITION BY cohort ORDER BY duration
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - (d + c))
        |      AS BIGINT) AS n_risk
        |  FROM g
        |),
        |z AS (
        |  SELECT *,
        |    min(n_risk - d) OVER (PARTITION BY cohort ORDER BY duration
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mz,
        |    sum(CASE WHEN d > 0 AND d < n_risk
        |          THEN ln(1 - CAST(d AS DOUBLE) / n_risk) ELSE 0 END)
        |      OVER (PARTITION BY cohort ORDER BY duration
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sl
        |  FROM w
        |)
        |SELECT cohort, duration, n_risk, d, c,
        |       round(CASE WHEN mz = 0 THEN 0.0 ELSE exp(sl) END, 4) AS surv
        |FROM z""".stripMargin,
    "q143_hist_rollup" ->
      """WITH b AS (
        |  SELECT source,
        |         least(greatest(CAST(floor(CAST(n_chars AS DOUBLE) / 32) AS BIGINT), 0), 31) AS bin
        |  FROM documents
        |),
        |ng AS (
        |  SELECT source, CAST(count(DISTINCT lang) AS BIGINT) AS n_groups
        |  FROM documents GROUP BY 1
        |),
        |c AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
        |w AS (
        |  SELECT *, CAST(sum(cnt) OVER (PARTITION BY source ORDER BY bin) AS BIGINT) AS cum,
        |         CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM c
        |),
        |p AS (SELECT unnest([0.5, 0.9]) AS p)
        |SELECT w.source, ng.n_groups, p.p,
        |       round((w.bin + (p.p * w.n - (w.cum - w.cnt)) / w.cnt) * 32.0, 4) AS qest
        |FROM w CROSS JOIN p JOIN ng ON ng.source = w.source
        |WHERE w.cum >= p.p * w.n AND (w.cum - w.cnt) < p.p * w.n""".stripMargin,
    "q142_lexical_cosine" ->
      s"""WITH $ShinglesSql,
         |wd AS (SELECT id, unnest(sh) AS word FROM shingled),
         |tf AS (SELECT id, word, CAST(count(*) AS BIGINT) AS tf FROM wd GROUP BY 1, 2),
         |nrm AS (SELECT id, sum(tf*tf) AS n2 FROM tf GROUP BY 1),
         |dfc AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
         |inv AS (
         |  SELECT tf.id, tf.word, tf.tf FROM tf JOIN dfc USING (word)
         |  WHERE df > 1 AND df <= 100
         |),
         |p AS (
         |  SELECT a.id AS idA, b.id AS idB, sum(a.tf * b.tf) AS dot
         |  FROM inv a JOIN inv b ON a.word = b.word AND a.id < b.id
         |  GROUP BY 1, 2
         |),
        |c AS (
        |  SELECT idA, idB, CAST(dot AS BIGINT) AS dot,
        |         round(CAST(dot AS DOUBLE) /
        |           sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 4) AS cos
        |  FROM p JOIN nrm na ON na.id = p.idA JOIN nrm nb ON nb.id = p.idB
        |)
        |SELECT idA, idB, dot, cos FROM c WHERE cos >= 0.8""".stripMargin,
    "q141_bigram_lm" ->
      """WITH wd AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |),
        |bg AS (
        |  SELECT doc_id, w[i-1] AS p, w[i] AS c
        |  FROM (SELECT doc_id, w, unnest(range(2, len(w) + 1)) AS i FROM wd)
        |),
        |tf AS (SELECT doc_id, p, c, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
        |pc AS (SELECT p, c, sum(tf) AS pc FROM tf GROUP BY 1, 2),
        |ctx AS (SELECT p, sum(pc) AS ctx FROM pc GROUP BY 1),
        |v AS (
        |  SELECT count(DISTINCT word) AS v
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |)
        |SELECT t.doc_id, CAST(sum(t.tf) AS BIGINT) AS n_pairs,
        |       round(-sum(t.tf * ln(CAST(pc.pc + 1 AS DOUBLE)
        |                / CAST(ctx.ctx + v.v AS DOUBLE))) / sum(t.tf), 4)
        |         AS nll
        |FROM tf t
        |JOIN pc USING (p, c) JOIN ctx USING (p) CROSS JOIN v
        |GROUP BY 1""".stripMargin,
    "q140_autocorr" ->
      s"""WITH $EvSql,
         |s AS (
         |  SELECT datasourceId, year, CAST(count(*) AS BIGINT) AS n
         |  FROM ev GROUP BY 1, 2
         |),
         |p AS (
         |  SELECT a.datasourceId, k.k AS lag, a.n AS x, b.n AS y
         |  FROM s a
         |  CROSS JOIN (SELECT CAST(unnest(range(1, 4)) AS INT) AS k) k
         |  JOIN s b ON b.datasourceId = a.datasourceId
         |          AND b.year = a.year - k.k
         |),
         |m AS (
         |  SELECT datasourceId, lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         |         sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
         |  FROM p GROUP BY 1, 2
         |)
         |SELECT datasourceId, lag, CAST(n AS BIGINT) AS n_pairs,
         |       CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
         |            THEN round(CAST(n*sxy - sx*sy AS DOUBLE) /
         |              sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
         |                 * CAST(n*syy - sy*sy AS DOUBLE)), 4)
         |       END AS acf
         |FROM m""".stripMargin,
    "q139_cusum" ->
      """WITH s AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |),
        |t AS (
        |  SELECT *, CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tt,
        |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS d
        |  FROM s
        |),
        |r AS (
        |  SELECT *, CAST(sum(n * d - tt) OVER (PARTITION BY event_type
        |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS ss
        |  FROM t
        |),
        |m AS (
        |  SELECT *, ss - least(CAST(0 AS BIGINT), CAST(min(ss) OVER (
        |    PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT))
        |    AS drift
        |  FROM r
        |)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n, drift,
        |       drift * 10 > tt * d AS flag
        |FROM m""".stripMargin,
    "q138_bitmap_rollup" ->
      """SELECT event_type,
        |       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS u_exact
        |FROM events GROUP BY 1""".stripMargin,
    "q137_cms_rollup" ->
      s"""WITH wd AS (
         |  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
         |),
         |top AS (
         |  SELECT word FROM (
         |    SELECT word, count(*) AS n FROM wd GROUP BY word
         |    ORDER BY n DESC, word LIMIT 5)
         |),
         |ng AS (
         |  SELECT source, CAST(count(DISTINCT lang) AS BIGINT) AS n_groups
         |  FROM documents GROUP BY 1
         |),
         |rows_i AS (SELECT unnest(range(0, 4)) AS ci),
         |bk AS (
         |  SELECT source, ci, ${HexValSql("md5(ci || ':' || word)", 1, 6)} % 1024 AS b,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM wd CROSS JOIN rows_i GROUP BY 1, 2, 3
         |),
         |tb AS (
         |  SELECT word, ci, ${HexValSql("md5(ci || ':' || word)", 1, 6)} % 1024 AS b
         |  FROM top CROSS JOIN rows_i
         |)
         |SELECT ng.source, ng.n_groups, tb.word,
         |       min(coalesce(bk.n, CAST(0 AS BIGINT))) AS cms_n
         |FROM ng CROSS JOIN tb
         |LEFT JOIN bk ON bk.source = ng.source AND bk.ci = tb.ci AND bk.b = tb.b
         |GROUP BY 1, 2, 3""".stripMargin,
    "q135_hll_rollup" ->
      s"""WITH ${HllChainSql("hs", "doc_id", "source", "source", "documents")},
         |g AS (
         |  SELECT source, CAST(count(DISTINCT lang) AS BIGINT) AS n_groups
         |  FROM documents GROUP BY 1
         |)
         |SELECT g.source, g.n_groups, round(hs.est, 4) AS u_hll
         |FROM g JOIN hs_est hs USING (source)""".stripMargin,
    "q134_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,
    "q131_mode" ->
      """WITH c AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2
        |),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY n DESC, lang DESC) AS rk
        |  FROM c
        |)
        |SELECT source, lang AS mode_lang, n FROM r WHERE rk = 1""".stripMargin,
    "q132_dim_stats" ->
      s"""WITH $EmbSql,
         |e AS (SELECT unnest(q) AS v, unnest(range(0, 64)) AS pos FROM nrm),
         |a AS (
         |  SELECT CAST(pos AS INT) AS pos, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(v) AS BIGINT) AS s, CAST(sum(v*v) AS BIGINT) AS s2
         |  FROM e GROUP BY 1
         |)
         |SELECT pos, n, round(CAST(s AS DOUBLE) / n, 4) AS mean,
         |       round(sqrt((CAST(s2 AS DOUBLE)
         |         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)), 4)
         |         AS std
         |FROM a""".stripMargin,
    "q133_time_weighted" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS v_i
        |  FROM events
        |),
        |n AS (
        |  SELECT *, lead(us) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id) AS next_us
        |  FROM e
        |),
        |d AS (
        |  SELECT user_id, v_i, (next_us - us) // 1000000 AS dur_s
        |  FROM n WHERE next_us IS NOT NULL
        |),
        |a AS (
        |  SELECT user_id, CAST(sum(dur_s) AS BIGINT) AS total_s,
        |         CAST(sum(v_i * dur_s) AS BIGINT) AS ws
        |  FROM d GROUP BY 1
        |)
        |SELECT user_id, total_s,
        |       round(CAST(ws AS DOUBLE) / total_s / 100, 4) AS twa
        |FROM a WHERE total_s > 0""".stripMargin,
    "q130_skyline" ->
      """WITH pts AS (
        |  SELECT p_retailprice AS x, p_size AS y, CAST(count(*) AS BIGINT) AS n
        |  FROM part GROUP BY 1, 2
        |)
        |SELECT x, y, n FROM pts p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts q
        |  WHERE q.x <= p.x AND q.y <= p.y AND (q.x < p.x OR q.y < p.y)
        |)""".stripMargin,
    "q126_window_topk_rewrite" ->
      s"""WITH r AS (
         |  SELECT doc_id, source, lang, n_chars,
         |         row_number() OVER (PARTITION BY source ORDER BY
         |           ${HexValSql("md5(CAST(doc_id AS VARCHAR) || ':wtk')", 1, 13)},
         |           doc_id) AS rank
         |  FROM documents
         |)
         |SELECT doc_id, source, lang, n_chars, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= 3""".stripMargin,
    "q124_fuzzy_match" ->
      """SELECT a.c_custkey AS idA, b.c_custkey AS idB,
        |       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin,
    "q125_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_k,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(DISTINCT c_acctbal) AS BIGINT) AS l_div,
        |       count(*) >= 5 AS k_anonymous,
        |       count(DISTINCT c_acctbal) >= 3 AS l_diverse
        |FROM customer GROUP BY 1, 2, 3""".stripMargin,
    "q127_profile" ->
      """SELECT 'l_quantity' AS col,
        |       CAST(count(*) - count(l_quantity) AS BIGINT) AS n_null,
        |       CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
        |       round(CAST(min(l_quantity) AS DOUBLE), 4) AS min_v,
        |       round(CAST(max(l_quantity) AS DOUBLE), 4) AS max_v
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_extendedprice',
        |       CAST(count(*) - count(l_extendedprice) AS BIGINT),
        |       CAST(count(DISTINCT l_extendedprice) AS BIGINT),
        |       round(CAST(min(l_extendedprice) AS DOUBLE), 4),
        |       round(CAST(max(l_extendedprice) AS DOUBLE), 4)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_discount',
        |       CAST(count(*) - count(l_discount) AS BIGINT),
        |       CAST(count(DISTINCT l_discount) AS BIGINT),
        |       round(CAST(min(l_discount) AS DOUBLE), 4),
        |       round(CAST(max(l_discount) AS DOUBLE), 4)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_suppkey',
        |       CAST(count(*) - count(l_suppkey) AS BIGINT),
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT),
        |       round(CAST(min(l_suppkey) AS DOUBLE), 4),
        |       round(CAST(max(l_suppkey) AS DOUBLE), 4)
        |FROM lineitem""".stripMargin,
    // JL replay: the projection terms are GENERATED from the same
    // Scala sign matrix as the Column path — one source of truth
    "q122_jl_project" -> {
      val ts = SimilaritySearch.jlProjectSqlTerms(8)
      val pcols = (0 until 8).map(j => s"CAST(${ts(j)} AS BIGINT) AS p$j")
        .mkString(",\n|         ")
      val sp = (0 until 8).map(j => s"p$j*p$j").mkString(" + ")
      s"""WITH $EmbSql,
         |pj AS (
         |  SELECT vec_id, n,
         |         $pcols
         |  FROM nrm
         |)
         |SELECT vec_id, p0, p1, p2, p3, p4, p5, p6, p7,
         |       round(sqrt(CAST($sp AS DOUBLE) / 8) / n, 4) AS norm_ratio
         |FROM pj""".stripMargin
    },
    // prefix-filter replay: same rarity key (lpad(df)||':'||shingle),
    // same integer prefix length and threshold arithmetic
    "q121_ppjoin" ->
      s"""WITH $ShinglesSql,
         |dsh AS (SELECT id, unnest(list_distinct(sh)) AS s FROM shingled),
         |zs AS (SELECT id, count(*) AS sz FROM dsh GROUP BY 1),
         |dfx AS (SELECT s, count(*) AS df FROM dsh GROUP BY 1),
         |ky AS (
         |  SELECT d.id, z.sz,
         |         lpad(CAST(x.df AS VARCHAR), 10, '0') || ':' || d.s AS k
         |  FROM dsh d JOIN dfx x USING (s) JOIN zs z USING (id)
         |),
         |r AS (
         |  SELECT id, sz, k,
         |         row_number() OVER (PARTITION BY id ORDER BY k) AS rn
         |  FROM ky
         |),
         |pre AS (SELECT id, k FROM r WHERE rn <= sz - ((sz * 1 + 2) // 3) + 1),
         |cand AS (
         |  SELECT DISTINCT a.id AS idA, b.id AS idB
         |  FROM pre a JOIN pre b ON a.k = b.k AND a.id < b.id
         |),
         |inter AS (
         |  SELECT c.idA, c.idB, count(*) AS common
         |  FROM cand c
         |  JOIN dsh x ON x.id = c.idA
         |  JOIN dsh y ON y.id = c.idB AND y.s = x.s
         |  GROUP BY 1, 2
         |)
         |SELECT i.idA, i.idB,
         |       round(CAST(common AS DOUBLE) / (za.sz + zb.sz - common), 4)
         |         AS jaccard
         |FROM inter i
         |JOIN zs za ON za.id = i.idA
         |JOIN zs zb ON zb.id = i.idB
         |WHERE common * 2 >= (za.sz + zb.sz - common) * 1""".stripMargin,
    "q120_ewma" ->
      s"""WITH $OverallSql,
         |s AS (
         |  SELECT diseaseId, targetId, year, coalesce(score, 0) AS s0 FROM overall
         |  WHERE year <> 2002 -- the undated surrogate (NULL on the engine side)
         |),
         |r AS (
         |  SELECT diseaseId, targetId, year, s0,
         |         row_number() OVER (PARTITION BY diseaseId, targetId
         |           ORDER BY year) AS rn
         |  FROM s
         |),
         |g AS (
         |  SELECT diseaseId, targetId, year, s0, rn,
         |         CASE WHEN rn = 1 THEN s0 * 2.0
         |              ELSE s0 * pow(2.0, rn - 1) END AS gg
         |  FROM r
         |)
         |SELECT diseaseId, targetId, year, round(s0, 4) AS score,
         |       round(sum(gg) OVER (PARTITION BY diseaseId, targetId
         |           ORDER BY year ROWS UNBOUNDED PRECEDING)
         |         / pow(2.0, rn), 4) AS ewma
         |FROM g""".stripMargin,
    "q119_interpolate" ->
      """WITH s AS (
        |  SELECT l_partkey, l_suppkey, CAST(year(l_shipdate) AS BIGINT) AS y,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
        |  FROM lineitem GROUP BY 1, 2, 3
        |),
        |n AS (
        |  SELECT *,
        |    lead(y) OVER (PARTITION BY l_partkey, l_suppkey ORDER BY y) AS ny,
        |    lead(v) OVER (PARTITION BY l_partkey, l_suppkey ORDER BY y) AS nv
        |  FROM s
        |),
        |x AS (
        |  SELECT l_partkey, l_suppkey, y, v, ny, nv,
        |         unnest(range(y, CASE WHEN ny IS NULL THEN y + 1 ELSE ny END)) AS yo
        |  FROM n
        |)
        |SELECT l_partkey, l_suppkey, CAST(yo AS BIGINT) AS year,
        |       round(CASE WHEN yo = y THEN CAST(v AS DOUBLE)
        |             ELSE CAST(v AS DOUBLE) + CAST(nv - v AS DOUBLE)
        |               * (CAST(yo - y AS DOUBLE) / CAST(ny - y AS DOUBLE))
        |             END, 4) AS v,
        |       yo <> y AS interpolated
        |FROM x""".stripMargin,
    // dHash replay: same (3k+c) mod n channel synthesis as q68, 9×8
    // nearest-neighbor grid, integer grayscale, bit = right-neighbor
    // brighter; halves as exact power-of-two sums
    "q115_image_dhash" ->
      s"""WITH $DhashBitsSql
         |SELECT dhash_hi, dhash_lo, CAST(count(*) AS BIGINT) AS n_docs,
        |       min(doc_id) AS min_doc
        |FROM bits GROUP BY 1, 2""".stripMargin,
    // windowed energy replay: q67's sample synthesis, 50-sample
    // tumbling windows, exact integer Σs² then one sqrt
    "q116_audio_energy" ->
      """WITH b AS (
        |  SELECT doc_id, text, CAST(CASE WHEN length(text) = 0 THEN 1
        |    ELSE length(text) END AS INT) AS n FROM documents
        |),
        |sm AS (SELECT doc_id, text, n, unnest(range(0, 200)) AS i FROM b),
        |v AS (
        |  SELECT doc_id, i,
        |         ascii(substring(text, CAST((2*i) % n AS INT) + 1, 1)) * 256
        |         + ascii(substring(text, CAST((2*i + 1) % n AS INT) + 1, 1))
        |         - 32768 AS s
        |  FROM sm
        |),
        |w AS (
        |  SELECT doc_id, CAST(i // 50 AS INT) AS win_idx,
        |         CAST(sum(s * s) AS BIGINT) AS energy
        |  FROM v GROUP BY 1, 2
        |)
        |SELECT doc_id, win_idx, energy,
        |       round(sqrt(CAST(energy AS DOUBLE) / 50), 4) AS rms
        |FROM w""".stripMargin,
    // the delta path must equal this full recompute — that identity
    // IS the operator contract
    "q114_delta_join" ->
      """WITH l AS (
        |  SELECT l_orderkey AS o_orderkey,
        |         CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS rev_i
        |  FROM lineitem
        |)
        |SELECT o.o_custkey, CAST(count(*) AS BIGINT) AS n,
        |       round(CAST(sum(l.rev_i) AS DOUBLE) / 10000.0, 4) AS revenue,
        |       round(CAST(min(l.rev_i) AS DOUBLE) / 10000.0, 4) AS min_rev,
        |       round(CAST(max(l.rev_i) AS DOUBLE) / 10000.0, 4) AS max_rev
        |FROM orders o JOIN l USING (o_orderkey)
        |GROUP BY 1""".stripMargin,
    "q112_interval_merge" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS start_us,
        |         epoch_us(ts) + CAST(floor(value * 60000000) AS BIGINT) AS end_us
        |  FROM events
        |),
        |w AS (
        |  SELECT user_id, event_id, start_us, end_us,
        |         max(end_us) OVER (PARTITION BY user_id
        |           ORDER BY start_us, end_us, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM iv
        |),
        |f AS (
        |  SELECT user_id, start_us, end_us,
        |         CAST(sum(CASE WHEN pm IS NULL OR start_us > pm THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id
        |             ORDER BY start_us, end_us, event_id
        |             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
        |  FROM w
        |)
        |SELECT user_id, island, min(start_us) AS start_us,
        |       max(end_us) AS end_us, CAST(count(*) AS BIGINT) AS n_intervals
        |FROM f GROUP BY 1, 2""".stripMargin,
    "q118_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
        |),
        |c AS (
        |  SELECT user_id, event_id, event_type, us,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY us, event_id) AS prev
        |  FROM e
        |),
        |r AS (
        |  SELECT user_id, event_type, us,
        |         CAST(sum(CASE WHEN prev IS NULL OR prev <> event_type
        |             THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY us, event_id
        |             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
        |  FROM c
        |),
        |g AS (
        |  SELECT user_id, version, min(event_type) AS value,
        |         min(us) AS valid_from_us
        |  FROM r GROUP BY 1, 2
        |)
        |SELECT user_id, version, value, valid_from_us,
        |       lead(valid_from_us) OVER (PARTITION BY user_id
        |         ORDER BY version) AS valid_to_us,
        |       lead(valid_from_us) OVER (PARTITION BY user_id
        |         ORDER BY version) IS NULL AS is_current
        |FROM g""".stripMargin,
    // Z-order oracle: the interleave arithmetic is GENERATED from the
    // same Scala loop as the Column path (Layout.zValueSql), so the
    // two engines cannot drift; cell = top cellBits of the z-value.
    "q110_zorder" ->
      s"""WITH z AS (
         |  SELECT CAST(l_quantity AS BIGINT) AS x,
         |         CAST(dayofyear(l_shipdate) AS BIGINT) AS y
         |  FROM lineitem
         |),
         |c AS (SELECT x, y, (${Layout.zValueSql("x", "y", 9)}) >> 14 AS cell FROM z),
         |s AS (
         |  SELECT cell, CAST(count(*) AS BIGINT) AS n,
         |         min(x) AS min_x, max(x) AS max_x,
         |         min(y) AS min_y, max(y) AS max_y
         |  FROM c GROUP BY 1
         |)
         |SELECT cell, n, min_x, max_x, min_y, max_y,
         |       NOT (max_x < 10 OR min_x > 30 OR max_y < 90 OR min_y > 180) AS hit
         |FROM s""".stripMargin,
    "q106_stratum_cap" ->
      s"""WITH r AS (
         |  SELECT source, doc_id,
         |         row_number() OVER (PARTITION BY source ORDER BY
         |           ${HexValSql("md5(CAST(doc_id AS VARCHAR) || ':cap')", 1, 13)},
         |           doc_id) AS rk
         |  FROM documents
         |)
         |SELECT source, doc_id FROM r WHERE rk <= 10""".stripMargin,
    "q107_windowed_hll" ->
      s"""WITH ${HllChainSql("hw", "user_id",
            "CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 3600000000) AS BIGINT)", "hour")},
         |ex AS (
         |  SELECT CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 3600000000) AS BIGINT) AS hour,
         |         CAST(count(DISTINCT user_id) AS BIGINT) AS u_exact
         |  FROM events GROUP BY 1
         |)
         |SELECT ex.hour, ex.u_exact, round(hw.est, 4) AS u_hll
         |FROM ex JOIN hw_est hw USING (hour)""".stripMargin,
    // SemDeDup replay: q45's LSH-bucketed cosine pairs, recursive
    // connected components (q47's walk), keeper = min id, singletons
    // keep themselves.
    "q99_semdedup" ->
      s"""WITH RECURSIVE $EmbSql,
         |$LshSql,
         |bsz AS (SELECT bucket, count(*) AS bn FROM withb GROUP BY 1),
         |ok AS (
         |  SELECT w.* FROM withb w JOIN bsz USING (bucket)
         |  WHERE bn > 1 AND bn <= ${graft.GraftConf.LshBucketCap}
         |),
         |prs AS (
         |  SELECT a.vec_id AS idA, b.vec_id AS idB
         |  FROM ok a JOIN ok b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE CAST(list_sum(list_transform(range(1, 65), i -> a.q[i] * b.q[i])) AS DOUBLE)
         |        / (a.n * b.n) >= 0.35
         |),
         |edges AS (
         |  SELECT idA AS src, idB AS dst FROM prs
         |  UNION ALL
         |  SELECT idB AS src, idA AS dst FROM prs
         |),
         |walk(id, comp) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.src, w.comp FROM edges e JOIN walk w ON e.dst = w.id
         |),
         |comp AS (SELECT id, min(comp) AS comp FROM walk GROUP BY id)
         |SELECT e.vec_id,
         |       coalesce(c.comp, e.vec_id) AS keeper,
         |       coalesce(c.comp, e.vec_id) = e.vec_id AS kept
         |FROM embeddings e LEFT JOIN comp c ON c.id = e.vec_id""".stripMargin,
    // Epoch-mix replay: identical source-hash targets, identical
    // md5-uniform fractional top-up, identical copy expansion.
    "q100_epoch_mix" ->
      s"""WITH tg AS (
         |  SELECT source,
         |         0.5 + CAST(${HexBucketSql("md5(source || ':ep')")} % 30 AS DOUBLE) / 10.0 AS epochs
         |  FROM (SELECT DISTINCT source FROM documents)
         |),
         |d AS (
         |  SELECT doc_id, source, epochs,
         |         CAST(${HexValSql("md5(CAST(doc_id AS VARCHAR) || ':epoch')", 1, 13)} AS DOUBLE)
         |           / CAST(pow(2, 52) AS DOUBLE) AS u
         |  FROM documents JOIN tg USING (source)
         |),
         |n AS (
         |  SELECT doc_id, source, epochs,
         |         CAST(floor(epochs) +
         |           CASE WHEN u < epochs - floor(epochs) THEN 1 ELSE 0 END AS BIGINT) AS n_copies
         |  FROM d
         |)
         |SELECT doc_id, source, epochs, n_copies,
         |       unnest(range(0, n_copies)) AS epoch
         |FROM n WHERE n_copies > 0""".stripMargin,
    // BPE-pair replay: same vocabulary-weighted adjacent-pair counts
    // (substring(word, i, 2) for i in 1..len-1), top-20 by (n, pair).
    "q98_bpe_pairs" ->
      """WITH wf AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS wf
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE length(word) >= 2 GROUP BY 1
        |),
        |pairs AS (
        |  SELECT unnest(list_transform(range(1, length(word)),
        |           i -> substring(word, CAST(i AS INT), 2))) AS pair, wf
        |  FROM wf
        |)
        |SELECT pair, CAST(sum(wf) AS BIGINT) AS n
        |FROM pairs GROUP BY 1 ORDER BY n DESC, pair LIMIT 20""".stripMargin,
    // Retention replay: identical fixed-width epoch periods (7-day
    // buckets of epoch_us — no calendar weeks), min-period cohorts,
    // distinct-user rollup per (cohort, offset).
    "q97_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id,
        |         CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 604800000000.0) AS BIGINT) AS period
        |  FROM events
        |),
        |coh AS (SELECT user_id, min(period) AS cohort_period FROM act GROUP BY 1),
        |sz AS (
        |  SELECT cohort_period, CAST(count(DISTINCT user_id) AS BIGINT) AS n_cohort
        |  FROM coh GROUP BY 1
        |),
        |ret AS (
        |  SELECT c.cohort_period, a.period - c.cohort_period AS offset,
        |         CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
        |  FROM act a JOIN coh c USING (user_id)
        |  GROUP BY 1, 2
        |)
        |SELECT r.cohort_period, r.offset, r.n_active, s.n_cohort,
        |       round(CAST(r.n_active AS DOUBLE) / s.n_cohort, 4) AS rate
        |FROM ret r JOIN sz s USING (cohort_period)""".stripMargin,
    // Funnel replay: the same sequential-min chain as CTEs — step i's
    // completion is the min event time of its type at-or-after step
    // i−1's completion; users without a step-1 event score 0.
    "q95_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events
        |),
        |s1 AS (
        |  SELECT user_id, min(us) AS t1 FROM ev
        |  WHERE event_type = 'view' GROUP BY 1
        |),
        |s2 AS (
        |  SELECT e.user_id, min(e.us) AS t2
        |  FROM ev e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.us >= s1.t1 GROUP BY 1
        |),
        |s3 AS (
        |  SELECT e.user_id, min(e.us) AS t3
        |  FROM ev e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.us >= s2.t2 GROUP BY 1
        |),
        |u AS (SELECT DISTINCT user_id FROM ev)
        |SELECT u.user_id,
        |       CAST(CAST(t1 IS NOT NULL AS INT) + CAST(t2 IS NOT NULL AS INT)
        |            + CAST(t3 IS NOT NULL AS INT) AS INT) AS steps_completed,
        |       t1 AS t_first_us, t3 AS t_conv_us
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |       LEFT JOIN s3 USING (user_id)""".stripMargin,
    // Histogram-quantile replay: same fixed-width binning (width
    // 400/1024 = 0.390625, exactly representable), same cumulative
    // crossing rule and in-bin interpolation over integer counts.
    "q94_hist_quantiles" ->
      """WITH b AS (
        |  SELECT event_type,
        |         least(greatest(CAST(floor(value / (400.0 / 1024)) AS BIGINT), 0), 1023) AS bin
        |  FROM events
        |),
        |c AS (SELECT event_type, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
        |cc AS (
        |  SELECT event_type, bin, cnt,
        |         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        |         sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM c
        |),
        |ps AS (SELECT unnest([0.5, 0.9, 0.99]) AS p),
        |j AS (SELECT cc.*, ps.p, ps.p * cc.n AS t FROM cc CROSS JOIN ps)
        |SELECT event_type, p,
        |       round((bin + (t - (cum - cnt)) / cnt) * (400.0 / 1024), 4) AS qest
        |FROM j WHERE cum >= t AND (cum - cnt) < t""".stripMargin,
    // Bloom semi-join oracle: the plain semi-join — the bloom is a
    // pre-filter with no false negatives, and the exact join removes
    // its false positives, so results must be identical.
    "q92_bloom_join" ->
      """SELECT l_returnflag,
        |       CAST(count(*) AS BIGINT) AS n,
        |       round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag""".stripMargin,
    // CMS replay: rebuild the 4x1024 counter matrix from the same
    // md5-bucket arithmetic (row i's bucket = first 6 hex nibbles of
    // md5(i ':' word) mod 1024), then min over rows at each top
    // word's buckets — identical counters, identical estimates.
    "q91_cms_topk" ->
      s"""WITH wd AS (
         |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
         |),
         |ex AS (SELECT word, CAST(count(*) AS BIGINT) AS exact_n FROM wd GROUP BY word),
         |top AS (SELECT word, exact_n FROM ex ORDER BY exact_n DESC, word LIMIT 20),
         |rows_i AS (SELECT unnest(range(0, 4)) AS ci),
         |bk AS (
         |  SELECT ci, ${HexValSql("md5(ci || ':' || word)", 1, 6)} % 1024 AS b,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM wd CROSS JOIN rows_i GROUP BY 1, 2
         |),
         |tb AS (
         |  SELECT word, ci, ${HexValSql("md5(ci || ':' || word)", 1, 6)} % 1024 AS b
         |  FROM top CROSS JOIN rows_i
         |)
         |SELECT t.word, t.exact_n, min(bk.n) AS cms_n
         |FROM top t JOIN tb ON t.word = tb.word
         |           JOIN bk ON tb.ci = bk.ci AND tb.b = bk.b
         |GROUP BY t.word, t.exact_n""".stripMargin,
    "q58_curation" ->
      s"""WITH $GopherDocSql,
         |pass AS (
         |  SELECT doc_id, text, lang, n FROM d
         |  WHERE ${gopherPassPred(1)}
         |),
         |ded AS (
         |  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
         |  FROM pass
         |),
         |k AS (
         |  SELECT doc_id, lang, n,
         |         ${HexBucketSql("md5(CAST(doc_id AS VARCHAR) || ':split')")} AS bucket
         |  FROM ded WHERE rk = 1
         |)
         |SELECT CASE WHEN bucket < 80 THEN 'train'
         |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
         |       lang, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n) AS BIGINT) AS n_words
         |FROM k GROUP BY 1, 2""".stripMargin,
    "q59_unigram_lm" ->
      """WITH tf AS (
        |  SELECT doc_id, word, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY 1, 2
        |),
        |cf AS (SELECT word, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(sum(cf) AS BIGINT) AS t FROM cf)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_words,
        |       round(-sum(tf * ln(CAST(cf AS DOUBLE) / CAST(t AS DOUBLE)))
        |             / CAST(sum(tf) AS DOUBLE), 4) AS nll
        |FROM tf JOIN cf USING (word) CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin,
    "q70_snapshot_diff" ->
      s"""WITH b AS (
         |  SELECT doc_id, text, source,
         |         ${HexBucketSql("md5(CAST(doc_id AS VARCHAR) || ':snap')")} AS bucket
         |  FROM documents
         |),
         |o AS (SELECT doc_id, md5(text) AS h, source FROM b WHERE bucket < 90),
         |nn AS (
         |  SELECT doc_id,
         |         md5(CASE WHEN bucket % 7 = 0 THEN text || ' rev2' ELSE text END) AS h,
         |         source
         |  FROM b WHERE bucket >= 5
         |),
         |d AS (
         |  SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
         |              WHEN nn.doc_id IS NULL THEN 'removed'
         |              WHEN o.h = nn.h THEN 'unchanged'
         |              ELSE 'changed' END AS change,
         |         coalesce(nn.source, o.source) AS source
         |  FROM o FULL JOIN nn ON o.doc_id = nn.doc_id
         |)
         |SELECT change, source, CAST(count(*) AS BIGINT) AS n_docs
         |FROM d GROUP BY 1, 2""".stripMargin,
    "q71_centroid_classify" ->
      s"""WITH $EmbSql,
         |tr AS (
         |  SELECT e.label, n.q FROM nrm n JOIN embeddings e ON n.vec_id = e.vec_id
         |  WHERE n.vec_id % 5 != 0
         |),
         |sums AS (
         |  SELECT label, i AS pos, CAST(sum(q[i]) AS BIGINT) AS s
         |  FROM tr CROSS JOIN (SELECT unnest(range(1, 65)) AS i) dims
         |  GROUP BY 1, 2
         |),
         |cents AS (
         |  SELECT pred, cv,
         |         sqrt(CAST(list_sum(list_transform(cv, x -> x * x)) AS DOUBLE)) AS cn
         |  FROM (SELECT label AS pred, list(s ORDER BY pos) AS cv FROM sums GROUP BY label)
         |),
         |te AS (
         |  SELECT n.vec_id, e.label, n.q, n.n
         |  FROM nrm n JOIN embeddings e ON n.vec_id = e.vec_id
         |  WHERE n.vec_id % 5 = 0
         |),
         |scored AS (
         |  SELECT te.vec_id, te.label, c.pred,
         |         CAST(list_sum(list_transform(range(1, 65), i -> te.q[i] * c.cv[i])) AS DOUBLE)
         |           / (te.n * c.cn) AS cos
         |  FROM te CROSS JOIN cents c
         |),
         |best AS (
         |  SELECT vec_id, label, pred, cos,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, pred) AS r
         |  FROM scored
         |)
         |SELECT vec_id, label, pred, round(cos, 4) AS cos FROM best WHERE r = 1""".stripMargin,
    // Streaming replays: the oracle computes the batch result PLUS the
    // append-mode finalization cut (window/session end ≤ max event
    // time − watermark delay) — the emitted set is exactly that,
    // independent of how the file source micro-batched the input.
    "q74_weighted_sample" ->
      s"""WITH w AS (
         |  SELECT source,
         |         CAST(${HexBucketSql("md5(source || ':w')")} % 9 + 1 AS DOUBLE)
         |           / CAST(10 AS DOUBLE) AS weight
         |  FROM (SELECT DISTINCT source FROM documents)
         |),
         |pri AS (
         |  SELECT d.doc_id, d.source,
         |         ln(CAST(${HexValSql("md5(CAST(d.doc_id AS VARCHAR) || ':ws')", 1, 13)} + 1 AS DOUBLE)
         |            / CAST(pow(2, 52) AS DOUBLE)) / w.weight AS priority
         |  FROM documents d JOIN w USING (source)
         |)
         |SELECT doc_id, source, round(priority, 4) AS priority
         |FROM pri ORDER BY priority DESC, doc_id LIMIT 200""".stripMargin,
    "q73_hll_distinct" ->
      s"""WITH ${HllChainSql("hu", "user_id")},
         |${HllChainSql("he", "event_id")},
         |ex AS (
         |  SELECT event_type,
         |         CAST(count(DISTINCT user_id) AS BIGINT) AS u_exact,
         |         CAST(count(DISTINCT event_id) AS BIGINT) AS e_exact
         |  FROM events GROUP BY 1
         |)
         |SELECT ex.event_type, ex.u_exact, round(hu.est, 4) AS u_hll,
         |       ex.e_exact, round(he.est, 4) AS e_hll
         |FROM ex
         |JOIN hu_est hu USING (event_type)
         |JOIN he_est he USING (event_type)""".stripMargin,
    "q72_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, word, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY 1, 2
        |),
        |dfreq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, word,
        |         tf * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS tfidf
        |  FROM tf JOIN dfreq USING (word) CROSS JOIN nd
        |),
        |rk AS (
        |  SELECT doc_id, word,
        |         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS INT) AS rank,
        |         tfidf
        |  FROM scored
        |)
        |SELECT doc_id, word, rank, round(tfidf, 4) AS tfidf FROM rk WHERE rank <= 3""".stripMargin,
    "q64_stream_enrich" ->
      s"""WITH ev AS (SELECT event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
         |dim AS (
         |  SELECT event_type,
         |         CAST(${HexBucketSql("md5(event_type || ':w')")} % 9 + 1 AS DOUBLE)
         |           / CAST(10 AS DOUBLE) AS weight
         |  FROM (SELECT DISTINCT event_type FROM events)
         |),
         |mx AS (SELECT max(ts) AS mt FROM ev),
         |w AS (
         |  SELECT date_trunc('hour', ts) AS ws, ev.event_type,
         |         CAST(count(*) AS BIGINT) AS n, round(sum(value * weight), 4) AS wsum
         |  FROM ev JOIN dim USING (event_type) GROUP BY 1, 2
         |)
         |SELECT strftime(w.ws, '%Y-%m-%d %H:%M:%S') AS window_start,
         |       w.event_type, w.n, w.wsum
         |FROM w, mx WHERE w.ws + INTERVAL 1 HOUR <= mx.mt - INTERVAL 2 HOUR""".stripMargin,
    "q60_stream_tumbling" ->
      """WITH ev AS (SELECT event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |mx AS (SELECT max(ts) AS mt FROM ev),
        |w AS (
        |  SELECT date_trunc('hour', ts) AS ws, event_type,
        |         CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
        |  FROM ev GROUP BY 1, 2
        |)
        |SELECT strftime(w.ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |       w.event_type, w.n, w.sum_value
        |FROM w, mx WHERE w.ws + INTERVAL 1 HOUR <= mx.mt - INTERVAL 2 HOUR""".stripMargin,
    // Streaming-HLL oracle: the same per-window register replay as
    // q107, finalized-window filter as q60.
    "q109_stream_hll" ->
      s"""WITH ${HllChainSql("hw", "user_id",
            "date_trunc('hour', CAST(ts AS TIMESTAMP))", "ws")},
         |mx AS (SELECT max(CAST(ts AS TIMESTAMP)) AS mt FROM events),
         |b AS (
         |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1
         |)
         |SELECT strftime(b.ws, '%Y-%m-%d %H:%M:%S') AS window_start,
         |       b.n, round(h.est, 4) AS u_hll
         |FROM b JOIN hw_est h USING (ws), mx
         |WHERE b.ws + INTERVAL 1 HOUR <= mx.mt - INTERVAL 2 HOUR""".stripMargin,
    // dynamic-gap replay: interval merge with running max end (an
    // early long-gap event can outlast the last event's window)
    "q128_stream_dynamic_sessions" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS s_us,
        |         epoch_us(CAST(ts AS TIMESTAMP)) +
        |           CASE WHEN event_type = 'purchase' THEN 3600000000
        |                ELSE 1200000000 END AS e_us
        |  FROM events
        |),
        |mx AS (SELECT max(ts) AS mt FROM ev),
        |w AS (
        |  SELECT *, max(e_us) OVER (PARTITION BY user_id
        |    ORDER BY s_us, e_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM ev
        |),
        |f AS (
        |  SELECT *, CAST(sum(CASE WHEN pm IS NULL OR s_us >= pm THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY s_us, e_us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |  FROM w
        |),
        |agg AS (
        |  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events,
        |         min(s_us) AS start_us, max(e_us) AS end_us
        |  FROM f GROUP BY 1, 2
        |)
        |SELECT a.user_id, a.n_events, a.start_us, a.end_us
        |FROM agg a, mx
        |WHERE a.end_us <= epoch_us(mt - INTERVAL 2 HOUR)""".stripMargin,
    "q61_stream_sessions" ->
      """WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |mx AS (SELECT max(ts) AS mt FROM ev),
        |gapped AS (
        |  SELECT *, epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM ev
        |),
        |flagged AS (
        |  SELECT *, CASE WHEN gap_us IS NULL OR gap_us >= 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM gapped
        |),
        |sess AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged
        |),
        |agg AS (
        |  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events,
        |         min(ts) AS start_ts, max(ts) + INTERVAL 30 MINUTE AS end_ts
        |  FROM sess GROUP BY 1, 2
        |)
        |SELECT a.user_id, a.n_events,
        |       CAST(epoch_us(a.start_ts) AS BIGINT) AS start_us,
        |       CAST(epoch_us(a.end_ts) AS BIGINT) AS end_us
        |FROM agg a, mx WHERE a.end_ts <= mx.mt - INTERVAL 2 HOUR""".stripMargin,
    "q62_stream_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    // the split-invariant H7 slice: max emitted peak = final cumulative
    // harmonic; emitting keys = {harmonic > 0} (filter on the UNROUNDED
    // harmonic, exactly the score > 0 emission condition)
    "q170_stream_peaks" ->
      s"""WITH $EvSql,
         |ranked AS (
         |  SELECT diseaseId, targetId, datasourceId, score,
         |         row_number() OVER (
         |           PARTITION BY diseaseId, targetId, datasourceId
         |           ORDER BY score DESC) AS rn
         |  FROM ev
         |),
         |h AS (
         |  SELECT diseaseId, targetId, datasourceId,
         |         sum(CASE WHEN rn <= 50 THEN score / (rn * rn) END)
         |           / 1.6449340668482264 AS hs
         |  FROM ranked GROUP BY 1, 2, 3
         |)
         |SELECT diseaseId, targetId, datasourceId, round(hs, 4) AS peak_score
         |FROM h WHERE hs > 0""".stripMargin,
    "q63_stream_assoc" ->
      s"""WITH $EvSql,
         |ranked AS (
         |  SELECT diseaseId, targetId, datasourceId, score,
         |         row_number() OVER (
         |           PARTITION BY diseaseId, targetId, datasourceId
         |           ORDER BY score DESC) AS rn,
         |         CAST(count(*) OVER (
         |           PARTITION BY diseaseId, targetId, datasourceId) AS BIGINT) AS n
         |  FROM ev
         |)
         |SELECT diseaseId, targetId, datasourceId, n AS n_evidence,
         |       round(sum(CASE WHEN rn <= 50 THEN score / (rn * rn) END)
         |             / 1.6449340668482264, 4) AS score
         |FROM ranked GROUP BY 1, 2, 3, n""".stripMargin,
    "q123_stream_ivm" ->
      """WITH e AS (
        |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v FROM events
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |       round(CAST(sum(v) AS DOUBLE) / 100, 4) AS sum_v,
        |       round(CAST(min(v) AS DOUBLE) / 100, 4) AS min_v,
        |       round(CAST(max(v) AS DOUBLE) / 100, 4) AS max_v
        |FROM e GROUP BY 1""".stripMargin,
    "q117_stream_outer" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events
        |),
        |cut AS (
        |  SELECT min(m) - 7200000000 AS c FROM (
        |    SELECT event_type, max(epoch_us(ts)) AS m FROM ev
        |    WHERE event_type IN ('purchase', 'click') GROUP BY 1)
        |),
        |l AS (SELECT * FROM ev WHERE event_type = 'purchase'),
        |r AS (SELECT * FROM ev WHERE event_type = 'click')
        |SELECT l.user_id, l.event_id AS left_id, r.event_id AS right_id
        |FROM l LEFT JOIN r ON l.user_id = r.user_id
        |  AND r.ts BETWEEN l.ts - INTERVAL 1 HOUR AND l.ts
        |WHERE epoch_us(l.ts) <= (SELECT c FROM cut)""".stripMargin,
    "q85_stream_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events
        |)
        |SELECT l.user_id,
        |       l.event_id AS left_id, r.event_id AS right_id
        |FROM ev l JOIN ev r
        |  ON l.user_id = r.user_id
        | AND l.event_type = 'purchase' AND r.event_type = 'click'
        | AND r.ts BETWEEN l.ts - INTERVAL 1 HOUR AND l.ts""".stripMargin,
    // eviction horizon outlives the replay, so the final state equals
    // the non-evicting twin's (q63) — same oracle
    "q65_stream_evict" ->
      s"""WITH $EvSql,
         |ranked AS (
         |  SELECT diseaseId, targetId, datasourceId, score,
         |         row_number() OVER (
         |           PARTITION BY diseaseId, targetId, datasourceId
         |           ORDER BY score DESC) AS rn,
         |         CAST(count(*) OVER (
         |           PARTITION BY diseaseId, targetId, datasourceId) AS BIGINT) AS n
         |  FROM ev
         |)
         |SELECT diseaseId, targetId, datasourceId, n AS n_evidence,
         |       round(sum(CASE WHEN rn <= 50 THEN score / (rn * rn) END)
         |             / 1.6449340668482264, 4) AS score
         |FROM ranked GROUP BY 1, 2, 3, n""".stripMargin,
    "q66_sql_surface" ->
      s"""WITH $EvSql,
         |ranked AS (
         |  SELECT diseaseId, targetId, datasourceId, score,
         |         row_number() OVER (
         |           PARTITION BY diseaseId, targetId, datasourceId
         |           ORDER BY score DESC) AS rn
         |  FROM ev
         |)
         |SELECT CAST(diseaseId AS BIGINT) AS diseaseId,
         |       CAST(targetId AS BIGINT) AS targetId, datasourceId,
         |       round(sum(CASE WHEN rn <= 50 THEN score / (rn * rn) END)
         |             / 1.6449340668482264, 4) AS score
         |FROM ranked GROUP BY 1, 2, 3""".stripMargin,
    "q19_peak_correlation" ->
      s"""WITH RECURSIVE $BySourceSql,
         |pk AS (
         |  SELECT diseaseId, targetId, datasourceId, year AS peakYear,
         |         coalesce(score, 0) - lag(coalesce(score, 0)) OVER (
         |           PARTITION BY diseaseId, targetId, datasourceId ORDER BY year) AS peak
         |  FROM bysource
         |),
         |fp AS (
         |  SELECT diseaseId, targetId, datasourceId,
         |         CAST(min(peakYear) AS INT) AS peakYear
         |  FROM pk WHERE peak > 0 GROUP BY 1, 2, 3
         |),
         |j AS (
         |  SELECT a.datasourceId AS datasourceIdA, b.datasourceId AS datasourceIdB,
         |         a.peakYear AS yearA, b.peakYear AS yearB
         |  FROM fp a JOIN fp b USING (diseaseId, targetId)
         |),
         |$CorrPTailSql""".stripMargin,
    // replays the deterministic permutation: lane = (source, md5-shard
    // of the pair id), key rank by md5, value rank by (year, md5),
    // rank-to-rank join, then the same corr as q19
    "q86_shuffled_correlation" ->
      s"""WITH RECURSIVE $BySourceSql,
         |pk AS (
         |  SELECT diseaseId, targetId, datasourceId, year AS peakYear,
         |         coalesce(score, 0) - lag(coalesce(score, 0)) OVER (
         |           PARTITION BY diseaseId, targetId, datasourceId ORDER BY year) AS peak
         |  FROM bysource
         |),
         |fp AS (
         |  SELECT diseaseId, targetId, datasourceId,
         |         CAST(min(peakYear) AS INT) AS peakYear,
         |         md5(CAST(diseaseId AS VARCHAR) || '|' || CAST(targetId AS VARCHAR)
         |             || ':perm') AS h
         |  FROM pk WHERE peak > 0 GROUP BY 1, 2, 3
         |),
         |sh AS (
         |  SELECT *, CAST(${HexBucketSql("h")} % 16 AS BIGINT) AS shard FROM fp
         |),
         |kr AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY datasourceId, shard ORDER BY h) AS r
         |  FROM sh
         |),
         |vr AS (
         |  SELECT datasourceId, shard, peakYear AS permYear,
         |         row_number() OVER (
         |           PARTITION BY datasourceId, shard ORDER BY peakYear, h) AS r
         |  FROM sh
         |),
         |perm AS (
         |  SELECT kr.diseaseId, kr.targetId, kr.datasourceId, vr.permYear
         |  FROM kr JOIN vr USING (datasourceId, shard, r)
         |),
         |j AS (
         |  SELECT a.datasourceId AS datasourceIdA, b.datasourceId AS datasourceIdB,
         |         a.permYear AS yearA, b.permYear AS yearB
         |  FROM perm a JOIN perm b USING (diseaseId, targetId)
         |),
         |$CorrPTailSql""".stripMargin,
    // PII replay: identical salting, then the same three RE2 patterns
    // applied in the same order (counts taken on the progressively-
    // redacted text); DuckDB regexp_replace needs the explicit 'g'
    // flag to match Spark's replace-all semantics.
    "q87_pii_redact" ->
      """WITH salted AS (
        |  SELECT doc_id, source,
        |    substring(text, 1, 40) || ' ' ||
        |    CASE WHEN doc_id % 2 = 0 THEN
        |      'user' || (doc_id % 100) || '@mail' || (doc_id % 7) || '.example.com '
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 0 THEN
        |      '10.0.' || (doc_id % 256) || '.' || ((doc_id // 256) % 256) || ' '
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 5 <> 0 THEN
        |      '415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' '
        |      ELSE '' END ||
        |    substring(text, 41) AS text
        |  FROM documents
        |),
        |r1 AS (
        |  SELECT doc_id, source,
        |         CAST(len(regexp_extract_all(text,
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
        |         regexp_replace(text,
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
        |  FROM salted
        |),
        |r2 AS (
        |  SELECT doc_id, source, n_email,
        |         CAST(len(regexp_extract_all(t,
        |           '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS INT) AS n_ip,
        |         regexp_replace(t,
        |           '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS t
        |  FROM r1
        |),
        |r3 AS (
        |  SELECT doc_id, source, n_email, n_ip,
        |         CAST(len(regexp_extract_all(t,
        |           '\b[0-9]{3}-([0-9]{3}-)?[0-9]{4}\b')) AS INT) AS n_phone,
        |         regexp_replace(t,
        |           '\b[0-9]{3}-([0-9]{3}-)?[0-9]{4}\b', '<PHONE>', 'g') AS t
        |  FROM r2
        |)
        |SELECT doc_id, source, n_email, n_ip, n_phone, md5(t) AS redacted_md5
        |FROM r3""".stripMargin,
    // Passage-dedup replay: same 3-word chunking (DuckDB's inclusive
    // 1-based list slice clamps the remnant chunk exactly like
    // Spark's slice), first occurrence by (doc_id, pos) via a window
    // (oracle scale only — the engine uses groupBy+join), surviving
    // text re-joined in document order.
    // Span-coverage replay: distinct shingles per doc, df across the
    // corpus, shared = df > 1; shingle-less docs keep a row with
    // n_shingles = 0 and dup_frac 0.
    "q93_span_coverage" ->
      s"""WITH $ShinglesSql,
         |inst AS (
         |  SELECT id, unnest(list_distinct(sh)) AS s FROM shingled
         |),
         |dfreq AS (SELECT s, count(*) AS df FROM inst GROUP BY s),
         |cov AS (
         |  SELECT inst.id,
         |         CAST(count(*) AS BIGINT) AS n_shingles,
         |         CAST(count(*) FILTER (WHERE df > 1) AS BIGINT) AS n_shared
         |  FROM inst JOIN dfreq USING (s) GROUP BY inst.id
         |),
         |base AS (
         |  SELECT d.doc_id,
         |         coalesce(c.n_shingles, 0) AS n_shingles,
         |         coalesce(c.n_shared, 0) AS n_shared,
         |         CASE WHEN coalesce(c.n_shingles, 0) = 0 THEN 0.0
         |              ELSE round(CAST(c.n_shared AS DOUBLE) / c.n_shingles, 4)
         |         END AS dup_frac
         |  FROM documents d LEFT JOIN cov c ON d.doc_id = c.id
         |)
         |SELECT doc_id, n_shingles, n_shared, dup_frac,
         |       dup_frac > 0.8 AS flagged
         |FROM base""".stripMargin,
    // Temperature-mix replay: identical count → rate arithmetic (rate
    // rounded to 6 dp on both sides before the keep comparison, so a
    // last-ulp pow() difference can't flip a boundary row) and the
    // same md5-uniform keep decision.
    "q89_temperature_mix" ->
      s"""WITH c AS (
         |  SELECT source, count(*) AS n_s FROM documents GROUP BY source
         |),
         |t AS (
         |  SELECT CAST(sum(n_s) AS DOUBLE) AS n_total,
         |         sum(pow(CAST(n_s AS DOUBLE), 0.7)) AS z
         |  FROM c
         |),
         |r AS (
         |  SELECT source,
         |         round(least(1.0,
         |           pow(CAST(n_s AS DOUBLE), 0.7) * n_total * 0.4
         |             / (z * CAST(n_s AS DOUBLE))), 6) AS rate
         |  FROM c, t
         |)
         |SELECT d.doc_id, d.source, r.rate
         |FROM documents d JOIN r USING (source)
         |WHERE CAST(${HexValSql("md5(CAST(d.doc_id AS VARCHAR) || ':temp')", 1, 13)} AS DOUBLE)
         |        / CAST(pow(2, 52) AS DOUBLE) < r.rate""".stripMargin,
    "q88_passage_dedup" ->
      """WITH w AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
        |),
        |ch AS (
        |  SELECT doc_id, source, ws,
        |         unnest(range(0, (len(ws) - 1) // 3 + 1)) AS pos
        |  FROM w
        |),
        |ins AS (
        |  SELECT doc_id, source, pos,
        |         array_to_string(ws[pos*3 + 1 : pos*3 + 3], ' ') AS passage
        |  FROM ch
        |),
        |rk AS (
        |  SELECT doc_id, source, pos, passage,
        |         row_number() OVER (
        |           PARTITION BY md5(passage) ORDER BY doc_id, pos) AS rn
        |  FROM ins
        |)
        |SELECT doc_id, source,
        |       CAST(count(*) AS INT) AS n_passages,
        |       CAST(count(*) FILTER (WHERE rn = 1) AS INT) AS n_kept,
        |       md5(coalesce(
        |         string_agg(passage, ' ' ORDER BY pos) FILTER (WHERE rn = 1),
        |         '')) AS kept_md5
        |FROM rk GROUP BY doc_id, source""".stripMargin,
    "q69_pack_sequences" ->
      s"""WITH h AS (
         |  SELECT doc_id, source, text,
         |         md5(CAST(doc_id AS VARCHAR) || ':pack') AS h FROM documents
         |),
         |b AS (
         |  SELECT doc_id, source,
         |         CAST(${HexBucketSql("h")} % 16 AS BIGINT) AS shard,
         |         CAST(CASE WHEN length(text) = 0 THEN 0
         |              ELSE length(text) - length(replace(text, ' ', '')) + 1
         |              END AS BIGINT) AS n_tokens
         |  FROM h
         |),
         |r AS (
         |  SELECT *, coalesce(sum(n_tokens) OVER (
         |    PARTITION BY source, shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
         |  FROM b
         |)
         |SELECT doc_id, source, shard, n_tokens,
         |       CAST(bef // 512 AS BIGINT) AS bin,
         |       CAST(bef % 512 AS BIGINT) AS bin_tokens
         |FROM r""".stripMargin,
    "q75_salted_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       round(sum(value), 4) AS sum_value,
        |       CAST(sum(user_id) AS BIGINT) AS sum_user,
        |       round(max(value), 4) AS max_value
        |FROM events GROUP BY 1""".stripMargin,
    "q76_salted_join" ->
      s"""WITH dim AS (
         |  SELECT event_type,
         |         CAST(${HexBucketSql("md5(event_type || ':w')")} % 9 + 1 AS DOUBLE)
         |           / CAST(10 AS DOUBLE) AS weight
         |  FROM (SELECT DISTINCT event_type FROM events)
         |)
         |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
         |       round(sum(value * weight), 4) AS wsum
         |FROM events e JOIN dim USING (event_type) GROUP BY 1""".stripMargin,
    "q77_bucketed_join" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
        |       round(sum(l_extendedprice), 4) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,
    "q78_io_roundtrip" ->
      """WITH a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(user_id) AS BIGINT) AS sum_user,
        |         round(sum(value), 4) AS sum_value
        |  FROM events
        |)
        |SELECT 'csv' AS fmt, n, sum_user, sum_value FROM a
        |UNION ALL SELECT 'jsonl', n, sum_user, sum_value FROM a
        |UNION ALL SELECT 'orc', n, sum_user, sum_value FROM a""".stripMargin,
    "q79_partition_refresh" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN source = 'src0'
        |                     THEN n_chars + 1000 ELSE n_chars END) AS BIGINT)
        |         AS sum_chars
        |FROM documents GROUP BY 1""".stripMargin,
    // Last-touch attribution: DuckDB's native ASOF LEFT JOIN picks the
    // same latest-touch-≤-conversion row the sort-merge as-of does;
    // the lookback is a post-filter on the matched gap (backward as-of
    // means the latest match is also the closest, so "latest within
    // horizon" ≡ "latest, nulled when beyond horizon").
    "q172_attribution" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_type
        |  FROM events
        |),
        |conv AS (
        |  SELECT event_id, user_id, ts, value FROM ev
        |  WHERE event_type = 'purchase' AND value IS NOT NULL
        |),
        |touch AS (
        |  SELECT user_id, ts, arg_max(event_type, event_id) AS channel
        |  FROM ev WHERE event_type IN ('click', 'view') GROUP BY 1, 2
        |),
        |m AS (
        |  SELECT p.value,
        |         CASE WHEN t.ts IS NULL
        |                OR epoch_us(p.ts) - epoch_us(t.ts) > 604800000000
        |              THEN 'direct' ELSE t.channel END AS channel
        |  FROM conv p
        |  ASOF LEFT JOIN touch t ON p.user_id = t.user_id AND p.ts >= t.ts
        |)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_conversions,
        |       round(sum(value), 4) AS attributed_value
        |FROM m GROUP BY 1""".stripMargin,
    // Poisson-bootstrap replay: same 24-bit md5 bucket, same integer
    // inverse-CDF thresholds, exact long cents — every resample mean
    // is a ratio of identical longs, so quantile_cont and Spark's
    // percentile interpolate the same doubles (4dp-rounded outputs).
    "q173_bootstrap_ci" ->
      s"""WITH ev AS (
         |  SELECT event_type, CAST(event_id AS VARCHAR) AS id,
         |         CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL
         |),
         |r AS (
         |  SELECT event_type, cents,
         |         ${HexValSql("md5(id || ':boot:' || CAST(rep AS VARCHAR))", 1, 6)} AS b,
         |         rep
         |  FROM ev CROSS JOIN (SELECT unnest(range(0, 64)) AS rep)
         |),
         |w AS (
         |  SELECT event_type, rep, cents,
         |         CASE WHEN b < 6171992 THEN 0 WHEN b < 12343985 THEN 1
         |              WHEN b < 15429982 THEN 2 WHEN b < 16458647 THEN 3
         |              WHEN b < 16715813 THEN 4 WHEN b < 16767247 THEN 5
         |              WHEN b < 16775819 THEN 6 WHEN b < 16777044 THEN 7
         |              ELSE 8 END AS w
         |  FROM r
         |),
         |pr AS (
         |  SELECT event_type, rep, sum(w * cents) AS ws, sum(w) AS wn
         |  FROM w GROUP BY 1, 2 HAVING sum(w) > 0
         |),
         |m AS (
         |  SELECT event_type,
         |         CAST(ws AS DOUBLE) / CAST(wn AS DOUBLE) / 100.0 AS mean
         |  FROM pr
         |),
         |ci AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_reps,
         |         round(quantile_cont(mean, 0.025), 4) AS ci_lo,
         |         round(quantile_cont(mean, 0.975), 4) AS ci_hi
         |  FROM m GROUP BY 1
         |),
         |base AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |         round(CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |               / 100.0, 4) AS mean
         |  FROM ev GROUP BY 1
         |)
         |SELECT event_type, n, mean, n_reps, ci_lo, ci_hi
         |FROM base JOIN ci USING (event_type)""".stripMargin,
    // Weighted-median replay: identical (value, event_id) cumulative
    // ordering, all-long crossing test — no floats until the final 4dp.
    "q174_weighted_median" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, value,
        |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events WHERE value IS NOT NULL
        |),
        |c AS (
        |  SELECT event_type, value, event_id, k,
        |         CAST(sum(k) OVER (PARTITION BY event_type
        |           ORDER BY value, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           AS cw,
        |         CAST(sum(k) OVER (PARTITION BY event_type) AS BIGINT) AS tw
        |  FROM ev WHERE k > 0
        |)
        |SELECT event_type, CAST(min(tw) AS BIGINT) AS total_w,
        |       CAST(count(*) AS BIGINT) AS n_at_or_above,
        |       round(arg_min(value, cw), 4) AS wq_value
        |FROM c WHERE cw * 2 >= tw * 1 GROUP BY 1""".stripMargin,
    // MI replay: same cast-then-multiply ratio order per cell; the
    // total sums 6dp-rounded contributions, so window order is moot.
    "q175_mutual_info" ->
      """WITH cells AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2
        |),
        |e AS (
        |  SELECT lang, source, n_ab,
        |         CAST(sum(n_ab) OVER (PARTITION BY lang) AS BIGINT) AS na,
        |         CAST(sum(n_ab) OVER (PARTITION BY source) AS BIGINT) AS nb,
        |         CAST(sum(n_ab) OVER () AS BIGINT) AS n
        |  FROM cells
        |),
        |c AS (
        |  SELECT lang, source, n_ab,
        |         round(ln(CAST(n_ab AS DOUBLE) * CAST(n AS DOUBLE)
        |           / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))), 4) AS pmi,
        |         round(CAST(n_ab AS DOUBLE) / CAST(n AS DOUBLE)
        |           * ln(CAST(n_ab AS DOUBLE) * CAST(n AS DOUBLE)
        |             / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))), 6) AS contrib
        |  FROM e
        |)
        |SELECT lang, source, n_ab, pmi, contrib,
        |       round(sum(contrib) OVER (), 4) AS mi
        |FROM c""".stripMargin,
    // Zipf replay: same (freq DESC, word) total rank order, the same
    // round(ln·10⁶) integerization, then q147's exact-sum closed form.
    "q176_zipf" ->
      """WITH vocab AS (
        |  SELECT source, word, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS word
        |        FROM documents)
        |  GROUP BY 1, 2
        |),
        |ranked AS (
        |  SELECT source, n,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY n DESC, word) AS rank
        |  FROM vocab
        |),
        |pts AS (
        |  SELECT source,
        |         CAST(round(ln(rank) * 1000000) AS BIGINT) AS x,
        |         CAST(round(ln(n) * 1000000) AS BIGINT) AS y
        |  FROM ranked WHERE rank <= 200 AND n >= 2
        |),
        |m AS (
        |  SELECT source,
        |         CAST(count(*) AS HUGEINT) AS n,
        |         CAST(sum(x) AS HUGEINT) AS sx,
        |         CAST(sum(y) AS HUGEINT) AS sy,
        |         CAST(sum(x*y) AS HUGEINT) AS sxy,
        |         CAST(sum(x*x) AS HUGEINT) AS sxx,
        |         CAST(sum(y*y) AS HUGEINT) AS syy
        |  FROM pts GROUP BY 1
        |),
        |f AS (
        |  SELECT source, n,
        |         n*sxy - sx*sy AS num,
        |         n*sxx - sx*sx AS varx,
        |         n*syy - sy*sy AS vary
        |  FROM m WHERE n >= 2 AND n*sxx - sx*sx > 0
        |)
        |SELECT source, CAST(n AS BIGINT) AS n_points,
        |       round(CAST(num AS DOUBLE) / CAST(varx AS DOUBLE), 4)
        |         AS zipf_slope,
        |       CASE WHEN vary > 0
        |         THEN round(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
        |                / (CAST(varx AS DOUBLE) * CAST(vary AS DOUBLE)), 4)
        |       END AS r2
        |FROM f""".stripMargin,
    // Zone-map replay: same 4dp quantile boundaries, strict b < v
    // bucket test, integral arrival division, exact min/max verdicts.
    "q177_zone_map" ->
      """WITH ev AS (
        |  SELECT event_id, value FROM events WHERE value IS NOT NULL
        |),
        |b AS (
        |  SELECT list_transform(
        |           quantile_cont(value, [0.0625, 0.125, 0.1875, 0.25,
        |             0.3125, 0.375, 0.4375, 0.5, 0.5625, 0.625, 0.6875,
        |             0.75, 0.8125, 0.875, 0.9375]),
        |           x -> round(x, 4)) AS bt
        |  FROM ev
        |),
        |tagged AS (
        |  SELECT layout, file, value FROM (
        |    SELECT 'arrival' AS layout, event_id // 500 AS file, value
        |    FROM ev
        |    UNION ALL
        |    SELECT 'clustered' AS layout,
        |           CAST(len(list_filter(bt, x -> x < value)) AS BIGINT) AS file,
        |           value
        |    FROM ev, b
        |  )
        |),
        |files AS (
        |  SELECT layout, file, CAST(count(*) AS BIGINT) AS n,
        |         min(value) AS mn, max(value) AS mx,
        |         CAST(count(CASE WHEN value >= 150.0 AND value <= 200.0
        |                         THEN 1 END) AS BIGINT) AS m
        |  FROM tagged GROUP BY 1, 2
        |)
        |SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
        |       CAST(count(CASE WHEN NOT (mx < 150.0 OR mn > 200.0)
        |                       THEN 1 END) AS BIGINT) AS files_scanned,
        |       CAST(coalesce(sum(CASE WHEN NOT (mx < 150.0 OR mn > 200.0)
        |                              THEN n ELSE 0 END), 0) AS BIGINT)
        |         AS rows_scanned,
        |       CAST(sum(m) AS BIGINT) AS rows_matching,
        |       round(1.0 - CAST(count(CASE WHEN NOT (mx < 150.0 OR mn > 200.0)
        |                                   THEN 1 END) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE), 4) AS skip_frac
        |FROM files GROUP BY 1""".stripMargin,
    // BH replay over the q19 chain: total (p, pair) rank order, the
    // same (p·m)/rank suffix-min, 4dp cap-at-1 adjustment.
    "q178_fdr" ->
      s"""WITH RECURSIVE $BySourceSql,
         |pk AS (
         |  SELECT diseaseId, targetId, datasourceId, year AS peakYear,
         |         coalesce(score, 0) - lag(coalesce(score, 0)) OVER (
         |           PARTITION BY diseaseId, targetId, datasourceId ORDER BY year) AS peak
         |  FROM bysource
         |),
         |fp AS (
         |  SELECT diseaseId, targetId, datasourceId,
         |         CAST(min(peakYear) AS INT) AS peakYear
         |  FROM pk WHERE peak > 0 GROUP BY 1, 2, 3
         |),
         |j AS (
         |  SELECT a.datasourceId AS datasourceIdA, b.datasourceId AS datasourceIdB,
         |         a.peakYear AS yearA, b.peakYear AS yearB
         |  FROM fp a JOIN fp b USING (diseaseId, targetId)
         |),
         |$CorrPCtesSql,
         |corr_out AS (
         |$CorrPSelectSql
         |),
         |rk AS (
         |  SELECT *, CAST(row_number() OVER (
         |           ORDER BY p_value, datasourceIdA, datasourceIdB) AS BIGINT)
         |           AS p_rank,
         |         CAST(count(*) OVER () AS BIGINT) AS m
         |  FROM corr_out WHERE p_value IS NOT NULL
         |),
         |adj AS (
         |  SELECT *, round(least(1.0, min(p_value * m / p_rank) OVER (
         |           ORDER BY p_rank
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)), 4)
         |           AS p_adj
         |  FROM rk
         |)
         |SELECT datasourceIdA, datasourceIdB, n, r, p_value, p_rank, p_adj,
         |       p_adj <= 0.05 AS significant
         |FROM adj""".stripMargin,
    // dHash LSH replay: the q115 bits chain, 16-bit band buckets with
    // the same >1/≤cap bounds, distinct pairs, exact xor/bit_count.
    "q179_dhash_pairs" ->
      s"""WITH $DhashBitsSql,
         |bands AS (
         |  SELECT doc_id, dhash_hi, dhash_lo, bb.b,
         |         CASE bb.b WHEN 0 THEN dhash_hi // 65536
         |                   WHEN 1 THEN dhash_hi % 65536
         |                   WHEN 2 THEN dhash_lo // 65536
         |                   ELSE dhash_lo % 65536 END AS bv
         |  FROM bits, (SELECT unnest(range(0, 4)) AS b) bb
         |),
         |ok AS (
         |  SELECT b, bv FROM bands GROUP BY 1, 2
         |  HAVING count(*) > 1 AND count(*) <= ${graft.GraftConf.LshBucketCap}
         |),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS idA, y.doc_id AS idB
         |  FROM bands x
         |  JOIN ok USING (b, bv)
         |  JOIN bands y ON y.b = x.b AND y.bv = x.bv AND x.doc_id < y.doc_id
         |)
         |SELECT idA, idB,
         |       CAST(bit_count(xor(a.dhash_hi, c.dhash_hi))
         |          + bit_count(xor(a.dhash_lo, c.dhash_lo)) AS INT) AS hamming
         |FROM cand
         |JOIN bits a ON a.doc_id = idA
         |JOIN bits c ON c.doc_id = idB
         |WHERE bit_count(xor(a.dhash_hi, c.dhash_hi))
         |    + bit_count(xor(a.dhash_lo, c.dhash_lo)) <= 12""".stripMargin,
    // Funnel-timing replay: the q95 staged-min chain, then exact
    // interpolated percentiles of the conversion gap.
    "q180_funnel_timing" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events
        |),
        |s1 AS (
        |  SELECT user_id, min(us) AS t1 FROM ev
        |  WHERE event_type = 'view' GROUP BY 1
        |),
        |s2 AS (
        |  SELECT e.user_id, min(e.us) AS t2
        |  FROM ev e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.us >= s1.t1 GROUP BY 1
        |),
        |s3 AS (
        |  SELECT e.user_id, min(e.us) AS t3
        |  FROM ev e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.us >= s2.t2 GROUP BY 1
        |),
        |d AS (SELECT s3.user_id, t3 - t1 AS d
        |      FROM s3 JOIN s1 USING (user_id))
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |       round(quantile_cont(d, 0.5) / 86400000000.0, 4) AS p50_days,
        |       round(quantile_cont(d, 0.9) / 86400000000.0, 4) AS p90_days,
        |       round(avg(d) / 86400000000.0, 4) AS avg_days
        |FROM d""".stripMargin,
    // Constraint-audit replay: plain counting SQL per constraint; the
    // constraint labels must match the operator's formatting exactly.
    "q181_constraint_audit" ->
      """SELECT 'row_count' AS "constraint",
        |       CAST(count(*) AS BIGINT) AS n_violations FROM lineitem
        |UNION ALL
        |SELECT 'not_null(l_shipdate)',
        |       CAST(count(CASE WHEN l_shipdate IS NULL THEN 1 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'not_null(l_quantity)',
        |       CAST(count(CASE WHEN l_quantity IS NULL THEN 1 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'range(l_quantity in [1.0,45.0])',
        |       CAST(count(CASE WHEN l_quantity < 1.0 OR l_quantity > 45.0
        |                       THEN 1 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'range(l_discount in [0.0,0.1])',
        |       CAST(count(CASE WHEN l_discount < 0.0 OR l_discount > 0.1
        |                       THEN 1 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'pk_unique(l_orderkey,l_linenumber)',
        |       CAST(coalesce(sum(c - 1), 0) AS BIGINT)
        |FROM (SELECT count(*) AS c FROM lineitem
        |      GROUP BY l_orderkey, l_linenumber)
        |UNION ALL
        |SELECT 'fk(l_orderkey -> o_orderkey)', CAST(count(*) AS BIGINT)
        |FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |UNION ALL
        |SELECT 'fk(l_partkey -> p_partkey)', CAST(count(*) AS BIGINT)
        |FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
        |UNION ALL
        |SELECT 'fk(l_suppkey -> s_suppkey)', CAST(count(*) AS BIGINT)
        |FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)""".stripMargin,
    // χ² replay: identical cast-then-multiply E per cell, the same
    // empty-cell fold (Σ(O−E)²/E−E + n), 6dp contributions.
    "q182_chi_square" ->
      """WITH cells AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2
        |),
        |e AS (
        |  SELECT lang, source, n_ab,
        |         CAST(sum(n_ab) OVER (PARTITION BY lang) AS BIGINT) AS na,
        |         CAST(sum(n_ab) OVER (PARTITION BY source) AS BIGINT) AS nb,
        |         CAST(sum(n_ab) OVER () AS BIGINT) AS n
        |  FROM cells
        |),
        |c AS (
        |  SELECT lang, source, n_ab, n,
        |         round((CAST(n_ab AS DOUBLE)
        |                - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / CAST(n AS DOUBLE))
        |             * (CAST(n_ab AS DOUBLE)
        |                - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / CAST(n AS DOUBLE))
        |             / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / CAST(n AS DOUBLE))
        |             - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |           AS contrib
        |  FROM e
        |),
        |agg AS (
        |  SELECT CAST(min(n) AS BIGINT) AS n,
        |         CAST(count(DISTINCT lang) AS BIGINT) AS r_levels,
        |         CAST(count(DISTINCT source) AS BIGINT) AS c_levels,
        |         sum(contrib) AS sc
        |  FROM c
        |)
        |SELECT n, r_levels, c_levels,
        |       (r_levels - 1) * (c_levels - 1) AS dof,
        |       round(sc + n, 4) AS chi2,
        |       CASE WHEN (r_levels - 1) * (c_levels - 1) > 0
        |            THEN round(sqrt(round(sc + n, 4)
        |                 / (CAST(n AS DOUBLE)
        |                    * CAST(least(r_levels - 1, c_levels - 1) AS DOUBLE))), 4)
        |       END AS cramers_v
        |FROM agg""".stripMargin,
    // Calibration replay: q37's exact-rational quality, q52's gopher
    // predicate, decile binning, exact-integer mean per bin.
    "q183_calibration" ->
      s"""WITH $GopherDocSql,
         |base AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS w,
         |         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT)
         |           AS n_tokens
         |  FROM documents
         |),
         |q AS (
         |  SELECT doc_id,
         |         CAST((CAST(4 * least(n_tokens, 100) * n_tokens
         |                    + 300 * len(list_distinct(w))
         |                    + 300 * (n_tokens - len(list_filter(w, x -> x = 'the'))
         |                                      - len(list_filter(w, x -> x = 'a')))
         |               AS BIGINT)
         |               * 20000 + 1000 * n_tokens) // (2000 * n_tokens) AS DOUBLE)
         |           / 10000.0 AS quality
         |  FROM base
         |),
         |g AS (SELECT doc_id, (${gopherPassPred(2)}) AS gopher_pass FROM d),
         |s AS (
         |  SELECT CAST(least(CAST(floor(quality * 10) AS INT), 9) AS INT) AS bin,
         |         quality, gopher_pass
         |  FROM q JOIN g USING (doc_id)
         |)
         |SELECT bin, CAST(count(*) AS BIGINT) AS n,
         |       CAST(count(CASE WHEN gopher_pass THEN 1 END) AS BIGINT) AS n_pass,
         |       round(CAST(sum(CAST(round(quality * 10000) AS BIGINT)) AS DOUBLE)
         |             / CAST(count(*) AS DOUBLE) / 10000.0, 4) AS mean_quality,
         |       round(CAST(count(CASE WHEN gopher_pass THEN 1 END) AS DOUBLE)
         |             / CAST(count(*) AS DOUBLE), 4) AS pass_rate
         |FROM s GROUP BY 1""".stripMargin,
    // New-vs-returning replay: distinct (user, day) grain, first day
    // per user, day rollup.
    "q184_new_returning" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id,
        |         strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day
        |  FROM events
        |),
        |fd AS (SELECT user_id, min(day) AS first_day FROM ev GROUP BY 1)
        |SELECT day, CAST(count(*) AS BIGINT) AS active_users,
        |       CAST(count(CASE WHEN day = first_day THEN 1 END) AS BIGINT)
        |         AS new_users,
        |       CAST(count(*) - count(CASE WHEN day = first_day THEN 1 END)
        |            AS BIGINT) AS returning_users
        |FROM ev JOIN fd USING (user_id) GROUP BY 1""".stripMargin,
    // Blow-up forecast replay: key-count tables joined, |A|·|B|
    // product, deterministic (out_rows DESC, key) top-20.
    "q185_join_blowup" ->
      """WITH c AS (
        |  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1
        |)
        |SELECT a.key, a.n AS n_left, b.n AS n_right,
        |       CAST(a.n * b.n AS BIGINT) AS out_rows
        |FROM c a JOIN c b USING (key)
        |ORDER BY out_rows DESC, key LIMIT 20""".stripMargin,
    // Inter-arrival replay: identical (ts, event_id) series order;
    // gaps exact long micros, seconds only at the 4dp projection.
    "q186_interarrival" ->
      """WITH g AS (
        |  SELECT event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |           OVER (PARTITION BY user_id, event_type
        |                 ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap
        |  FROM events
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |       round(CAST(sum(gap) AS DOUBLE) / count(*) / 1e6, 4) AS mean_gap_s,
        |       round(quantile_cont(gap, 0.5) / 1e6, 4) AS p50_gap_s,
        |       round(quantile_cont(gap, 0.9) / 1e6, 4) AS p90_gap_s,
        |       round(CAST(max(gap) AS DOUBLE) / 1e6, 4) AS max_gap_s
        |FROM g WHERE gap IS NOT NULL GROUP BY 1""".stripMargin,
    // UCB1 replay: exact integer-cent means; ln/sqrt rounded 6dp
    // before the display rank so ranks can never flip on an ulp.
    "q187_ucb1" ->
      """WITH a AS (
        |  SELECT event_type AS arm, CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(round(value * 100) AS BIGINT)) AS c
        |  FROM events WHERE value IS NOT NULL GROUP BY 1
        |),
        |t AS (SELECT a.*, sum(n) OVER () AS total_n FROM a),
        |s AS (
        |  SELECT arm, n, CAST(total_n AS BIGINT) AS total_n,
        |         round(CAST(c AS DOUBLE) / n / 100.0, 4) AS mean_reward,
        |         round(sqrt(2.0 * ln(CAST(total_n AS DOUBLE)) / n), 6) AS bonus
        |  FROM t
        |)
        |SELECT arm, n, total_n, mean_reward, bonus,
        |       round(mean_reward + bonus, 6) AS ucb,
        |       CAST(rank() OVER (ORDER BY round(mean_reward + bonus, 6) DESC, arm)
        |            AS BIGINT) AS rank
        |FROM s""".stripMargin,
    // Vocab-build replay: q57's tokenization; ids from the same
    // (n desc, token) total order; coverage vs the FULL corpus total.
    "q188_vocab_build" ->
      """WITH f AS (
        |  SELECT word AS token, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY 1
        |),
        |tot AS (SELECT sum(n) AS total FROM f),
        |top AS (SELECT token, n FROM f ORDER BY n DESC, token LIMIT 500)
        |SELECT CAST(row_number() OVER (ORDER BY n DESC, token) - 1 AS BIGINT) AS token_id,
        |       token, n,
        |       round(CAST(sum(n) OVER (ORDER BY n DESC, token
        |                    ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |             / (SELECT total FROM tot), 6) AS coverage
        |FROM top""".stripMargin,
    // Basket-lift replay: pairs via a basket-keyed self-join instead
    // of Spark's in-row expansion — same exact counts either way; the
    // top-20 cut orders by the ROUNDED lift with (a, b) tie-break.
    "q189_basket_lift" ->
      """WITH b AS (
        |  SELECT l_orderkey AS bk, l_partkey AS it FROM lineitem GROUP BY 1, 2
        |),
        |p AS (
        |  SELECT x.it AS a, y.it AS b, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it GROUP BY 1, 2
        |),
        |m AS (SELECT it, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1),
        |t AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS nb FROM b)
        |SELECT p.a, p.b, p.n_ab,
        |       round(CAST(p.n_ab AS DOUBLE) * t.nb / (ma.n * mb.n), 4) AS lift
        |FROM p JOIN m ma ON ma.it = p.a JOIN m mb ON mb.it = p.b CROSS JOIN t
        |WHERE p.n_ab >= 3
        |ORDER BY lift DESC, p.a, p.b LIMIT 20""".stripMargin,
    // Cross-correlation replay: identical dense calendar, identical
    // integer min-centering, the same five exact sums per lag.
    "q190_xcorr" ->
      """WITH d AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |         CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS na,
        |         CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS nb
        |  FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1
        |),
        |cal AS (
        |  SELECT unnest(range((SELECT min(day) FROM d),
        |                      (SELECT max(day) FROM d) + 1)) AS day
        |),
        |dense AS (
        |  SELECT c.day, coalesce(d.na, 0) AS na, coalesce(d.nb, 0) AS nb
        |  FROM cal c LEFT JOIN d USING (day)
        |),
        |ctr AS (
        |  SELECT day, na - (SELECT min(na) FROM dense) AS a,
        |         nb - (SELECT min(nb) FROM dense) AS b
        |  FROM dense
        |),
        |lags AS (SELECT unnest(range(-3, 4)) AS lag),
        |s AS (
        |  SELECT l.lag, CAST(count(*) AS BIGINT) AS n_days,
        |         sum(x.a) AS sa, sum(y.b) AS sb, sum(x.a * x.a) AS saa,
        |         sum(y.b * y.b) AS sbb, sum(x.a * y.b) AS sab
        |  FROM ctr x CROSS JOIN lags l JOIN ctr y ON y.day = x.day + l.lag
        |  GROUP BY 1
        |)
        |SELECT CAST(lag AS BIGINT) AS lag, n_days,
        |       round(CAST(n_days * sab - sa * sb AS DOUBLE)
        |             / NULLIF(sqrt(CAST(n_days * saa - sa * sa AS DOUBLE)
        |                           * CAST(n_days * sbb - sb * sb AS DOUBLE)), 0), 4) AS r
        |FROM s""".stripMargin,
    // Recall replay: both rankings re-derived with the same (cos desc,
    // id) tie-break; micro recall is a ratio of exact long totals.
    "q191_ann_recall" ->
      s"""WITH $EmbSql,
         |$LshSql,
         |qs AS (SELECT vec_id AS query_id, q AS qq, n AS qn FROM nrm WHERE vec_id % 50 = 0),
         |ex AS (
         |  SELECT query_id, id FROM (
         |    SELECT q.query_id, c.vec_id AS id,
         |           row_number() OVER (PARTITION BY q.query_id ORDER BY
         |             CAST(list_sum(list_transform(range(1, 65), i -> c.q[i] * q.qq[i])) AS DOUBLE)
         |               / (c.n * q.qn) DESC, c.vec_id) AS rank
         |    FROM nrm c CROSS JOIN qs q WHERE c.vec_id != q.query_id
         |  ) WHERE rank <= 5
         |),
         |qb AS (SELECT w.vec_id AS query_id, w.q AS qq, w.n AS qn, w.bucket
         |       FROM withb w WHERE w.vec_id % 50 = 0),
         |ap AS (
         |  SELECT query_id, id FROM (
         |    SELECT q.query_id, c.vec_id AS id,
         |           row_number() OVER (PARTITION BY q.query_id ORDER BY
         |             CAST(list_sum(list_transform(range(1, 65), i -> c.q[i] * q.qq[i])) AS DOUBLE)
         |               / (c.n * q.qn) DESC, c.vec_id) AS rank
         |    FROM withb c JOIN qb q USING (bucket) WHERE c.vec_id != q.query_id
         |  ) WHERE rank <= 5
         |),
         |per AS (
         |  SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_exact,
         |         CAST(count(a.id) AS BIGINT) AS n_hits
         |  FROM ex e LEFT JOIN ap a ON a.query_id = e.query_id AND a.id = e.id
         |  GROUP BY 1
         |),
         |tot AS (SELECT sum(n_hits) AS th, sum(n_exact) AS te FROM per)
         |SELECT query_id, n_exact, n_hits,
         |       round(CAST(n_hits AS DOUBLE) / n_exact, 4) AS recall,
         |       round(CAST(tot.th AS DOUBLE) / tot.te, 4) AS micro_recall
         |FROM per CROSS JOIN tot""".stripMargin,
    // KS replay: same cents grain, all-long CDF gap |F1·n2 − F2·n1|,
    // identical double-op order for d/λ/p before the 4dp rounds.
    "q192_ks_test" ->
      """WITH p AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |         CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS c1,
        |         CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS c2
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')
        |  GROUP BY 1
        |),
        |c AS (
        |  SELECT sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f1,
        |         sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f2
        |  FROM p
        |),
        |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM p),
        |m AS (
        |  SELECT t.n1, t.n2, CAST(max(abs(f1 * t.n2 - f2 * t.n1)) AS BIGINT) AS dn
        |  FROM c CROSS JOIN t GROUP BY t.n1, t.n2
        |),
        |s AS (
        |  SELECT n1, n2,
        |         CAST(dn AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS d0
        |  FROM m
        |),
        |l AS (
        |  SELECT n1, n2, d0,
        |         d0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |                   / CAST(n1 + n2 AS DOUBLE)) AS lam
        |  FROM s
        |)
        |SELECT n1, n2, round(d0, 4) AS d, round(lam, 4) AS lambda,
        |       round(least(1.0, 2.0 * exp(-2.0 * lam * lam)), 4) AS p_value
        |FROM l""".stripMargin,
    // DP replay: the noise CASE below is RENDERED from the same
    // dpThresholds() the Spark side folds over — identical constants
    // by construction, pure integer comparisons.
    "q193_dp_counts" ->
      s"""WITH g AS (
         |  SELECT event_type,
         |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2
         |),
         |b AS (
         |  SELECT event_type, day, n,
         |         ${HexValSql("md5(event_type || '|' || CAST(day AS VARCHAR) || ':dp')", 1, 6)} AS bkt
         |  FROM g
         |)
         |SELECT event_type, day,
         |       CAST(greatest(n + ${Privacy.dpNoiseSql("bkt", 0.5, 8)}, 0) AS BIGINT) AS noisy_n,
         |       0.5 AS epsilon
         |FROM b""".stripMargin,
    // ER replay: same noun-token blocking, same exact edit distance,
    // (a < b) pair order, part counts carried per side.
    "q194_er_blocked" ->
      """WITH names AS (
        |  SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts,
        |         string_split(p_name, ' ')[2] AS block
        |  FROM part GROUP BY 1
        |)
        |SELECT x.p_name AS name_a, y.p_name AS name_b,
        |       CAST(levenshtein(x.p_name, y.p_name) AS BIGINT) AS lev,
        |       x.n_parts AS n_a, y.n_parts AS n_b
        |FROM names x JOIN names y ON x.block = y.block AND x.p_name < y.p_name
        |WHERE levenshtein(x.p_name, y.p_name) <= 3""".stripMargin,
    // Theil–Sen replay: same (x, y) long series, same in-list pair
    // slopes, both engines sort the SAME doubles before the median.
    "q195_theil_sen" ->
      """WITH s AS (
        |  SELECT l_returnflag AS datasourceId,
        |         CAST(year(l_shipdate) AS BIGINT) AS x,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1, 2
        |),
        |arr AS (
        |  SELECT datasourceId,
        |         list(struct_pack(x := x, y := y) ORDER BY x) AS a,
        |         CAST(count(*) AS BIGINT) AS n_points
        |  FROM s GROUP BY 1
        |),
        |sl AS (
        |  SELECT datasourceId, n_points,
        |         list_sort(flatten(list_transform(range(1, CAST(n_points AS INT) + 1), i ->
        |           list_transform(range(i + 1, CAST(n_points AS INT) + 1), j ->
        |             CAST(a[j].y - a[i].y AS DOUBLE) / (a[j].x - a[i].x))))) AS sls
        |  FROM arr
        |)
        |SELECT datasourceId, n_points, CAST(len(sls) AS BIGINT) AS n_slopes,
        |       round(CASE WHEN len(sls) % 2 = 1 THEN sls[(len(sls) + 1) // 2]
        |                  ELSE (sls[len(sls) // 2] + sls[len(sls) // 2 + 1]) / 2
        |             END, 4) AS slope
        |FROM sl WHERE len(sls) > 0""".stripMargin,
    // Spearman replay: identical integer 2·avg-rank encoding, exact
    // long moment sums, one double division.
    "q196_spearman" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        |  FROM events WHERE value IS NOT NULL
        |),
        |r AS (
        |  SELECT event_type,
        |         2 * rank() OVER (PARTITION BY event_type ORDER BY v)
        |           + count(*) OVER (PARTITION BY event_type, v) - 1 AS ra,
        |         2 * rank() OVER (PARTITION BY event_type ORDER BY tus)
        |           + count(*) OVER (PARTITION BY event_type, tus) - 1 AS rb
        |  FROM e
        |),
        |s AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         sum(ra) AS sa, sum(rb) AS sb, sum(ra * ra) AS saa,
        |         sum(rb * rb) AS sbb, sum(ra * rb) AS sab
        |  FROM r GROUP BY 1
        |)
        |SELECT event_type, n,
        |       round(CAST(n * sab - sa * sb AS DOUBLE)
        |             / NULLIF(sqrt(CAST(n * saa - sa * sa AS DOUBLE)
        |                           * CAST(n * sbb - sb * sb AS DOUBLE)), 0), 4) AS rho
        |FROM s""".stripMargin,
    // Changepoint replay: same cumulative/total long sums, gain
    // rounded 6dp BEFORE the (gain desc, day) argmax rank.
    "q197_changepoint" ->
      """WITH d AS (
        |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2
        |),
        |c AS (
        |  SELECT event_type, day, y,
        |         sum(y) OVER (PARTITION BY event_type ORDER BY day
        |                      ROWS UNBOUNDED PRECEDING) AS cy,
        |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
        |         count(*) OVER (PARTITION BY event_type) AS n,
        |         sum(y) OVER (PARTITION BY event_type) AS s
        |  FROM d
        |),
        |gg AS (
        |  SELECT event_type, day, i, n,
        |         round(CAST(cy * cy AS DOUBLE) / i
        |               + CAST((s - cy) * (s - cy) AS DOUBLE) / (n - i)
        |               - CAST(s * s AS DOUBLE) / n, 6) AS gain
        |  FROM c WHERE i < n
        |),
        |rk AS (
        |  SELECT event_type, day, n, gain,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY gain DESC, day) AS rnk
        |  FROM gg
        |)
        |SELECT event_type, CAST(n AS BIGINT) AS n_points, day AS split_x,
        |       round(gain, 4) AS gain
        |FROM rk WHERE rnk = 1""".stripMargin,
    // Curve replay: the UNFILTERED verified-pair CTE from the q31
    // machinery, swept over the same k·0.05 threshold doubles.
    "q198_dedup_curve" ->
      s"""WITH $MinhashPairsSql,
         |th AS (SELECT unnest(range(10, 20)) * 0.05 AS t),
         |f AS (
         |  SELECT t, idA, idB FROM verified CROSS JOIN th WHERE jaccard >= t
         |),
         |e AS (SELECT t, unnest([idA, idB]) AS id FROM f)
         |SELECT round(t, 2) AS t, CAST(count(*) // 2 AS BIGINT) AS n_pairs,
         |       CAST(count(DISTINCT id) AS BIGINT) AS n_docs
         |FROM e GROUP BY t""".stripMargin,
    // Rank-sum replay: identical 2·avg-rank integers at value grain,
    // exact 2U₁ and tie sums, same double-op order for z.
    "q199_mann_whitney" ->
      """WITH p AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |         CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS c1,
        |         CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS c2
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')
        |  GROUP BY 1
        |),
        |r AS (
        |  SELECT c1, c2, c1 + c2 AS t,
        |         2 * (sum(c1 + c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |              - (c1 + c2)) + (c1 + c2) + 1 AS r2
        |  FROM p
        |),
        |s AS (
        |  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
        |         CAST(sum(c1 * r2) AS BIGINT) AS r2sum1,
        |         CAST(sum(t * t * t - t) AS BIGINT) AS ties
        |  FROM r
        |),
        |m AS (
        |  SELECT n1, n2, r2sum1 - n1 * (n1 + 1) AS twoU1, n1 + n2 AS n, ties
        |  FROM s
        |),
        |vv AS (
        |  SELECT n1, n2, twoU1,
        |         CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
        |           * (CAST(n + 1 AS DOUBLE)
        |              - CAST(ties AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS var
        |  FROM m
        |)
        |SELECT n1, n2, round(CAST(twoU1 AS DOUBLE) / 2.0, 4) AS u,
        |       round(CAST(twoU1 - n1 * n2 AS DOUBLE)
        |             / CASE WHEN var <= 0 THEN NULL ELSE 2.0 * sqrt(var) END, 4) AS z
        |FROM vv""".stripMargin,
    // Sweep-line replay: same half-open boundary order (t, d), same
    // ROWS cumsum, same (conc desc, t, d) argmax total order.
    "q200_concurrency" ->
      """WITH iv AS (
        |  SELECT l_suppkey, epoch_us(l_shipdate) // 86400000000 AS s,
        |         epoch_us(l_shipdate) // 86400000000
        |           + CAST(l_quantity AS BIGINT) AS e
        |  FROM lineitem
        |),
        |b AS (
        |  SELECT l_suppkey, u.t, u.d
        |  FROM iv, unnest([struct_pack(t := s, d := CAST(1 AS BIGINT)),
        |                   struct_pack(t := e, d := CAST(-1 AS BIGINT))]) AS r(u)
        |),
        |c AS (
        |  SELECT l_suppkey, t, d,
        |         sum(d) OVER (PARTITION BY l_suppkey ORDER BY t, d
        |                      ROWS UNBOUNDED PRECEDING) AS conc,
        |         CAST(count(*) OVER (PARTITION BY l_suppkey) // 2 AS BIGINT) AS n_intervals
        |  FROM b
        |),
        |rk AS (
        |  SELECT l_suppkey, n_intervals, conc, t,
        |         row_number() OVER (PARTITION BY l_suppkey
        |                            ORDER BY conc DESC, t, d) AS rnk
        |  FROM c
        |)
        |SELECT l_suppkey, n_intervals, CAST(conc AS BIGINT) AS peak, t AS peak_t
        |FROM rk WHERE rnk = 1""".stripMargin,
    // Benford replay: digit from the integer-cent decimal string,
    // contributions 6dp before the 4dp χ² window.
    "q201_benford" ->
      """WITH c AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND CAST(round(l_extendedprice * 100) AS BIGINT) > 0
        |),
        |g AS (
        |  SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM c GROUP BY 1
        |),
        |w AS (
        |  SELECT digit, n, CAST(sum(n) OVER () AS BIGINT) AS total FROM g
        |),
        |e AS (
        |  SELECT digit, n, total,
        |         round(CAST(n AS DOUBLE) / total, 4) AS p_obs,
        |         round(log10(1.0 + 1.0 / digit), 4) AS p_exp,
        |         round((CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * log10(1.0 + 1.0 / digit))
        |               * (CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * log10(1.0 + 1.0 / digit))
        |               / (CAST(total AS DOUBLE) * log10(1.0 + 1.0 / digit)), 6) AS contrib
        |  FROM w
        |)
        |SELECT digit, n, p_obs, p_exp, contrib,
        |       round(sum(contrib) OVER (), 4) AS chi2
        |FROM e""".stripMargin,
    // Stickiness replay: same user-day grain, same bounded offset
    // fans re-aggregated with exact distincts.
    "q202_stickiness" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id AS u,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d
        |  FROM events
        |),
        |dau AS (SELECT d AS day, CAST(count(DISTINCT u) AS BIGINT) AS dau FROM ud GROUP BY 1),
        |wau AS (
        |  SELECT d + o AS day, CAST(count(DISTINCT u) AS BIGINT) AS wau
        |  FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS o) GROUP BY 1
        |),
        |mau AS (
        |  SELECT d + o AS day, CAST(count(DISTINCT u) AS BIGINT) AS mau
        |  FROM ud CROSS JOIN (SELECT unnest(range(0, 30)) AS o) GROUP BY 1
        |)
        |SELECT day, dau, wau, mau,
        |       round(CAST(dau AS DOUBLE) / wau, 4) AS dau_wau,
        |       round(CAST(dau AS DOUBLE) / mau, 4) AS dau_mau
        |FROM dau JOIN wau USING (day) JOIN mau USING (day)""".stripMargin,
    // Step-report replay: the q95 funnel CTEs re-aggregated on a
    // 0..3 spine with a lag-window conversion.
    "q203_funnel_steps" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events
        |),
        |s1 AS (
        |  SELECT user_id, min(us) AS t1 FROM ev
        |  WHERE event_type = 'view' GROUP BY 1
        |),
        |s2 AS (
        |  SELECT e.user_id, min(e.us) AS t2
        |  FROM ev e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.us >= s1.t1 GROUP BY 1
        |),
        |s3 AS (
        |  SELECT e.user_id, min(e.us) AS t3
        |  FROM ev e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.us >= s2.t2 GROUP BY 1
        |),
        |u AS (SELECT DISTINCT user_id FROM ev),
        |f AS (
        |  SELECT CAST(CAST(t1 IS NOT NULL AS INT) + CAST(t2 IS NOT NULL AS INT)
        |              + CAST(t3 IS NOT NULL AS INT) AS INT) AS sc
        |  FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |         LEFT JOIN s3 USING (user_id)
        |),
        |spine AS (SELECT CAST(unnest(range(0, 4)) AS INT) AS step),
        |r AS (
        |  SELECT step, CAST(count(f.sc) AS BIGINT) AS n_reached
        |  FROM spine LEFT JOIN f ON f.sc >= spine.step GROUP BY 1
        |)
        |SELECT step, n_reached,
        |       round(CAST(n_reached AS DOUBLE)
        |             / lag(n_reached) OVER (ORDER BY step), 4) AS conv
        |FROM r""".stripMargin,
    // Matrix replay: HUGEINT moment sums (≡ Spark's decimal(38,0)),
    // listwise deletion, one r expression per pair.
    "q204_corr_matrix" ->
      """WITH k AS (
        |  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS c1,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS c2,
        |         CAST(round(l_discount * 100) AS BIGINT) AS c3,
        |         CAST(round(l_tax * 100) AS BIGINT) AS c4
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL AND l_tax IS NOT NULL
        |),
        |s AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |         CAST(sum(c1) AS HUGEINT) AS s1, CAST(sum(c2) AS HUGEINT) AS s2,
        |         CAST(sum(c3) AS HUGEINT) AS s3, CAST(sum(c4) AS HUGEINT) AS s4,
        |         CAST(sum(c1*c1) AS HUGEINT) AS p11, CAST(sum(c1*c2) AS HUGEINT) AS p12,
        |         CAST(sum(c1*c3) AS HUGEINT) AS p13, CAST(sum(c1*c4) AS HUGEINT) AS p14,
        |         CAST(sum(c2*c2) AS HUGEINT) AS p22, CAST(sum(c2*c3) AS HUGEINT) AS p23,
        |         CAST(sum(c2*c4) AS HUGEINT) AS p24, CAST(sum(c3*c3) AS HUGEINT) AS p33,
        |         CAST(sum(c3*c4) AS HUGEINT) AS p34, CAST(sum(c4*c4) AS HUGEINT) AS p44
        |  FROM k
        |),
        |pairs AS (
        |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n, n*p12 - s1*s2 AS num, n*p11 - s1*s1 AS da, n*p22 - s2*s2 AS db FROM s
        |  UNION ALL SELECT 'l_quantity', 'l_discount', n, n*p13 - s1*s3, n*p11 - s1*s1, n*p33 - s3*s3 FROM s
        |  UNION ALL SELECT 'l_quantity', 'l_tax', n, n*p14 - s1*s4, n*p11 - s1*s1, n*p44 - s4*s4 FROM s
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount', n, n*p23 - s2*s3, n*p22 - s2*s2, n*p33 - s3*s3 FROM s
        |  UNION ALL SELECT 'l_extendedprice', 'l_tax', n, n*p24 - s2*s4, n*p22 - s2*s2, n*p44 - s4*s4 FROM s
        |  UNION ALL SELECT 'l_discount', 'l_tax', n, n*p34 - s3*s4, n*p33 - s3*s3, n*p44 - s4*s4 FROM s
        |)
        |SELECT col_a, col_b, CAST(n AS BIGINT) AS n,
        |       round(CAST(num AS DOUBLE)
        |             / NULLIF(sqrt(CAST(da AS DOUBLE) * CAST(db AS DOUBLE)), 0), 4) AS r
        |FROM pairs""".stripMargin,
    // DW replay: the q147 fit formulas verbatim (4dp slope/intercept),
    // residuals in integer micro-units, exact long DW sums.
    "q205_durbin_watson" ->
      """WITH series AS (
        |  SELECT l_returnflag AS datasourceId,
        |         CAST(year(l_shipdate) AS BIGINT) AS x,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1, 2
        |),
        |m AS (
        |  SELECT datasourceId, CAST(count(*) AS HUGEINT) AS n,
        |         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |         CAST(sum(x*y) AS HUGEINT) AS sxy, CAST(sum(x*x) AS HUGEINT) AS sxx
        |  FROM series GROUP BY 1
        |),
        |f AS (
        |  SELECT datasourceId,
        |         round(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE), 4) AS slope,
        |         round((CAST(sy AS DOUBLE)
        |             - (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE))
        |               * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 4) AS intercept
        |  FROM m WHERE n >= 2 AND n*sxx - sx*sx > 0
        |),
        |e AS (
        |  SELECT s.datasourceId, s.x,
        |         CAST(round((CAST(s.y AS DOUBLE)
        |               - (f.intercept + f.slope * CAST(s.x AS DOUBLE))) * 1e6) AS BIGINT) AS ei
        |  FROM series s JOIN f USING (datasourceId)
        |),
        |w AS (
        |  SELECT datasourceId, ei,
        |         ei - lag(ei) OVER (PARTITION BY datasourceId ORDER BY x) AS de
        |  FROM e
        |)
        |SELECT datasourceId, CAST(count(*) AS BIGINT) AS n_points,
        |       round(CAST(sum(de * de) AS DOUBLE)
        |             / NULLIF(CAST(sum(ei * ei) AS DOUBLE), 0), 4) AS dw
        |FROM w GROUP BY 1""".stripMargin,
    // Drift replay: same quantized per-(dim, parity) exact sums, same
    // pooled-σ drift, rank over the rounded drift.
    "q206_embedding_drift" ->
      """WITH e AS (
        |  SELECT vec_id % 2 AS g, u.pos, u.v
        |  FROM (
        |    SELECT vec_id,
        |           unnest(list_transform(list_zip(embedding, range(1, len(embedding) + 1)),
        |             z -> struct_pack(pos := z[2] - 1,
        |                              v := CAST(round(CAST(z[1] AS DOUBLE) * 1000) AS BIGINT)))) AS u
        |    FROM embeddings
        |  )
        |),
        |s AS (
        |  SELECT pos,
        |         CAST(count(*) FILTER (g = 0) AS BIGINT) AS n_a,
        |         CAST(sum(v) FILTER (g = 0) AS BIGINT) AS sa,
        |         CAST(sum(v * v) FILTER (g = 0) AS BIGINT) AS qa,
        |         CAST(count(*) FILTER (g <> 0) AS BIGINT) AS n_b,
        |         CAST(sum(v) FILTER (g <> 0) AS BIGINT) AS sb,
        |         CAST(sum(v * v) FILTER (g <> 0) AS BIGINT) AS qb
        |  FROM e GROUP BY 1 HAVING count(*) FILTER (g = 0) > 1 AND count(*) FILTER (g <> 0) > 1
        |),
        |v AS (
        |  SELECT pos, n_a, n_b,
        |         round(CAST(sa AS DOUBLE) / n_a, 4) AS mean_a,
        |         round(CAST(sb AS DOUBLE) / n_b, 4) AS mean_b,
        |         (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / n_a) / (n_a - 1) AS va,
        |         (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / n_b) / (n_b - 1) AS vb,
        |         CAST(sa AS DOUBLE) / n_a - CAST(sb AS DOUBLE) / n_b AS gap
        |  FROM s
        |),
        |dr AS (
        |  SELECT pos, n_a, n_b, mean_a, mean_b,
        |         round(abs(gap) / NULLIF(sqrt(((n_a - 1) * va + (n_b - 1) * vb)
        |                                      / (n_a + n_b - 2)), 0), 4) AS drift
        |  FROM v
        |)
        |SELECT pos, n_a, n_b, mean_a, mean_b, drift,
        |       CAST(rank() OVER (ORDER BY drift DESC NULLS LAST, pos) AS BIGINT) AS rank
        |FROM dr""".stripMargin,
    // ANOVA replay: same per-group exact sums, same algebraic
    // SSB/SSW identities in the same double op order.
    "q207_anova" ->
      """WITH g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)
        |                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS q
        |  FROM events WHERE value IS NOT NULL GROUP BY 1
        |),
        |t AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
        |         sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS sb,
        |         CAST(sum(s) AS BIGINT) AS S, CAST(sum(q) AS BIGINT) AS Q
        |  FROM g
        |),
        |m AS (
        |  SELECT k, n,
        |         sb - CAST(S AS DOUBLE) * CAST(S AS DOUBLE) / n AS ssb,
        |         CAST(Q AS DOUBLE) - sb AS ssw,
        |         CAST(Q AS DOUBLE) - CAST(S AS DOUBLE) * CAST(S AS DOUBLE) / n AS sst
        |  FROM t
        |)
        |SELECT k, n,
        |       round((ssb / (k - 1))
        |             / CASE WHEN ssw <= 0 OR n <= k THEN NULL
        |                    ELSE ssw / (n - k) END, 4) AS f_stat,
        |       round(ssb / CASE WHEN sst <= 0 THEN NULL ELSE sst END, 4) AS eta_sq
        |FROM m""".stripMargin,
    // Welch replay: same exact sums, same mean/variance/t/df ops.
    "q208_welch" ->
      """WITH s AS (
        |  SELECT
        |    CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n1,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) FILTER (event_type = 'click') AS BIGINT) AS s1,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT))
        |         FILTER (event_type = 'click') AS BIGINT) AS q1,
        |    CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n2,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) FILTER (event_type = 'view') AS BIGINT) AS s2,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT))
        |         FILTER (event_type = 'view') AS BIGINT) AS q2
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')
        |),
        |v AS (
        |  SELECT n1, n2, s1, s2,
        |         (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1) / (n1 - 1) AS v1,
        |         (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2) / (n2 - 1) AS v2
        |  FROM s WHERE n1 > 1 AND n2 > 1
        |),
        |e AS (SELECT *, v1 / n1 + v2 / n2 AS se2 FROM v)
        |SELECT n1, n2,
        |       round(CAST(s1 AS DOUBLE) / n1 / 100.0, 4) AS mean1,
        |       round(CAST(s2 AS DOUBLE) / n2 / 100.0, 4) AS mean2,
        |       round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
        |             / CASE WHEN se2 <= 0 THEN NULL ELSE sqrt(se2) END, 4) AS t,
        |       round(se2 * se2 / CASE WHEN se2 <= 0 THEN NULL
        |             ELSE (v1 / n1) * (v1 / n1) / (n1 - 1)
        |                + (v2 / n2) * (v2 / n2) / (n2 - 1) END, 4) AS df
        |FROM e""".stripMargin,
    // Trending replay: same (day, item) grain, same tie-broken ranks,
    // previous-appearance lag per item.
    "q209_trending" ->
      """WITH c AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |         event_type AS item, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |),
        |r AS (
        |  SELECT day, item, n,
        |         CAST(row_number() OVER (PARTITION BY day ORDER BY n DESC, item) AS BIGINT) AS rnk
        |  FROM c
        |),
        |l AS (
        |  SELECT day, item, n, rnk,
        |         lag(rnk) OVER (PARTITION BY item ORDER BY day) AS prev_rnk
        |  FROM r
        |)
        |SELECT day, item, n, rnk, prev_rnk, prev_rnk - rnk AS delta
        |FROM l WHERE rnk <= 3""".stripMargin,
    // MDE replay: welch-shape exact sums, the same fixed z literals.
    "q210_mde" ->
      """WITH s AS (
        |  SELECT
        |    CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n1,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) FILTER (event_type = 'click') AS BIGINT) AS s1,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT))
        |         FILTER (event_type = 'click') AS BIGINT) AS q1,
        |    CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n2,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) FILTER (event_type = 'view') AS BIGINT) AS s2,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT))
        |         FILTER (event_type = 'view') AS BIGINT) AS q2
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')
        |),
        |v AS (
        |  SELECT n1, n2, s1,
        |         (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1) / (n1 - 1) AS v1,
        |         (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2) / (n2 - 1) AS v2
        |  FROM s WHERE n1 > 1 AND n2 > 1
        |),
        |e AS (
        |  SELECT n1, n2, CAST(s1 AS DOUBLE) / n1 AS m1,
        |         sqrt(v1 / n1 + v2 / n2) AS se
        |  FROM v
        |)
        |SELECT n1, n2, round(m1 / 100.0, 4) AS mean1, round(se / 100.0, 4) AS se,
        |       round((1.959964 + 0.841621) * se / 100.0, 4) AS mde_abs,
        |       round((1.959964 + 0.841621) * se
        |             / CASE WHEN m1 = 0 THEN NULL ELSE m1 END, 4) AS mde_rel
        |FROM e""".stripMargin,
    // Backtest replay: the q120 EWMA closed form, lagged one step,
    // errors in integer micro-units before the sums.
    "q211_ewma_backtest" ->
      """WITH series AS (
        |  SELECT l_returnflag AS datasourceId,
        |         CAST(year(l_shipdate) AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1, 2
        |),
        |r AS (
        |  SELECT datasourceId, x, y,
        |         row_number() OVER (PARTITION BY datasourceId ORDER BY x) AS rn
        |  FROM series
        |),
        |g AS (
        |  SELECT *, CASE WHEN rn = 1 THEN y * 2.0 ELSE y * pow(2.0, rn - 1) END AS gg
        |  FROM r
        |),
        |sm AS (
        |  SELECT datasourceId, x, y,
        |         sum(gg) OVER (PARTITION BY datasourceId ORDER BY x
        |                       ROWS UNBOUNDED PRECEDING) / pow(2.0, rn) AS s
        |  FROM g
        |),
        |f AS (
        |  SELECT datasourceId, x, y,
        |         lag(s) OVER (PARTITION BY datasourceId ORDER BY x) AS fc
        |  FROM sm
        |),
        |e AS (
        |  SELECT datasourceId,
        |         CAST(abs(round((CAST(y AS DOUBLE) - fc) * 1e6)) AS BIGINT) AS errU,
        |         CASE WHEN CAST(y AS DOUBLE) > 0
        |           THEN CAST(abs(round((CAST(y AS DOUBLE) - fc) / CAST(y AS DOUBLE) * 1e6)) AS BIGINT)
        |         END AS apeU
        |  FROM f WHERE fc IS NOT NULL
        |)
        |SELECT datasourceId, CAST(count(*) AS BIGINT) AS n_forecasts,
        |       CAST(count(*) FILTER (apeU IS NULL) AS BIGINT) AS n_skipped,
        |       round(CAST(sum(errU) AS DOUBLE) / count(*) / 1e6, 4) AS mae,
        |       round(CAST(sum(apeU) AS DOUBLE)
        |             / NULLIF(CAST(count(apeU) AS DOUBLE), 0) / 1e6, 4) AS mape
        |FROM e GROUP BY 1""".stripMargin,
    // Confusion replay: the q34 brute-force ranking on the %10 query
    // sample, labels attached per side, label-partitioned share.
    "q212_label_confusion" ->
      s"""WITH $EmbSql,
         |qs AS (SELECT vec_id AS query_id, q AS qq, n AS qn FROM nrm WHERE vec_id % 10 = 0),
         |nn AS (
         |  SELECT query_id, id FROM (
         |    SELECT q.query_id, c.vec_id AS id,
         |           row_number() OVER (PARTITION BY q.query_id ORDER BY
         |             CAST(list_sum(list_transform(range(1, 65), i -> c.q[i] * q.qq[i])) AS DOUBLE)
         |               / (c.n * q.qn) DESC, c.vec_id) AS rank
         |    FROM nrm c CROSS JOIN qs q WHERE c.vec_id != q.query_id
         |  ) WHERE rank <= 5
         |),
         |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS l FROM embeddings),
         |m AS (
         |  SELECT lq.l AS label_q, ln.l AS label_n, CAST(count(*) AS BIGINT) AS n
         |  FROM nn JOIN lab lq ON lq.vec_id = nn.query_id
         |          JOIN lab ln ON ln.vec_id = nn.id
         |  GROUP BY 1, 2
         |)
         |SELECT label_q, label_n, n,
         |       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY label_q), 4) AS share,
         |       label_q <> label_n AS hard_negative
         |FROM m""".stripMargin,
    // Outlier replay: the q71 centroid CTEs over the FULL set, cosine
    // to the OWN label's centroid, (cos asc, id) rank per label.
    "q213_centroid_outliers" ->
      s"""WITH $EmbSql,
         |tr AS (
         |  SELECT CAST(e.label AS BIGINT) AS lbl, n.vec_id, n.q, n.n
         |  FROM nrm n JOIN embeddings e ON n.vec_id = e.vec_id
         |  WHERE n.n > 0
         |),
         |sums AS (
         |  SELECT lbl, i AS pos, CAST(sum(q[i]) AS BIGINT) AS s
         |  FROM tr CROSS JOIN (SELECT unnest(range(1, 65)) AS i) dims
         |  GROUP BY 1, 2
         |),
         |cents AS (
         |  SELECT lbl, cv,
         |         sqrt(CAST(list_sum(list_transform(cv, x -> x * x)) AS DOUBLE)) AS cn
         |  FROM (SELECT lbl, list(s ORDER BY pos) AS cv FROM sums GROUP BY lbl)
         |  WHERE sqrt(CAST(list_sum(list_transform(cv, x -> x * x)) AS DOUBLE)) > 0
         |),
         |scored AS (
         |  SELECT tr.lbl AS label, tr.vec_id,
         |         round(CAST(list_sum(list_transform(range(1, 65), i -> tr.q[i] * c.cv[i])) AS DOUBLE)
         |               / (tr.n * c.cn), 4) AS cos
         |  FROM tr JOIN cents c ON c.lbl = tr.lbl
         |),
         |rk AS (
         |  SELECT label, vec_id, cos,
         |         CAST(row_number() OVER (PARTITION BY label ORDER BY cos ASC, vec_id) AS BIGINT) AS rank
         |  FROM scored
         |)
         |SELECT label, vec_id, cos, rank FROM rk WHERE rank <= 5""".stripMargin,
    // Diff-CI replay: the q173 Poisson draw verbatim, four exact-long
    // states per rep, percentile band over replicate diffs.
    "q214_bootstrap_diff" ->
      s"""WITH ev AS (
         |  SELECT event_type AS g, CAST(event_id AS VARCHAR) AS id,
         |         CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events
         |  WHERE value IS NOT NULL AND event_id IS NOT NULL
         |    AND event_type IN ('click', 'view')
         |),
         |r AS (
         |  SELECT g, cents,
         |         ${HexValSql("md5(id || ':boot:' || CAST(rep AS VARCHAR))", 1, 6)} AS b,
         |         rep
         |  FROM ev CROSS JOIN (SELECT unnest(range(0, 64)) AS rep)
         |),
         |w AS (
         |  SELECT g, rep, cents,
         |         CASE WHEN b < 6171992 THEN 0 WHEN b < 12343985 THEN 1
         |              WHEN b < 15429982 THEN 2 WHEN b < 16458647 THEN 3
         |              WHEN b < 16715813 THEN 4 WHEN b < 16767247 THEN 5
         |              WHEN b < 16775819 THEN 6 WHEN b < 16777044 THEN 7
         |              ELSE 8 END AS w
         |  FROM r
         |),
         |pr AS (
         |  SELECT rep,
         |         sum(CASE WHEN g = 'click' THEN w * cents ELSE 0 END) AS wsA,
         |         sum(CASE WHEN g = 'click' THEN w ELSE 0 END) AS wnA,
         |         sum(CASE WHEN g <> 'click' THEN w * cents ELSE 0 END) AS wsB,
         |         sum(CASE WHEN g <> 'click' THEN w ELSE 0 END) AS wnB
         |  FROM w GROUP BY 1 HAVING sum(CASE WHEN g = 'click' THEN w ELSE 0 END) > 0
         |     AND sum(CASE WHEN g <> 'click' THEN w ELSE 0 END) > 0
         |),
         |m AS (
         |  SELECT CAST(wsB AS DOUBLE) / CAST(wnB AS DOUBLE) / 100.0
         |         - CAST(wsA AS DOUBLE) / CAST(wnA AS DOUBLE) / 100.0 AS diff
         |  FROM pr
         |),
         |ci AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_reps,
         |         round(quantile_cont(diff, 0.025), 4) AS ci_lo,
         |         round(quantile_cont(diff, 0.975), 4) AS ci_hi
         |  FROM m
         |),
         |base AS (
         |  SELECT CAST(count(*) FILTER (g = 'click') AS BIGINT) AS n1,
         |         CAST(count(*) FILTER (g <> 'click') AS BIGINT) AS n2,
         |         round(CAST(sum(cents) FILTER (g <> 'click') AS DOUBLE)
         |               / count(*) FILTER (g <> 'click') / 100.0
         |             - CAST(sum(cents) FILTER (g = 'click') AS DOUBLE)
         |               / count(*) FILTER (g = 'click') / 100.0, 4) AS diff
         |  FROM ev
         |)
         |SELECT n1, n2, diff, n_reps, ci_lo, ci_hi
         |FROM base CROSS JOIN ci""".stripMargin,
    // PSI replay: same 4dp-rounded reference deciles, same v > b bin
    // rule, same exact shares and 6dp contributions.
    "q215_psi" ->
      """WITH c AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |         event_type = 'view' AS is_ref
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('view', 'click')
        |),
        |b AS (
        |  SELECT list_transform(
        |           quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
        |           x -> round(x, 4)) AS bs
        |  FROM c WHERE is_ref
        |),
        |binned AS (
        |  SELECT CAST(list_sum(list_transform(bs,
        |           x -> CASE WHEN v > x THEN 1 ELSE 0 END)) AS BIGINT) AS bin,
        |         is_ref
        |  FROM c CROSS JOIN b
        |),
        |t AS (
        |  SELECT bin,
        |         CAST(count(*) FILTER (is_ref) AS BIGINT) AS n_ref,
        |         CAST(count(*) FILTER (NOT is_ref) AS BIGINT) AS n_cur
        |  FROM binned GROUP BY 1
        |),
        |w AS (
        |  SELECT bin, n_ref, n_cur,
        |         CAST(n_ref AS DOUBLE) / sum(n_ref) OVER () AS pr,
        |         CAST(n_cur AS DOUBLE) / sum(n_cur) OVER () AS pc
        |  FROM t
        |),
        |x AS (
        |  SELECT bin, n_ref, n_cur, pr, pc,
        |         CASE WHEN n_ref = 0 OR n_cur = 0 THEN NULL
        |              ELSE round((pr - pc) * ln(pr / pc), 6) END AS contrib
        |  FROM w
        |)
        |SELECT bin, n_ref, n_cur, round(pr, 4) AS p_ref, round(pc, 4) AS p_cur,
        |       contrib, round(sum(contrib) OVER (), 4) AS psi
        |FROM x""".stripMargin,
    // AUC replay: the F27 integer 2·average-rank machinery, AUC =
    // 2U1 / (2·n_pos·n_neg).
    "q216_auc" ->
      """WITH p AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |         CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS c1,
        |         CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS c2
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')
        |  GROUP BY 1
        |),
        |r AS (
        |  SELECT c1, c2,
        |         2 * (sum(c1 + c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |              - (c1 + c2)) + (c1 + c2) + 1 AS r2
        |  FROM p
        |),
        |s AS (
        |  SELECT CAST(sum(c1) AS BIGINT) AS n_pos,
        |         CAST(sum(c2) AS BIGINT) AS n_neg,
        |         CAST(sum(c1 * r2) AS BIGINT) AS r2sum1
        |  FROM r
        |)
        |SELECT n_pos, n_neg,
        |       round(CAST(r2sum1 - n_pos * (n_pos + 1) AS DOUBLE)
        |             / CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
        |                    ELSE CAST(2 * n_pos * n_neg AS DOUBLE) END, 4) AS auc
        |FROM s""".stripMargin,
    // Gini replay: same value-grain tie-run closed form, HUGEINT
    // totals mirroring the decimal(38,0) sums.
    "q217_gini" ->
      """WITH p AS (
        |  SELECT CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars >= 0
        |  GROUP BY 1
        |),
        |r AS (
        |  SELECT v, c,
        |         sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c AS cb
        |  FROM p
        |),
        |s AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |         sum(CAST(v AS HUGEINT) * CAST(c AS HUGEINT)) AS t,
        |         sum(CAST(v AS HUGEINT) * (CAST(c AS HUGEINT) * CAST(cb AS HUGEINT)
        |             + CAST((c * (c + 1)) // 2 AS HUGEINT))) AS s2
        |  FROM r
        |)
        |SELECT n, CAST(t AS BIGINT) AS total,
        |       round((2.0 * CAST(s2 AS DOUBLE) - CAST(n + 1 AS DOUBLE) * CAST(t AS DOUBLE))
        |             / CASE WHEN n = 0 OR t = 0 THEN NULL
        |                    ELSE CAST(n AS DOUBLE) * CAST(t AS DOUBLE) END, 4) AS gini
        |FROM s""".stripMargin,
    // OLS replay: same exact HUGEINT cent moments, same Cramer
    // determinant expressions in identical double op order.
    "q218_ols2" ->
      """WITH m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS s1,
        |         sum(CAST(round(l_discount * 100) AS BIGINT)) AS s2,
        |         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
        |         sum(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT)) AS s11,
        |         sum(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS s12,
        |         sum(CAST(round(l_discount * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS s22,
        |         sum(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS s1y,
        |         sum(CAST(round(l_discount * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS s2y,
        |         sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS syy
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        |    AND l_discount IS NOT NULL
        |),
        |d AS (
        |  SELECT n, CAST(n AS DOUBLE) AS nn,
        |         CAST(s1 AS DOUBLE) AS d1, CAST(s2 AS DOUBLE) AS d2,
        |         CAST(sy AS DOUBLE) AS dy,
        |         CAST(s11 AS DOUBLE) AS d11, CAST(s12 AS DOUBLE) AS d12,
        |         CAST(s22 AS DOUBLE) AS d22,
        |         CAST(s1y AS DOUBLE) AS d1y, CAST(s2y AS DOUBLE) AS d2y,
        |         CAST(syy AS DOUBLE) AS dyy
        |  FROM m
        |),
        |c AS (
        |  SELECT n, nn, dy, d1y, d2y, dyy,
        |         nn * (d11 * d22 - d12 * d12) - d1 * (d1 * d22 - d12 * d2)
        |           + d2 * (d1 * d12 - d11 * d2) AS det,
        |         dy * (d11 * d22 - d12 * d12) - d1 * (d1y * d22 - d12 * d2y)
        |           + d2 * (d1y * d12 - d11 * d2y) AS det0,
        |         nn * (d1y * d22 - d12 * d2y) - dy * (d1 * d22 - d12 * d2)
        |           + d2 * (d1 * d2y - d1y * d2) AS det1,
        |         nn * (d11 * d2y - d1y * d12) - d1 * (d1 * d2y - d1y * d2)
        |           + dy * (d1 * d12 - d11 * d2) AS det2,
        |         dyy - dy * dy / nn AS sst
        |  FROM d
        |),
        |b AS (
        |  SELECT n, dy, d1y, d2y, dyy, sst,
        |         CASE WHEN abs(det) < 1e-9 * nn THEN NULL ELSE det0 / det END AS b0,
        |         CASE WHEN abs(det) < 1e-9 * nn THEN NULL ELSE det1 / det END AS b1,
        |         CASE WHEN abs(det) < 1e-9 * nn THEN NULL ELSE det2 / det END AS b2
        |  FROM c
        |)
        |SELECT n, round(b0 / 100.0, 6) AS b0, round(b1, 6) AS b1,
        |       round(b2, 6) AS b2,
        |       round(1.0 - (dyy - b0 * dy - b1 * d1y - b2 * d2y)
        |             / CASE WHEN sst <= 0 THEN NULL ELSE sst END, 4) AS r2
        |FROM b""".stripMargin,
    // Partial-correlation replay: F29's exact HUGEINT moments, the
    // same unrounded r's feeding the partial formula.
    "q219_partial_corr" ->
      """WITH m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sx,
        |         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
        |         sum(CAST(round(l_discount * 100) AS BIGINT)) AS sz,
        |         sum(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT)) AS sxx,
        |         sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS syy,
        |         sum(CAST(round(l_discount * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS szz,
        |         sum(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy,
        |         sum(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS sxz,
        |         sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS syz
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL
        |),
        |r AS (
        |  SELECT n,
        |         CAST(n * sxy - sx * sy AS DOUBLE)
        |           / CASE WHEN sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)) = 0
        |                  THEN NULL
        |                  ELSE sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)) END AS rxy,
        |         CAST(n * sxz - sx * sz AS DOUBLE)
        |           / CASE WHEN sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * szz - sz * sz AS DOUBLE)) = 0
        |                  THEN NULL
        |                  ELSE sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * szz - sz * sz AS DOUBLE)) END AS rxz,
        |         CAST(n * syz - sy * sz AS DOUBLE)
        |           / CASE WHEN sqrt(CAST(n * syy - sy * sy AS DOUBLE) * CAST(n * szz - sz * sz AS DOUBLE)) = 0
        |                  THEN NULL
        |                  ELSE sqrt(CAST(n * syy - sy * sy AS DOUBLE) * CAST(n * szz - sz * sz AS DOUBLE)) END AS ryz
        |  FROM m
        |),
        |p AS (
        |  SELECT n, rxy, rxz, ryz,
        |         sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)) AS den
        |  FROM r
        |)
        |SELECT n, round(rxy, 4) AS r_xy, round(rxz, 4) AS r_xz,
        |       round(ryz, 4) AS r_yz,
        |       round((rxy - rxz * ryz)
        |             / CASE WHEN den = 0 THEN NULL ELSE den END, 4) AS r_partial
        |FROM p""".stripMargin,
    // Cohort-LTV replay: same first-seen min window, same integer-cent
    // revenue, same cohort-partitioned cumulative.
    "q220_cohort_ltv" ->
      """WITH f AS (
        |  SELECT user_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |         COALESCE(CAST(round(value * 100) AS BIGINT), 0) AS c
        |  FROM events
        |),
        |w AS (
        |  SELECT user_id, d, c, min(d) OVER (PARTITION BY user_id) AS fd
        |  FROM f
        |),
        |g AS (
        |  SELECT fd // 7 AS cohort_week, d // 7 - fd // 7 AS age_weeks,
        |         user_id, c
        |  FROM w
        |),
        |sizes AS (
        |  SELECT cohort_week, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM g GROUP BY 1
        |),
        |rev AS (
        |  SELECT cohort_week, age_weeks, CAST(sum(c) AS BIGINT) AS cents
        |  FROM g GROUP BY 1, 2
        |),
        |cum AS (
        |  SELECT r.cohort_week, r.age_weeks, s.n_users, r.cents,
        |         sum(r.cents) OVER (PARTITION BY r.cohort_week ORDER BY r.age_weeks
        |                            ROWS UNBOUNDED PRECEDING) AS cumc
        |  FROM rev r JOIN sizes s USING (cohort_week)
        |)
        |SELECT cohort_week, age_weeks, n_users,
        |       round(CAST(cents AS DOUBLE) / 100.0, 4) AS revenue,
        |       round(CAST(cumc AS DOUBLE) / 100.0 / n_users, 4) AS cum_ltv
        |FROM cum""".stripMargin,
    // Jaro-Winkler linkage replay: DuckDB's native scorer IS the
    // contract the graft expression is fuzz-pinned to; same block key,
    // same (a < b) order, same 4dp-rounded keep test. (The 512 block
    // cap cannot fire at oracle scale — blocks are ≤ 8 names.)
    "q221_jw_blocked" ->
      """WITH names AS (
        |  SELECT p_name, string_split(p_name, ' ')[2] AS block
        |  FROM part GROUP BY 1, 2
        |)
        |SELECT x.p_name AS name_a, y.p_name AS name_b,
        |       round(jaro_winkler_similarity(x.p_name, y.p_name), 4) AS jw
        |FROM names x JOIN names y ON x.block = y.block AND x.p_name < y.p_name
        |WHERE round(jaro_winkler_similarity(x.p_name, y.p_name), 4) >= 0.8""".stripMargin,
    // Degree power-law replay: same doubled edge list, same micro-nat
    // integer logs into the exact-sum trend (the q147/q176 contract).
    "q222_degree_powerlaw" ->
      s"""WITH $MinhashPairsSql,
         |e AS (
         |  SELECT idA AS id FROM lshpairs
         |  UNION ALL SELECT idB FROM lshpairs
         |),
         |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
         |hist AS (SELECT deg, CAST(count(*) AS BIGINT) AS cnt FROM deg GROUP BY 1),
         |xy AS (
         |  SELECT CAST(round(ln(deg) * 1e6) AS BIGINT) AS x,
         |         CAST(round(ln(cnt) * 1e6) AS BIGINT) AS y
         |  FROM hist
         |),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         |         sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
         |         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
         |         sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
         |  FROM xy
         |),
         |f AS (
         |  SELECT round(CAST(n * sxy - sx * sy AS DOUBLE)
         |               / CAST(n * sxx - sx * sx AS DOUBLE), 4) AS alpha,
         |         CASE WHEN n * syy - sy * sy > 0 THEN
         |           round(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
         |                 / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 4)
         |         END AS r2
         |  FROM m WHERE n >= 2 AND n * sxx - sx * sx > 0
         |),
         |s AS (
         |  SELECT CAST(sum(cnt) AS BIGINT) AS n_nodes,
         |         CAST(sum(deg * cnt) // 2 AS BIGINT) AS n_edges,
         |         CAST(max(deg) AS BIGINT) AS max_degree,
         |         CAST(count(*) AS BIGINT) AS n_degrees
         |  FROM hist
         |)
         |SELECT n_nodes, n_edges, max_degree, n_degrees, alpha, r2
         |FROM s LEFT JOIN f ON TRUE""".stripMargin,
    // Canonical-pick replay: the q47 component walk joined to the q37
    // quality integer, keeper by (quality desc, id) rank.
    "q223_canonical_pick" ->
      s"""WITH RECURSIVE $MinhashPairsSql,
         |edges AS (
         |  SELECT idA AS src, idB AS dst FROM lshpairs
         |  UNION ALL
         |  SELECT idB AS src, idA AS dst FROM lshpairs
         |),
         |walk(id, comp) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.src, w.comp FROM edges e JOIN walk w ON e.dst = w.id
         |),
         |comps AS (SELECT id, min(comp) AS comp FROM walk GROUP BY id),
         |base AS (
         |  SELECT doc_id, string_split(text, ' ') AS w,
         |         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT) AS n_tokens
         |  FROM documents
         |),
         |q AS (
         |  SELECT doc_id,
         |         CAST((CAST(4 * least(n_tokens, 100) * n_tokens
         |                    + 300 * len(list_distinct(w))
         |                    + 300 * (n_tokens - len(list_filter(w, x -> x = 'the'))
         |                                      - len(list_filter(w, x -> x = 'a'))) AS BIGINT)
         |                * 20000 + 1000 * n_tokens) // (2000 * n_tokens) AS BIGINT) AS qi
         |  FROM base
         |),
         |r AS (
         |  SELECT c.comp, c.id, q.qi,
         |         row_number() OVER (PARTITION BY c.comp ORDER BY q.qi DESC, c.id) AS rn,
         |         count(*) OVER (PARTITION BY c.comp) AS nm
         |  FROM comps c JOIN q ON q.doc_id = c.id
         |)
         |SELECT comp, CAST(nm AS BIGINT) AS n_members, id AS keeper_id,
         |       CAST(qi AS DOUBLE) / 10000.0 AS keeper_quality
         |FROM r WHERE rn = 1""".stripMargin,
    // Streaming-CMS replay: rebuild the identical per-window counters
    // (q91's md5 bucket arithmetic) over the FINALIZED windows (q60's
    // watermark rule), estimate = min over the d rows.
    "q224_stream_cms" ->
      s"""WITH ev AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
         |mx AS (SELECT max(ts) AS mt FROM ev),
         |fin AS (
         |  SELECT date_trunc('hour', ts) AS ws, event_type FROM ev, mx
         |  WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= mt - INTERVAL 2 HOUR
         |),
         |wn AS (SELECT ws, CAST(count(*) AS BIGINT) AS n FROM fin GROUP BY 1),
         |rows_i AS (SELECT unnest(range(0, 4)) AS ci),
         |bk AS (
         |  SELECT ws, ci, ${HexValSql("md5(ci || ':' || event_type)", 1, 6)} % 1024 AS b,
         |         CAST(count(*) AS BIGINT) AS cnt
         |  FROM fin CROSS JOIN rows_i GROUP BY 1, 2, 3
         |),
         |types AS (SELECT DISTINCT event_type FROM ev),
         |tb AS (
         |  SELECT wn.ws, wn.n, t.event_type, ci,
         |         ${HexValSql("md5(ci || ':' || t.event_type)", 1, 6)} % 1024 AS b
         |  FROM wn CROSS JOIN types t CROSS JOIN rows_i
         |)
         |SELECT strftime(tb.ws, '%Y-%m-%d %H:%M:%S') AS window_start,
         |       tb.n, tb.event_type,
         |       CAST(min(coalesce(bk.cnt, 0)) AS BIGINT) AS cms_n
         |FROM tb
         |LEFT JOIN bk ON bk.ws = tb.ws AND bk.ci = tb.ci AND bk.b = tb.b
         |GROUP BY 1, 2, 3""".stripMargin,
    // NDCG replay: q191's exact/approx rank tables, per-rank discount
    // gains quantized once to integer micro-units, exact long sums.
    "q225_ndcg" ->
      s"""WITH $EmbSql,
         |$LshSql,
         |qs AS (SELECT vec_id AS query_id, q AS qq, n AS qn FROM nrm WHERE vec_id % 50 = 0),
         |ex AS (
         |  SELECT query_id, id FROM (
         |    SELECT q.query_id, c.vec_id AS id,
         |           row_number() OVER (PARTITION BY q.query_id ORDER BY
         |             CAST(list_sum(list_transform(range(1, 65), i -> c.q[i] * q.qq[i])) AS DOUBLE)
         |               / (c.n * q.qn) DESC, c.vec_id) AS rank
         |    FROM nrm c CROSS JOIN qs q WHERE c.vec_id != q.query_id
         |  ) WHERE rank <= 5
         |),
         |qb AS (SELECT w.vec_id AS query_id, w.q AS qq, w.n AS qn, w.bucket
         |       FROM withb w WHERE w.vec_id % 50 = 0),
         |ap AS (
         |  SELECT query_id, id, rank FROM (
         |    SELECT q.query_id, c.vec_id AS id,
         |           row_number() OVER (PARTITION BY q.query_id ORDER BY
         |             CAST(list_sum(list_transform(range(1, 65), i -> c.q[i] * q.qq[i])) AS DOUBLE)
         |               / (c.n * q.qn) DESC, c.vec_id) AS rank
         |    FROM withb c JOIN qb q USING (bucket) WHERE c.vec_id != q.query_id
         |  ) WHERE rank <= 5
         |),
         |dcg AS (
         |  SELECT a.query_id,
         |         CAST(sum(CASE WHEN e.id IS NOT NULL
         |              THEN CAST(round(1e6 / (ln(a.rank + 1.0) / ln(2.0))) AS BIGINT)
         |              ELSE 0 END) AS BIGINT) AS dcg_u
         |  FROM ap a LEFT JOIN ex e ON e.query_id = a.query_id AND e.id = a.id
         |  GROUP BY 1
         |),
         |per AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact FROM ex GROUP BY 1),
         |ideal AS (
         |  SELECT query_id, n_exact,
         |         CAST(list_sum(list_transform(range(1, CAST(n_exact AS INT) + 1),
         |              r -> CAST(round(1e6 / (ln(r + 1.0) / ln(2.0))) AS BIGINT))) AS BIGINT) AS idcg_u
         |  FROM per
         |),
         |j AS (
         |  SELECT i.query_id, i.n_exact, i.idcg_u, coalesce(d.dcg_u, 0) AS d_u
         |  FROM ideal i LEFT JOIN dcg d USING (query_id)
         |),
         |tot AS (SELECT sum(d_u) AS td, sum(idcg_u) AS ti FROM j)
         |SELECT query_id, n_exact,
         |       round(CAST(d_u AS DOUBLE) / idcg_u, 4) AS ndcg,
         |       round(CAST(tot.td AS DOUBLE) / tot.ti, 4) AS micro_ndcg
         |FROM j CROSS JOIN tot""".stripMargin,
    // Paired-uplift replay: controls collapsed to (user, ts) grain,
    // DuckDB's native ASOF backward pick, same exact cent sums.
    "q226_paired_uplift" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |),
        |treat AS (
        |  SELECT user_id, ts, cents AS tc FROM ev
        |  WHERE event_type = 'click' AND value IS NOT NULL
        |),
        |ctrl AS (
        |  SELECT user_id, ts, max(cents) AS cc FROM ev
        |  WHERE event_type = 'view' AND value IS NOT NULL GROUP BY 1, 2
        |),
        |m AS (
        |  SELECT t.tc, c.cc
        |  FROM treat t ASOF LEFT JOIN ctrl c
        |    ON t.user_id = c.user_id AND t.ts >= c.ts
        |),
        |s AS (
        |  SELECT CAST(count(cc) AS BIGINT) AS n_pairs,
        |         CAST(count(*) FILTER (cc IS NULL) AS BIGINT) AS n_unmatched,
        |         CAST(sum(CAST(tc - cc AS HUGEINT)) AS HUGEINT) AS s,
        |         CAST(sum(CAST(tc - cc AS HUGEINT) * CAST(tc - cc AS HUGEINT)) AS HUGEINT) AS q
        |  FROM m
        |),
        |v AS (
        |  SELECT n_pairs, n_unmatched, s,
        |         (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_pairs)
        |           / (n_pairs - 1) AS var
        |  FROM s WHERE n_pairs > 1
        |)
        |SELECT n_pairs, n_unmatched,
        |       round(CAST(s AS DOUBLE) / n_pairs / 100.0, 4) AS mean_diff,
        |       round((CAST(s AS DOUBLE) / n_pairs)
        |             / CASE WHEN var <= 0 THEN NULL
        |                    ELSE sqrt(var / n_pairs) END, 4) AS t
        |FROM v""".stripMargin,
    // ECE replay: q183's quality + Gopher pass, exact 1e-4 confidence
    // units, 6dp contributions, 4dp bin-table total.
    "q227_ece" ->
      s"""WITH $GopherDocSql,
         |base AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS w,
         |         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT)
         |           AS n_tokens
         |  FROM documents
         |),
         |q AS (
         |  SELECT doc_id,
         |         CAST((CAST(4 * least(n_tokens, 100) * n_tokens
         |                    + 300 * len(list_distinct(w))
         |                    + 300 * (n_tokens - len(list_filter(w, x -> x = 'the'))
         |                                      - len(list_filter(w, x -> x = 'a')))
         |               AS BIGINT)
         |               * 20000 + 1000 * n_tokens) // (2000 * n_tokens) AS BIGINT) AS qi
         |  FROM base
         |),
         |g AS (SELECT doc_id, (${gopherPassPred(2)}) AS gopher_pass FROM d),
         |b AS (
         |  SELECT CAST(least(CAST(floor(CAST(qi AS DOUBLE) / 10000.0 * 10) AS BIGINT), 9) AS BIGINT) AS bin,
         |         CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(qi) AS BIGINT) AS sc,
         |         CAST(count(CASE WHEN gopher_pass THEN 1 END) AS BIGINT) AS hits
         |  FROM q JOIN g USING (doc_id) GROUP BY 1
         |),
         |w2 AS (
         |  SELECT bin, n, sc, hits, sum(n) OVER () AS nn,
         |         CAST(sc AS DOUBLE) / n / 10000.0 AS conf,
         |         CAST(hits AS DOUBLE) / n AS acc
         |  FROM b
         |),
         |c AS (
         |  SELECT bin, n, conf, acc,
         |         round(CAST(n AS DOUBLE) / nn * abs(acc - conf), 6) AS contrib
         |  FROM w2
         |)
         |SELECT bin, n, round(conf, 4) AS conf_avg, round(acc, 4) AS acc,
         |       contrib, round(sum(contrib) OVER (), 4) AS ece
         |FROM c""".stripMargin,
    // Decay-score replay: same integer day ages, same exact
    // shift-based 2^-age micro weights, HUGEINT contribution sums.
    "q228_decay_score" ->
      """WITH f AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |         CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL
        |),
        |a AS (SELECT max(d) AS t FROM f),
        |w AS (
        |  SELECT user_id, c,
        |         CASE WHEN t - d <= 62
        |              THEN CAST(round(1e6 / CAST(CAST(1 AS BIGINT) << CAST(t - d AS INT) AS DOUBLE)) AS BIGINT)
        |              ELSE 0 END AS wu
        |  FROM f CROSS JOIN a
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |       round(CAST(sum(CAST(c AS HUGEINT) * CAST(wu AS HUGEINT)) AS DOUBLE)
        |             / 1e6 / 100.0, 4) AS score
        |FROM w GROUP BY 1""".stripMargin,
    // Burst-audit replay: same half-open trailing RANGE frame, same
    // (count desc, t) argmax total order.
    "q229_burst_audit" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
        |),
        |c AS (
        |  SELECT user_id, us,
        |         count(*) OVER (PARTITION BY user_id ORDER BY us
        |                        RANGE BETWEEN 59999999 PRECEDING AND CURRENT ROW) AS cnt,
        |         count(*) OVER (PARTITION BY user_id) AS n_events
        |  FROM e
        |),
        |r AS (
        |  SELECT user_id, n_events, cnt, us,
        |         row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, us) AS rnk
        |  FROM c
        |)
        |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
        |       CAST(cnt AS BIGINT) AS peak, us AS peak_t_us
        |FROM r WHERE rnk = 1 AND cnt >= 2""".stripMargin,
    // STL-lite replay: same partial centered frames, same micro-unit
    // quantizations, HUGEINT residual moments.
    "q230_seasonal_decompose" ->
      """WITH s AS (
        |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2
        |),
        |t AS (
        |  SELECT event_type, day, y,
        |         CAST(round(CAST(sum(y) OVER fr AS DOUBLE) / count(*) OVER fr * 1e6) AS BIGINT) AS tu
        |  FROM s WINDOW fr AS (PARTITION BY event_type ORDER BY day
        |                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |),
        |b AS (SELECT event_type, day % 7 AS phase, y * 1000000 - tu AS du FROM t),
        |se AS (
        |  SELECT event_type, phase, CAST(count(*) AS BIGINT) AS n,
        |         CAST(round(CAST(sum(CAST(du AS HUGEINT)) AS DOUBLE) / count(*)) AS BIGINT) AS su
        |  FROM b GROUP BY 1, 2
        |),
        |rs AS (
        |  SELECT b.event_type,
        |         CAST(count(*) AS BIGINT) AS rn,
        |         sum(CAST(b.du - se.su AS HUGEINT)) AS rsum,
        |         sum(CAST(b.du - se.su AS HUGEINT) * CAST(b.du - se.su AS HUGEINT)) AS rq
        |  FROM b JOIN se ON se.event_type = b.event_type AND se.phase = b.phase
        |  GROUP BY 1
        |),
        |rr AS (
        |  SELECT event_type,
        |         CASE WHEN rn > 1 THEN
        |           round(sqrt((CAST(rq AS DOUBLE) - CAST(rsum AS DOUBLE) * CAST(rsum AS DOUBLE) / rn)
        |                      / (rn - 1)) / 1e6, 4) END AS resid_sd
        |  FROM rs
        |)
        |SELECT se.event_type, se.phase, se.n,
        |       round(CAST(se.su AS DOUBLE) / 1e6, 4) AS seasonal, rr.resid_sd
        |FROM se JOIN rr USING (event_type)""".stripMargin,
    // Item-cosine replay: same basket collapse, same in-row pair
    // expansion, same 4dp-rounded keep test.
    "q231_item_cosine" ->
      """WITH baskets AS (
        |  SELECT l_orderkey AS bk, list_sort(list_distinct(list(l_partkey))) AS items
        |  FROM lineitem GROUP BY 1
        |),
        |pairs AS (
        |  SELECT p.a AS a, p.b AS b, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM (
        |    SELECT unnest(flatten(list_transform(items, (x, i) ->
        |             list_transform(items[i+1:], y -> struct_pack(a := x, b := y))))) AS p
        |    FROM baskets
        |  )
        |  GROUP BY 1, 2
        |),
        |items_n AS (
        |  SELECT it, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(items) AS it FROM baskets) GROUP BY 1
        |)
        |SELECT p.a, p.b, p.n_ab,
        |       round(CAST(p.n_ab AS DOUBLE) / sqrt(CAST(ia.n AS DOUBLE) * CAST(ib.n AS DOUBLE)), 4) AS cos
        |FROM pairs p
        |JOIN items_n ia ON ia.it = p.a
        |JOIN items_n ib ON ib.it = p.b
        |WHERE p.n_ab >= 3
        |  AND round(CAST(p.n_ab AS DOUBLE) / sqrt(CAST(ia.n AS DOUBLE) * CAST(ib.n AS DOUBLE)), 4) >= 0.1""".stripMargin,
    // Banding-eval replay: exact all-pairs truth on the same 5%
    // md5 sample, candidates = the q31 lshpairs restricted to it.
    "q232_banding_eval" ->
      s"""WITH $MinhashPairsSql,
         |samp AS (
         |  SELECT id, list_distinct(sh) AS dsh FROM shingled
         |  WHERE ${HexBucketSql("md5(CAST(id AS VARCHAR) || ':bandeval')")} % 20 = 0
         |),
         |truth AS (
         |  SELECT x.id AS idA, y.id AS idB
         |  FROM samp x JOIN samp y ON x.id < y.id
         |  WHERE round(CAST(len(list_intersect(x.dsh, y.dsh)) AS DOUBLE)
         |        / len(list_distinct(list_concat(x.dsh, y.dsh))), 3) >= 0.8
         |),
         |scand AS (
         |  SELECT p.idA, p.idB FROM lshpairs p
         |  JOIN samp a ON a.id = p.idA JOIN samp b ON b.id = p.idB
         |),
         |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sampled FROM samp),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM scand),
         |nh AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_hit
         |  FROM truth t JOIN scand c ON c.idA = t.idA AND c.idB = t.idB
         |)
         |SELECT n_sampled, n_truth, n_candidates, n_hit,
         |       round(CAST(n_hit AS DOUBLE)
         |             / CASE WHEN n_truth = 0 THEN NULL ELSE n_truth END, 4) AS recall
         |FROM ns CROSS JOIN nt CROSS JOIN nc CROSS JOIN nh""".stripMargin,
    // SRM replay: pmod parity arms, identical chi-square op order,
    // flag on the 4dp-rounded statistic.
    "q233_srm" ->
      """WITH a AS (
        |  SELECT CAST(count(*) FILTER (user_id % 2 = 0) AS BIGINT) AS n_a,
        |         CAST(count(*) FILTER (user_id % 2 <> 0) AS BIGINT) AS n_b
        |  FROM events
        |),
        |e AS (
        |  SELECT n_a, n_b,
        |         CAST(n_a + n_b AS DOUBLE) * 0.5 AS ea,
        |         CAST(n_a + n_b AS DOUBLE) * 0.5 AS eb
        |  FROM a WHERE n_a + n_b > 0
        |),
        |c AS (
        |  SELECT n_a, n_b,
        |         round((CAST(n_a AS DOUBLE) - ea) * (CAST(n_a AS DOUBLE) - ea) / ea
        |               + (CAST(n_b AS DOUBLE) - eb) * (CAST(n_b AS DOUBLE) - eb) / eb, 4) AS chi2
        |  FROM e
        |)
        |SELECT n_a, n_b,
        |       round(CAST(n_a AS DOUBLE) / CAST(n_a + n_b AS DOUBLE), 4) AS ratio,
        |       chi2, chi2 > 3.8415 AS srm
        |FROM c""".stripMargin,
    // Int8-fidelity replay: q90's code CTE against EmbSql's exact
    // ints, same 4dp fidelity, exact 1e-4 mean units.
    "q234_int8_fidelity" ->
      s"""WITH $EmbSql,
         |b8 AS (
         |  SELECT vec_id,
         |         list_transform(embedding, x ->
         |           CASE WHEN mx = 0 THEN 0
         |                ELSE CAST(round(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT)
         |           END) AS q8
         |  FROM (SELECT vec_id, embedding,
         |               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
         |        FROM embeddings)
         |),
         |n8 AS (
         |  SELECT vec_id, q8,
         |         sqrt(CAST(list_sum(list_transform(q8, x -> x * x)) AS DOUBLE)) AS n8
         |  FROM b8 WHERE list_sum(list_transform(q8, x -> x * x)) > 0
         |),
         |f AS (
         |  SELECT n.vec_id,
         |         round(CAST(list_sum(list_transform(range(1, 65), i -> n.q[i] * c.q8[i])) AS DOUBLE)
         |               / (n.n * c.n8), 6) AS fid
         |  FROM nrm n JOIN n8 c USING (vec_id)
         |  WHERE n.n > 0
         |)
         |SELECT CAST(count(*) AS BIGINT) AS n_vectors, min(fid) AS min_fid,
         |       round(CAST(sum(CAST(round(fid * 1000000) AS BIGINT)) AS DOUBLE)
         |             / count(*) / 1e6, 6) AS mean_fid,
         |       CAST(count(*) FILTER (fid < 0.999) AS BIGINT) AS n_below
         |FROM f""".stripMargin,
    // Transition-accuracy replay: same lead pairs, same (n desc,
    // follower desc) argmax, exact counts.
    "q235_transition_acc" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
        |  FROM events
        |),
        |p AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM e
        |),
        |pp AS (SELECT from_type, nxt FROM p WHERE nxt IS NOT NULL),
        |m AS (SELECT from_type, nxt, CAST(count(*) AS BIGINT) AS n FROM pp GROUP BY 1, 2),
        |pred AS (
        |  SELECT from_type, nxt AS pred_type FROM (
        |    SELECT from_type, nxt,
        |           row_number() OVER (PARTITION BY from_type ORDER BY n DESC, nxt DESC) AS rn
        |    FROM m
        |  ) WHERE rn = 1
        |),
        |per AS (
        |  SELECT pp.from_type, pred.pred_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(count(*) FILTER (pp.nxt = pred.pred_type) AS BIGINT) AS n_correct
        |  FROM pp JOIN pred USING (from_type) GROUP BY 1, 2
        |),
        |tot AS (SELECT sum(n) AS tn, sum(n_correct) AS tc FROM per)
        |SELECT from_type, pred_type, n, n_correct,
        |       round(CAST(n_correct AS DOUBLE) / n, 4) AS acc,
        |       round(CAST(tot.tc AS DOUBLE) / tot.tn, 4) AS micro_acc
        |FROM per CROSS JOIN tot""".stripMargin,
    // Schema-evolution replay: v1 ∪ v2 from the raw table — every v1
    // row contributes a missing n_chars, every v2 row its value.
    "q236_schema_evolution" ->
      """SELECT lang, CAST(2 * count(*) AS BIGINT) AS n_rows,
        |       CAST(count(*) AS BIGINT) AS n_missing,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1""".stripMargin,
    // Quarantine replay: the corruption rule is the spec — every
    // 100th non-null-value event's value is unparseable.
    "q237_csv_quarantine" ->
      """WITH e AS (SELECT event_id, user_id, value FROM events WHERE value IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(*) FILTER (event_id % 100 = 0) AS BIGINT) AS n_quarantined,
        |       CAST(sum(CASE WHEN event_id % 100 = 0 THEN 0 ELSE user_id END) AS BIGINT)
        |         AS sum_user_good,
        |       round(sum(CASE WHEN event_id % 100 = 0 THEN 0 ELSE value END), 4)
        |         AS sum_value_good
        |FROM e""".stripMargin,
    // Lift-curve replay: q227's quality/pass inputs, I25's 4dp decile
    // boundaries, cumulative windows from the TOP bin down.
    "q238_lift_curve" ->
      s"""WITH $GopherDocSql,
         |base AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS w,
         |         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT)
         |           AS n_tokens
         |  FROM documents
         |),
         |q AS (
         |  SELECT doc_id,
         |         CAST((CAST(4 * least(n_tokens, 100) * n_tokens
         |                    + 300 * len(list_distinct(w))
         |                    + 300 * (n_tokens - len(list_filter(w, x -> x = 'the'))
         |                                      - len(list_filter(w, x -> x = 'a')))
         |               AS BIGINT)
         |               * 20000 + 1000 * n_tokens) // (2000 * n_tokens) AS BIGINT) AS qi
         |  FROM base
         |),
         |g AS (SELECT doc_id, (${gopherPassPred(2)}) AS gopher_pass FROM d),
         |rows_q AS (
         |  SELECT q.qi AS u, CASE WHEN g.gopher_pass THEN 1 ELSE 0 END AS y
         |  FROM q JOIN g USING (doc_id)
         |),
         |b AS (
         |  SELECT list_transform(quantile_cont(u, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
         |           x -> round(x, 4)) AS bs
         |  FROM rows_q
         |),
         |binned AS (
         |  SELECT CAST(list_sum(list_transform(bs,
         |           x -> CASE WHEN u > x THEN 1 ELSE 0 END)) AS BIGINT) AS bin, y
         |  FROM rows_q CROSS JOIN b
         |),
         |t AS (
         |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(y) AS BIGINT) AS n_pos
         |  FROM binned GROUP BY 1
         |),
         |c AS (
         |  SELECT bin, n, n_pos,
         |         CAST(sum(n) OVER (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
         |         CAST(sum(n_pos) OVER (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
         |         CAST(sum(n) OVER () AS BIGINT) AS tn,
         |         CAST(sum(n_pos) OVER () AS BIGINT) AS tp
         |  FROM t
         |)
         |SELECT bin, n, n_pos, cum_n, cum_pos,
         |       round(CAST(cum_pos AS DOUBLE)
         |             / CASE WHEN tp = 0 THEN NULL ELSE CAST(tp AS DOUBLE) END, 4) AS gain,
         |       round((CAST(cum_pos AS DOUBLE) / cum_n)
         |             / CASE WHEN tp = 0 THEN NULL
         |                    ELSE CAST(tp AS DOUBLE) / tn END, 4) AS lift
         |FROM c""".stripMargin,
    // Cumulative-hazard replay: the q144 survival CTEs with the
    // micro-quantized d/n increments cumulated as exact longs.
    "q239_cum_hazard" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events
        |),
        |hz AS (SELECT max(us) AS hz FROM e),
        |u AS (
        |  SELECT user_id, min(us) AS t0,
        |         min(CASE WHEN event_type = 'purchase' THEN us END) AS tp
        |  FROM e GROUP BY 1
        |),
        |f AS (
        |  SELECT user_id, event_type AS cohort FROM (
        |    SELECT user_id, event_type,
        |           row_number() OVER (PARTITION BY user_id
        |             ORDER BY us, event_id) AS rk
        |    FROM e)
        |  WHERE rk = 1
        |),
        |s AS (
        |  SELECT f.cohort,
        |         CASE WHEN u.tp IS NOT NULL THEN 1 ELSE 0 END AS ev,
        |         (coalesce(u.tp, hz.hz) - u.t0) // 86400000000 AS duration
        |  FROM u JOIN f USING (user_id) CROSS JOIN hz
        |),
        |g AS (
        |  SELECT cohort, duration, CAST(sum(ev) AS BIGINT) AS d,
        |         CAST(sum(1 - ev) AS BIGINT) AS c
        |  FROM s GROUP BY 1, 2
        |),
        |w AS (
        |  SELECT *,
        |    CAST(sum(d + c) OVER (PARTITION BY cohort)
        |      - (sum(d + c) OVER (PARTITION BY cohort ORDER BY duration
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - (d + c))
        |      AS BIGINT) AS n_risk
        |  FROM g
        |),
        |h AS (
        |  SELECT *,
        |    CAST(round(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) * 1e6) AS BIGINT) AS hu
        |  FROM w
        |)
        |SELECT cohort, duration, n_risk, d, c,
        |       round(CAST(sum(hu) OVER (PARTITION BY cohort ORDER BY duration
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |             / 1e6, 4) AS cum_hazard
        |FROM h""".stripMargin,
    // Churn-label replay: same max-anchored cutoff, same side counts.
    "q240_churn_labels" ->
      """WITH f AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d
        |  FROM events
        |),
        |a AS (SELECT max(d) - 7 + 1 AS cut FROM f),
        |g AS (
        |  SELECT user_id,
        |         CAST(count(*) FILTER (d < cut) AS BIGINT) AS n_before,
        |         CAST(count(*) FILTER (d >= cut) AS BIGINT) AS n_after
        |  FROM f CROSS JOIN a GROUP BY 1
        |)
        |SELECT user_id, n_before, n_after, n_after = 0 AS churned
        |FROM g WHERE n_before > 0""".stripMargin,
    // Qini replay: same user frame, same parity arms, I25 boundary
    // binning, desc cumulative incremental conversions.
    "q241_qini" ->
      """WITH u AS (
        |  SELECT user_id,
        |         COALESCE(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT), 0) AS sc,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1
        |),
        |r AS (
        |  SELECT CAST(round(CAST(sc AS DOUBLE) / 100.0 * 10000) AS BIGINT) AS u,
        |         user_id % 2 <> 0 AS t, conv AS y
        |  FROM u
        |),
        |b AS (
        |  SELECT list_transform(
        |           quantile_cont(u, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
        |           x -> round(x, 4)) AS bs
        |  FROM r
        |),
        |binned AS (
        |  SELECT CAST(list_sum(list_transform(bs,
        |           x -> CASE WHEN u > x THEN 1 ELSE 0 END)) AS BIGINT) AS bin, t, y
        |  FROM r CROSS JOIN b
        |),
        |g AS (
        |  SELECT bin,
        |         CAST(count(*) FILTER (t) AS BIGINT) AS n_treat,
        |         CAST(count(*) FILTER (NOT t) AS BIGINT) AS n_ctrl,
        |         CAST(sum(CASE WHEN t THEN y ELSE 0 END) AS BIGINT) AS conv_treat,
        |         CAST(sum(CASE WHEN NOT t THEN y ELSE 0 END) AS BIGINT) AS conv_ctrl
        |  FROM binned GROUP BY 1
        |),
        |c AS (
        |  SELECT *,
        |         CAST(sum(n_treat) OVER (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cnt,
        |         CAST(sum(n_ctrl) OVER (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cnc,
        |         CAST(sum(conv_treat) OVER (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cpt,
        |         CAST(sum(conv_ctrl) OVER (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cpc
        |  FROM g
        |)
        |SELECT bin, n_treat, n_ctrl, conv_treat, conv_ctrl,
        |       round(CAST(cpt AS DOUBLE) - CAST(cpc AS DOUBLE)
        |             * CASE WHEN cnc = 0 THEN NULL
        |                    ELSE CAST(cnt AS DOUBLE) / CAST(cnc AS DOUBLE) END, 4) AS qini,
        |       round(CAST(cpt AS DOUBLE)
        |             / CASE WHEN cnt = 0 THEN NULL ELSE CAST(cnt AS DOUBLE) END
        |             - CAST(cpc AS DOUBLE)
        |             / CASE WHEN cnc = 0 THEN NULL ELSE CAST(cnc AS DOUBLE) END, 4) AS uplift
        |FROM c""".stripMargin,
    // Triple-support replay: same sorted distinct baskets, same
    // canonical (a < b < c) in-row expansion, same top-k order.
    "q242_triples" ->
      """WITH baskets AS (
        |  SELECT l_orderkey AS bk, list_sort(list_distinct(list(l_partkey))) AS items
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT t.a AS a, t.b AS b, t.c AS c, CAST(count(*) AS BIGINT) AS n_abc
        |FROM (
        |  SELECT unnest(flatten(list_transform(items, (x, i) ->
        |           flatten(list_transform(items[i+1:], (y, j) ->
        |             list_transform(items[i+j+1:],
        |               z -> struct_pack(a := x, b := y, c := z))))))) AS t
        |  FROM baskets
        |)
        |GROUP BY 1, 2, 3 HAVING count(*) >= 2
        |ORDER BY n_abc DESC, a, b, c LIMIT 20""".stripMargin,
    // Outlier replay: 4dp-published median/MAD thresholds, modified z
    // against integer cents, keep test on the rounded value.
    "q243_outliers" ->
      """WITH b AS (
        |  SELECT event_type, event_id, CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL
        |),
        |m AS (SELECT event_type, round(quantile_cont(c, 0.5), 4) AS med FROM b GROUP BY 1),
        |md AS (
        |  SELECT b.event_type,
        |         round(quantile_cont(abs(CAST(c AS DOUBLE) - med), 0.5), 4) AS mad
        |  FROM b JOIN m USING (event_type) GROUP BY 1
        |)
        |SELECT b.event_type, b.event_id,
        |       round(CAST(c AS DOUBLE) / 100.0, 4) AS value,
        |       round(0.6745 * (CAST(c AS DOUBLE) - med) / mad, 4) AS mz
        |FROM b JOIN m USING (event_type) JOIN md USING (event_type)
        |WHERE mad > 0
        |  AND abs(round(0.6745 * (CAST(c AS DOUBLE) - med) / mad, 4)) > 3.5""".stripMargin,
    // CUPED replay: same cutoff frame, HUGEINT moments, identical
    // theta/adjustment/variance expressions in the same op order.
    "q244_cuped" ->
      """WITH f AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |         COALESCE(CAST(round(value * 100) AS BIGINT), 0) AS c
        |  FROM events
        |),
        |a0 AS (SELECT max(d) - 6 AS cut FROM f),
        |u AS (
        |  SELECT user_id,
        |         CAST(sum(CASE WHEN d < cut THEN c ELSE 0 END) AS BIGINT) AS xx,
        |         CAST(sum(CASE WHEN d >= cut THEN c ELSE 0 END) AS BIGINT) AS yy
        |  FROM f CROSS JOIN a0 GROUP BY 1
        |),
        |r AS (
        |  SELECT CASE WHEN user_id % 2 <> 0 THEN 'B' ELSE 'A' END AS arm, xx, yy
        |  FROM u
        |),
        |m AS (
        |  SELECT
        |    CAST(count(*) FILTER (arm = 'A') AS BIGINT) AS n_a,
        |    CAST(count(*) FILTER (arm = 'B') AS BIGINT) AS n_b,
        |    sum(yy) FILTER (arm = 'A') AS sy_a, sum(xx) FILTER (arm = 'A') AS sx_a,
        |    sum(CAST(yy AS HUGEINT) * yy) FILTER (arm = 'A') AS syy_a,
        |    sum(CAST(xx AS HUGEINT) * xx) FILTER (arm = 'A') AS sxx_a,
        |    sum(CAST(xx AS HUGEINT) * yy) FILTER (arm = 'A') AS sxy_a,
        |    sum(yy) FILTER (arm = 'B') AS sy_b, sum(xx) FILTER (arm = 'B') AS sx_b,
        |    sum(CAST(yy AS HUGEINT) * yy) FILTER (arm = 'B') AS syy_b,
        |    sum(CAST(xx AS HUGEINT) * xx) FILTER (arm = 'B') AS sxx_b,
        |    sum(CAST(xx AS HUGEINT) * yy) FILTER (arm = 'B') AS sxy_b
        |  FROM r
        |),
        |c1 AS (
        |  SELECT *, n_a + n_b AS nn,
        |         CAST(sx_a AS DOUBLE) + CAST(sx_b AS DOUBLE) AS sx,
        |         CAST(sy_a AS DOUBLE) + CAST(sy_b AS DOUBLE) AS sy,
        |         CAST(sxx_a AS DOUBLE) + CAST(sxx_b AS DOUBLE) AS sxx,
        |         CAST(sxy_a AS DOUBLE) + CAST(sxy_b AS DOUBLE) AS sxy,
        |         CAST(syy_a AS DOUBLE) + CAST(syy_b AS DOUBLE) AS syy
        |  FROM m WHERE n_a > 1 AND n_b > 1
        |),
        |c2 AS (SELECT *, sxx - sx * sx / nn AS varx, sxy - sx * sy / nn AS covxy FROM c1),
        |c3 AS (
        |  SELECT *, CASE WHEN varx = 0 THEN 0.0 ELSE covxy / varx END AS theta,
        |         sx / nn AS xbar
        |  FROM c2
        |),
        |c4 AS (
        |  SELECT *,
        |         CAST(sy_a AS DOUBLE) / n_a AS mya, CAST(sx_a AS DOUBLE) / n_a AS mxa,
        |         CAST(sy_b AS DOUBLE) / n_b AS myb, CAST(sx_b AS DOUBLE) / n_b AS mxb
        |  FROM c3
        |),
        |c5 AS (
        |  SELECT *,
        |         mya - theta * (mxa - xbar) AS adja, myb - theta * (mxb - xbar) AS adjb,
        |         (CAST(syy_a AS DOUBLE) - n_a * mya * mya) / (n_a - 1) AS vrawa,
        |         (CAST(syy_b AS DOUBLE) - n_b * myb * myb) / (n_b - 1) AS vrawb,
        |         (CAST(syy_a AS DOUBLE) - 2.0 * theta * CAST(sxy_a AS DOUBLE)
        |          + theta * theta * CAST(sxx_a AS DOUBLE)
        |          - n_a * (mya - theta * mxa) * (mya - theta * mxa)) / (n_a - 1) AS vadja,
        |         (CAST(syy_b AS DOUBLE) - 2.0 * theta * CAST(sxy_b AS DOUBLE)
        |          + theta * theta * CAST(sxx_b AS DOUBLE)
        |          - n_b * (myb - theta * mxb) * (myb - theta * mxb)) / (n_b - 1) AS vadjb
        |  FROM c4
        |),
        |c6 AS (
        |  SELECT *, sqrt(vrawa / n_a + vrawb / n_b) AS seraw,
        |         sqrt(vadja / n_a + vadjb / n_b) AS seadj,
        |         (syy - sy * sy / nn) / (nn - 1) AS vpoolraw,
        |         (syy - 2.0 * theta * sxy + theta * theta * sxx
        |          - (sy - theta * sx) * (sy - theta * sx) / nn) / (nn - 1) AS vpooladj
        |  FROM c5
        |)
        |SELECT n_a, n_b, round(theta, 6) AS theta,
        |       round((myb - mya) / 100.0, 4) AS diff_raw,
        |       round((adjb - adja) / 100.0, 4) AS diff_adj,
        |       round((myb - mya)
        |             / CASE WHEN seraw <= 0 THEN NULL ELSE seraw END, 4) AS t_raw,
        |       round((adjb - adja)
        |             / CASE WHEN seadj <= 0 THEN NULL ELSE seadj END, 4) AS t_adj,
        |       round(1.0 - vpooladj
        |             / CASE WHEN vpoolraw <= 0 THEN NULL ELSE vpoolraw END, 4)
        |         AS var_reduction
        |FROM c6""".stripMargin,
    // Ratio-delta replay: same user-grain counts, same delta-method
    // variance expansion.
    "q245_ratio_delta" ->
      """WITH u AS (
        |  SELECT user_id,
        |         CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS x,
        |         CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS y
        |  FROM events GROUP BY 1
        |),
        |r AS (
        |  SELECT CASE WHEN user_id % 2 <> 0 THEN 'B' ELSE 'A' END AS arm, x, y
        |  FROM u
        |),
        |m AS (
        |  SELECT
        |    CAST(count(*) FILTER (arm = 'A') AS BIGINT) AS n_a,
        |    CAST(count(*) FILTER (arm = 'B') AS BIGINT) AS n_b,
        |    sum(x) FILTER (arm = 'A') AS sx_a, sum(y) FILTER (arm = 'A') AS sy_a,
        |    sum(CAST(x AS HUGEINT) * x) FILTER (arm = 'A') AS sxx_a,
        |    sum(CAST(y AS HUGEINT) * y) FILTER (arm = 'A') AS syy_a,
        |    sum(CAST(x AS HUGEINT) * y) FILTER (arm = 'A') AS sxy_a,
        |    sum(x) FILTER (arm = 'B') AS sx_b, sum(y) FILTER (arm = 'B') AS sy_b,
        |    sum(CAST(x AS HUGEINT) * x) FILTER (arm = 'B') AS sxx_b,
        |    sum(CAST(y AS HUGEINT) * y) FILTER (arm = 'B') AS syy_b,
        |    sum(CAST(x AS HUGEINT) * y) FILTER (arm = 'B') AS sxy_b
        |  FROM r
        |),
        |k AS (SELECT * FROM m WHERE n_a > 1 AND n_b > 1 AND sy_a > 0 AND sy_b > 0),
        |c AS (
        |  SELECT n_a, n_b,
        |    CAST(sx_a AS DOUBLE) / CAST(sy_a AS DOUBLE) AS ra,
        |    CAST(sx_b AS DOUBLE) / CAST(sy_b AS DOUBLE) AS rb,
        |    (CAST(sxx_a AS DOUBLE) - CAST(sx_a AS DOUBLE) * CAST(sx_a AS DOUBLE) / n_a) / (n_a - 1) AS vxa,
        |    (CAST(syy_a AS DOUBLE) - CAST(sy_a AS DOUBLE) * CAST(sy_a AS DOUBLE) / n_a) / (n_a - 1) AS vya,
        |    (CAST(sxy_a AS DOUBLE) - CAST(sx_a AS DOUBLE) * CAST(sy_a AS DOUBLE) / n_a) / (n_a - 1) AS ca,
        |    CAST(sy_a AS DOUBLE) / n_a AS yba,
        |    (CAST(sxx_b AS DOUBLE) - CAST(sx_b AS DOUBLE) * CAST(sx_b AS DOUBLE) / n_b) / (n_b - 1) AS vxb,
        |    (CAST(syy_b AS DOUBLE) - CAST(sy_b AS DOUBLE) * CAST(sy_b AS DOUBLE) / n_b) / (n_b - 1) AS vyb,
        |    (CAST(sxy_b AS DOUBLE) - CAST(sx_b AS DOUBLE) * CAST(sy_b AS DOUBLE) / n_b) / (n_b - 1) AS cb,
        |    CAST(sy_b AS DOUBLE) / n_b AS ybb
        |  FROM k
        |),
        |e AS (
        |  SELECT *,
        |    (vxa + ra * ra * vya - 2.0 * ra * ca) / (n_a * yba * yba) AS sea2,
        |    (vxb + rb * rb * vyb - 2.0 * rb * cb) / (n_b * ybb * ybb) AS seb2
        |  FROM c
        |)
        |SELECT n_a, n_b, round(ra, 4) AS ratio_a, round(rb, 4) AS ratio_b,
        |       round(rb - ra, 4) AS diff,
        |       round((rb - ra)
        |             / CASE WHEN sea2 + seb2 <= 0 THEN NULL
        |                    ELSE sqrt(sea2 + seb2) END, 4) AS z
        |FROM e""".stripMargin,
    // Streaming-SRM replay: q60's finalized-window rule, parity arms,
    // the q233 chi-square per window.
    "q246_stream_srm" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |),
        |mx AS (SELECT max(ts) AS mt FROM ev),
        |fin AS (
        |  SELECT date_trunc('hour', ts) AS ws, user_id FROM ev, mx
        |  WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= mt - INTERVAL 2 HOUR
        |),
        |g AS (
        |  SELECT ws,
        |         CAST(count(*) FILTER (user_id % 2 = 0) AS BIGINT) AS n_a,
        |         CAST(count(*) FILTER (user_id % 2 <> 0) AS BIGINT) AS n_b
        |  FROM fin GROUP BY 1
        |),
        |c AS (
        |  SELECT ws, n_a, n_b, CAST(n_a + n_b AS DOUBLE) * 0.5 AS e
        |  FROM g
        |)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, n_a, n_b,
        |       round((CAST(n_a AS DOUBLE) - e) * (CAST(n_a AS DOUBLE) - e) / e
        |             + (CAST(n_b AS DOUBLE) - e) * (CAST(n_b AS DOUBLE) - e) / e, 4) AS chi2,
        |       round((CAST(n_a AS DOUBLE) - e) * (CAST(n_a AS DOUBLE) - e) / e
        |             + (CAST(n_b AS DOUBLE) - e) * (CAST(n_b AS DOUBLE) - e) / e, 4) > 3.8415 AS srm
        |FROM c""".stripMargin,
    // Daily-band replay: interpolated percentiles on integer cents at
    // day grain (the q50/q157 contract).
    "q247_daily_bands" ->
      """WITH f AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL
        |)
        |SELECT day, CAST(count(*) AS BIGINT) AS n,
        |       round(quantile_cont(c, 0.1) / 100.0, 4) AS p10,
        |       round(quantile_cont(c, 0.5) / 100.0, 4) AS p50,
        |       round(quantile_cont(c, 0.9) / 100.0, 4) AS p90
        |FROM f GROUP BY 1""".stripMargin,
    // Mix-shift replay: same (day, cat) grain, same 6dp per-category
    // JS contributions, same closed-form absent-mass remainder.
    "q248_mix_shift" ->
      """WITH g AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |         event_type AS cat, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |),
        |b AS (
        |  SELECT cat, CAST(sum(n) AS DOUBLE)
        |           / (SELECT CAST(sum(n) AS DOUBLE) FROM g) AS q
        |  FROM g GROUP BY 1
        |),
        |dt AS (SELECT day, CAST(sum(n) AS BIGINT) AS t FROM g GROUP BY 1),
        |c AS (
        |  SELECT g.day, dt.t,
        |         CAST(g.n AS DOUBLE) / dt.t AS p, b.q,
        |         (CAST(g.n AS DOUBLE) / dt.t + b.q) / 2.0 AS m
        |  FROM g JOIN b USING (cat) JOIN dt ON dt.day = g.day
        |),
        |s AS (
        |  SELECT day, any_value(t) AS n,
        |         sum(round((p * ln(p / m) + q * ln(q / m)) / 2.0, 6)) AS js_present,
        |         sum(q) AS q_present
        |  FROM c GROUP BY 1
        |)
        |SELECT day, n,
        |       round(js_present + round((1.0 - q_present) / 2.0 * ln(2.0), 6), 4) AS js
        |FROM s""".stripMargin,
    // Audience-overlap replay: same distinct (user, cat) collapse,
    // same in-row canonical pairs, exact Jaccard.
    "q249_audience_overlap" ->
      """WITH pu AS (
        |  SELECT user_id, list_sort(list_distinct(list(event_type))) AS cats
        |  FROM events GROUP BY 1
        |),
        |pairs AS (
        |  SELECT p.a AS cat_a, p.b AS cat_b, CAST(count(*) AS BIGINT) AS n_both
        |  FROM (
        |    SELECT unnest(flatten(list_transform(cats, (x, i) ->
        |             list_transform(cats[i+1:], y -> struct_pack(a := x, b := y))))) AS p
        |    FROM pu
        |  ) GROUP BY 1, 2
        |),
        |marg AS (
        |  SELECT c AS cat, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(cats) AS c FROM pu) GROUP BY 1
        |)
        |SELECT p.cat_a, p.cat_b, ma.n AS n_a, mb.n AS n_b, p.n_both,
        |       round(CAST(p.n_both AS DOUBLE) / (ma.n + mb.n - p.n_both), 4) AS jaccard
        |FROM pairs p
        |JOIN marg ma ON ma.cat = p.cat_a
        |JOIN marg mb ON mb.cat = p.cat_b""".stripMargin,
    // Entropy-rate replay: same lead pairs, same 6dp cell
    // contributions over the states-squared table.
    "q250_entropy_rate" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
        |  FROM events
        |),
        |p AS (
        |  SELECT event_type AS s,
        |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
        |  FROM e
        |),
        |m AS (SELECT s, t, CAST(count(*) AS BIGINT) AS n FROM p WHERE t IS NOT NULL GROUP BY 1, 2),
        |w AS (
        |  SELECT s, t, n,
        |         sum(n) OVER (PARTITION BY s) AS ns,
        |         sum(n) OVER () AS nn
        |  FROM m
        |),
        |c AS (
        |  SELECT nn, s,
        |         round(-(CAST(n AS DOUBLE) / nn) * ln(CAST(n AS DOUBLE) / ns), 6) AS c
        |  FROM w
        |),
        |r AS (
        |  SELECT CAST(max(nn) AS BIGINT) AS n_transitions,
        |         CAST(count(DISTINCT s) AS BIGINT) AS n_states,
        |         round(sum(c), 4) AS entropy_rate
        |  FROM c
        |)
        |SELECT n_transitions, n_states, entropy_rate,
        |       round(exp(entropy_rate), 4) AS perplexity
        |FROM r""".stripMargin,
    // Bot-flag replay: same lag gaps, same exact moment CV, keep test
    // on the rounded value.
    "q251_bot_flags" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
        |  FROM events
        |),
        |g AS (
        |  SELECT user_id,
        |         us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap
        |  FROM e
        |),
        |s AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |         CAST(count(gap) AS BIGINT) AS ng,
        |         CAST(sum(gap) AS BIGINT) AS sg,
        |         sum(CAST(gap AS HUGEINT) * gap) AS qg
        |  FROM g GROUP BY 1
        |),
        |c AS (
        |  SELECT user_id, n_events,
        |         CAST(sg AS DOUBLE) / ng AS mean,
        |         round(sqrt(greatest(
        |                 (CAST(qg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng)
        |                   / (ng - 1), 0.0))
        |               / (CAST(sg AS DOUBLE) / ng), 4) AS cv
        |  FROM s WHERE n_events >= 20 AND ng > 1 AND sg > 0
        |)
        |SELECT user_id, n_events, round(mean / 1e6, 4) AS mean_gap_s, cv
        |FROM c WHERE cv <= 0.9""".stripMargin,
    // RAKE replay: same boundary-regex phrase split, same micro-unit
    // word scores, same (score desc, phrase) top-k.
    "q252_rake" ->
      """WITH ph AS (
        |  SELECT trim(p) AS phrase FROM (
        |    SELECT unnest(string_split(
        |             regexp_replace(lower(text),
        |               '\b(the|be|to|of|and|that|have|with)\b', chr(1), 'g'),
        |             chr(1))) AS p
        |    FROM documents
        |  ) WHERE trim(p) <> '' AND len(string_split(trim(p), ' ')) <= 4
        |),
        |w AS (
        |  SELECT phrase, len(string_split(phrase, ' ')) AS plen,
        |         unnest(string_split(phrase, ' ')) AS word
        |  FROM ph
        |),
        |st AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS freq,
        |         CAST(sum(plen) AS BIGINT) AS deg
        |  FROM w GROUP BY 1
        |),
        |wu AS (
        |  SELECT word,
        |         CAST(round(CAST(deg AS DOUBLE) / freq * 1e6) AS BIGINT) AS wu
        |  FROM st
        |),
        |dp AS (
        |  SELECT phrase, unnest(string_split(phrase, ' ')) AS word
        |  FROM (SELECT DISTINCT phrase FROM ph)
        |),
        |sc AS (
        |  SELECT dp.phrase, CAST(sum(wu.wu) AS BIGINT) AS su,
        |         CAST(count(*) AS BIGINT) AS n_words
        |  FROM dp JOIN wu USING (word) GROUP BY 1
        |),
        |occ AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences FROM ph GROUP BY 1)
        |SELECT occ.phrase, sc.n_words, occ.n_occurrences,
        |       round(CAST(sc.su AS DOUBLE) / 1e6, 4) AS score
        |FROM occ JOIN sc USING (phrase)
        |ORDER BY score DESC, phrase LIMIT 30""".stripMargin,
    // STL-anomaly replay: the q230 pipeline + the 4dp-threshold keep
    // test against 2 sigma.
    "q253_stl_anomalies" ->
      """WITH s AS (
        |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2
        |),
        |t AS (
        |  SELECT event_type, day, y,
        |         CAST(round(CAST(sum(y) OVER fr AS DOUBLE) / count(*) OVER fr * 1e6) AS BIGINT) AS tu
        |  FROM s WINDOW fr AS (PARTITION BY event_type ORDER BY day
        |                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |),
        |b AS (SELECT event_type, day, y, tu, day % 7 AS phase, y * 1000000 - tu AS du FROM t),
        |se AS (
        |  SELECT event_type, phase,
        |         CAST(round(CAST(sum(CAST(du AS HUGEINT)) AS DOUBLE) / count(*)) AS BIGINT) AS su
        |  FROM b GROUP BY 1, 2
        |),
        |r AS (
        |  SELECT b.event_type, b.day, b.y, b.tu, se.su, b.du - se.su AS rr
        |  FROM b JOIN se ON se.event_type = b.event_type AND se.phase = b.phase
        |),
        |sd AS (
        |  SELECT event_type,
        |         round(sqrt((CAST(sum(CAST(rr AS HUGEINT) * rr) AS DOUBLE)
        |                     - CAST(sum(CAST(rr AS HUGEINT)) AS DOUBLE)
        |                       * CAST(sum(CAST(rr AS HUGEINT)) AS DOUBLE) / count(*))
        |                    / (count(*) - 1)) / 1e6, 4) AS sd4
        |  FROM r GROUP BY 1 HAVING count(*) > 1
        |)
        |SELECT r.event_type, r.day, r.y,
        |       round((CAST(r.tu AS DOUBLE) + CAST(r.su AS DOUBLE)) / 1e6, 4) AS expected,
        |       round(CAST(r.rr AS DOUBLE) / 1e6, 4) AS resid
        |FROM r JOIN sd USING (event_type)
        |WHERE sd.sd4 > 0 AND abs(round(CAST(r.rr AS DOUBLE) / 1e6, 4)) > 2.0 * sd.sd4""".stripMargin,
    // Component-size replay: the q47 walk, size histogram, exact
    // shares over the histogram.
    "q254_component_sizes" ->
      s"""WITH RECURSIVE $MinhashPairsSql,
         |edges AS (
         |  SELECT idA AS src, idB AS dst FROM lshpairs
         |  UNION ALL
         |  SELECT idB AS src, idA AS dst FROM lshpairs
         |),
         |walk(id, comp) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT e.src, w.comp FROM edges e JOIN walk w ON e.dst = w.id
         |),
         |comps AS (SELECT id, min(comp) AS comp FROM walk GROUP BY id),
         |sz AS (SELECT comp, CAST(count(*) AS BIGINT) AS size FROM comps GROUP BY 1),
         |hist AS (
         |  SELECT size, CAST(count(*) AS BIGINT) AS n_components,
         |         CAST(size * count(*) AS BIGINT) AS n_nodes
         |  FROM sz GROUP BY 1
         |),
         |sh AS (
         |  SELECT size, n_components, n_nodes,
         |         round(CAST(n_nodes AS DOUBLE) / sum(n_nodes) OVER (), 4) AS node_share
         |  FROM hist
         |)
         |SELECT size, n_components, n_nodes, node_share,
         |       max(node_share) OVER () AS max_share
         |FROM sh""".stripMargin,
    // Heterogeneity replay: per-segment F31 moments, 6dp Q
    // contributions, segment-table windows.
    "q255_heterogeneity" ->
      """WITH seg AS (
        |  SELECT event_type AS segment,
        |         CAST(count(*) FILTER (user_id % 2 = 0) AS BIGINT) AS n_a,
        |         CAST(sum(CAST(round(value * 100) AS HUGEINT)) FILTER (user_id % 2 = 0) AS HUGEINT) AS sa,
        |         CAST(sum(CAST(round(value * 100) AS HUGEINT) * CAST(round(value * 100) AS HUGEINT))
        |              FILTER (user_id % 2 = 0) AS HUGEINT) AS qa,
        |         CAST(count(*) FILTER (user_id % 2 <> 0) AS BIGINT) AS n_b,
        |         CAST(sum(CAST(round(value * 100) AS HUGEINT)) FILTER (user_id % 2 <> 0) AS HUGEINT) AS sb,
        |         CAST(sum(CAST(round(value * 100) AS HUGEINT) * CAST(round(value * 100) AS HUGEINT))
        |              FILTER (user_id % 2 <> 0) AS HUGEINT) AS qb
        |  FROM events WHERE value IS NOT NULL
        |  GROUP BY 1
        |),
        |v AS (
        |  SELECT segment, n_a, n_b,
        |         (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / n_a) / (n_a - 1) AS va,
        |         (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / n_b) / (n_b - 1) AS vb,
        |         CAST(sb AS DOUBLE) / n_b - CAST(sa AS DOUBLE) / n_a AS dd
        |  FROM seg WHERE n_a > 1 AND n_b > 1
        |),
        |e AS (
        |  SELECT *, va / n_a + vb / n_b AS se2 FROM v
        |),
        |w AS (
        |  SELECT *, 1.0 / se2 AS w FROM e WHERE se2 > 0
        |),
        |dw AS (
        |  SELECT *, sum(w * dd) OVER () / sum(w) OVER () AS dwbar FROM w
        |),
        |qq AS (
        |  SELECT *, round(w * (dd - dwbar) * (dd - dwbar), 6) AS q_contrib FROM dw
        |),
        |t AS (
        |  SELECT *, round(sum(q_contrib) OVER (), 4) AS q_stat,
        |         count(*) OVER () AS k
        |  FROM qq
        |)
        |SELECT segment, n_a, n_b,
        |       round(dd / 100.0, 4) AS diff, round(sqrt(se2) / 100.0, 4) AS se,
        |       q_contrib, q_stat,
        |       round(greatest(0.0, (q_stat - (k - 1))
        |             / CASE WHEN q_stat <= 0 THEN NULL ELSE q_stat END), 4) AS i2
        |FROM t""".stripMargin,
    // Permutation replay: the same md5 24-bit coin per (row, rep),
    // exact per-rep sums, 6dp diff compare, add-one p.
    "q256_permutation" ->
      s"""WITH rows_p AS (
         |  SELECT event_type = 'view' AS b, CAST(round(value * 100) AS BIGINT) AS c,
         |         CAST(event_id AS VARCHAR) AS id
         |  FROM events
         |  WHERE value IS NOT NULL AND event_id IS NOT NULL
         |    AND event_type IN ('click', 'view')
         |),
         |obs AS (
         |  SELECT CAST(count(*) FILTER (NOT b) AS BIGINT) AS n_a,
         |         CAST(count(*) FILTER (b) AS BIGINT) AS n_b,
         |         round(CAST(sum(c) FILTER (b) AS DOUBLE) / count(*) FILTER (b)
         |               - CAST(sum(c) FILTER (NOT b) AS DOUBLE) / count(*) FILTER (NOT b), 6) AS obs
         |  FROM rows_p HAVING n_a > 0 AND n_b > 0
         |),
         |r AS (
         |  SELECT c, rep,
         |         ${HexValSql("md5(id || ':perm:' || CAST(rep AS VARCHAR))", 1, 6)} < 8388608 AS pa
         |  FROM rows_p CROSS JOIN (SELECT unnest(range(0, 64)) AS rep)
         |),
         |pd AS (
         |  SELECT round(CAST(sum(c) FILTER (NOT pa) AS DOUBLE) / count(*) FILTER (NOT pa)
         |               - CAST(sum(c) FILTER (pa) AS DOUBLE) / count(*) FILTER (pa), 6) AS d
         |  FROM r GROUP BY rep
         |  HAVING count(*) FILTER (pa) > 0 AND count(*) FILTER (NOT pa) > 0
         |),
         |t AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_reps,
         |         CAST(count(*) FILTER (abs(pd.d) >= abs(obs.obs)) AS BIGINT) AS ge
         |  FROM pd CROSS JOIN obs
         |)
         |SELECT obs.n_a, obs.n_b, round(obs.obs / 100.0, 4) AS diff, t.n_reps,
         |       round(CAST(1 + t.ge AS DOUBLE) / (t.n_reps + 1), 4) AS p_value
         |FROM obs CROSS JOIN t""".stripMargin,
    // Yuen replay: per-arm 4dp-published trim thresholds, the pinned
    // lo < c < hi trim rule and clamp moments.
    "q257_yuen" ->
      """WITH rows_y AS (
        |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')
        |),
        |th AS (
        |  SELECT g, round(quantile_cont(c, 0.2), 4) AS lo,
        |         round(quantile_cont(c, 0.8), 4) AS hi
        |  FROM rows_y GROUP BY 1
        |),
        |j AS (
        |  SELECT r.g, CAST(r.c AS DOUBLE) AS cd, th.lo, th.hi,
        |         least(greatest(CAST(r.c AS DOUBLE), th.lo), th.hi) AS w
        |  FROM rows_y r JOIN th USING (g)
        |),
        |m AS (
        |  SELECT
        |    CAST(count(*) FILTER (g = 'click') AS BIGINT) AS n_a,
        |    CAST(count(*) FILTER (g = 'click' AND cd > lo AND cd < hi) AS BIGINT) AS h_a,
        |    CAST(sum(CAST(cd AS BIGINT)) FILTER (g = 'click' AND cd > lo AND cd < hi) AS BIGINT) AS ts_a,
        |    sum(w) FILTER (g = 'click') AS ws_a,
        |    sum(w * w) FILTER (g = 'click') AS wq_a,
        |    CAST(count(*) FILTER (g = 'view') AS BIGINT) AS n_b,
        |    CAST(count(*) FILTER (g = 'view' AND cd > lo AND cd < hi) AS BIGINT) AS h_b,
        |    CAST(sum(CAST(cd AS BIGINT)) FILTER (g = 'view' AND cd > lo AND cd < hi) AS BIGINT) AS ts_b,
        |    sum(w) FILTER (g = 'view') AS ws_b,
        |    sum(w * w) FILTER (g = 'view') AS wq_b
        |  FROM j
        |),
        |k AS (SELECT * FROM m WHERE h_a > 1 AND h_b > 1),
        |e AS (
        |  SELECT *,
        |    (CAST(n_a AS DOUBLE) - 1) * ((wq_a - ws_a * ws_a / CAST(n_a AS DOUBLE)) / (n_a - 1))
        |      / (CAST(h_a AS DOUBLE) * (CAST(h_a AS DOUBLE) - 1)) AS sea2,
        |    (CAST(n_b AS DOUBLE) - 1) * ((wq_b - ws_b * ws_b / CAST(n_b AS DOUBLE)) / (n_b - 1))
        |      / (CAST(h_b AS DOUBLE) * (CAST(h_b AS DOUBLE) - 1)) AS seb2,
        |    CAST(ts_a AS DOUBLE) / h_a AS tma, CAST(ts_b AS DOUBLE) / h_b AS tmb
        |  FROM k
        |)
        |SELECT h_a, h_b,
        |       round(tma / 100.0, 4) AS tmean_a, round(tmb / 100.0, 4) AS tmean_b,
        |       round((tmb - tma)
        |             / CASE WHEN sea2 + seb2 <= 0 THEN NULL ELSE sqrt(sea2 + seb2) END, 4) AS t,
        |       round((sea2 + seb2) * (sea2 + seb2)
        |             / CASE WHEN sea2 + seb2 <= 0 THEN NULL
        |                    ELSE sea2 * sea2 / (h_a - 1) + seb2 * seb2 / (h_b - 1) END, 4) AS df
        |FROM e""".stripMargin,
    // Readability replay: the same regex match counts (RE2-safe
    // classes), identical score expression.
    "q258_readability" ->
      """SELECT doc_id,
        |       CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
        |         AS n_sentences,
        |       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
        |         AS n_words,
        |       CAST(greatest(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')), 1) AS BIGINT)
        |         AS n_syllables,
        |       CASE WHEN length(text) - length(replace(text, ' ', '')) + 1 = 0 THEN NULL
        |            ELSE round(206.835
        |                 - 1.015 * (CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE)
        |                            / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
        |                 - 84.6 * (CAST(greatest(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')), 1) AS DOUBLE)
        |                           / (length(text) - length(replace(text, ' ', '')) + 1)), 4)
        |       END AS flesch
        |FROM documents""".stripMargin,
    // Label-balance replay: exact shares, 6dp entropy contributions.
    "q259_label_balance" ->
      """WITH g AS (
        |  SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n
        |  FROM embeddings WHERE label IS NOT NULL GROUP BY 1
        |),
        |w AS (
        |  SELECT label, n, sum(n) OVER () AS t,
        |         count(*) OVER () AS k,
        |         max(n) OVER () AS mx, min(n) OVER () AS mn
        |  FROM g
        |),
        |c AS (
        |  SELECT *, round(-(CAST(n AS DOUBLE) / t) * ln(CAST(n AS DOUBLE) / t), 6) AS ec
        |  FROM w
        |)
        |SELECT label, n, round(CAST(n AS DOUBLE) / t, 4) AS share,
        |       round(sum(ec) OVER (), 4) AS entropy,
        |       round(ln(CAST(k AS DOUBLE)), 4) AS uniform_entropy,
        |       round(CAST(mx AS DOUBLE) / CAST(mn AS DOUBLE), 4) AS imbalance
        |FROM c""".stripMargin,
    // Dataset-card replay: the q37/q52 per-doc stats folded in one
    // pass + the q31 pair pipeline's distinct ids.
    "q260_dataset_card" ->
      s"""WITH $MinhashPairsSql,
         |$GopherDocSql,
         |base AS (
         |  SELECT doc_id, text, lang, string_split(text, ' ') AS w,
         |         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT)
         |           AS n_tokens
         |  FROM documents
         |),
         |q AS (
         |  SELECT doc_id,
         |         CAST((CAST(4 * least(n_tokens, 100) * n_tokens
         |                    + 300 * len(list_distinct(w))
         |                    + 300 * (n_tokens - len(list_filter(w, x -> x = 'the'))
         |                                      - len(list_filter(w, x -> x = 'a')))
         |               AS BIGINT)
         |               * 20000 + 1000 * n_tokens) // (2000 * n_tokens) AS BIGINT) AS qi
         |  FROM base
         |),
         |g AS (SELECT doc_id, (${gopherPassPred(2)}) AS gopher_pass FROM d),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(count(DISTINCT b.lang) AS BIGINT) AS n_langs,
         |         CAST(sum(length(b.text)) AS BIGINT) AS total_chars,
         |         CAST(sum(b.n_tokens) AS BIGINT) AS total_tokens,
         |         CAST(sum(q.qi) AS BIGINT) AS sq,
         |         CAST(count(CASE WHEN g.gopher_pass THEN 1 END) AS BIGINT) AS np
         |  FROM base b JOIN q USING (doc_id) JOIN g USING (doc_id)
         |),
         |dup0 AS (SELECT idA AS id FROM lshpairs UNION SELECT idB FROM lshpairs),
         |dup AS (SELECT CAST(count(*) AS BIGINT) AS ndup FROM dup0)
         |SELECT n_docs, n_langs, total_chars, total_tokens,
         |       round(CAST(sq AS DOUBLE) / n_docs / 10000.0, 4) AS mean_quality,
         |       round(CAST(np AS DOUBLE) / n_docs, 4) AS gopher_pass_rate,
         |       round(CAST(dup.ndup AS DOUBLE) / n_docs, 4) AS neardup_share
         |FROM agg CROSS JOIN dup""".stripMargin,
    // Boilerplate replay: distinct per-doc shingles, doc-share slice.
    "q261_boilerplate" ->
      s"""WITH $ShinglesSql,
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |dfc AS (
         |  SELECT s AS shingle, CAST(count(*) AS BIGINT) AS df
         |  FROM (SELECT id, unnest(list_distinct(sh)) AS s FROM shingled)
         |  GROUP BY 1
         |)
         |SELECT shingle, df, round(CAST(df AS DOUBLE) / n.n, 4) AS share
         |FROM dfc CROSS JOIN n
         |WHERE round(CAST(df AS DOUBLE) / n.n, 4) >= 0.01
         |ORDER BY share DESC, shingle LIMIT 50""".stripMargin,
    // ROC replay: q238's binning, cumulative TPR/FPR from the top bin.
    "q262_roc_curve" ->
      s"""WITH $GopherDocSql,
         |base AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS w,
         |         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT)
         |           AS n_tokens
         |  FROM documents
         |),
         |q AS (
         |  SELECT doc_id,
         |         CAST((CAST(4 * least(n_tokens, 100) * n_tokens
         |                    + 300 * len(list_distinct(w))
         |                    + 300 * (n_tokens - len(list_filter(w, x -> x = 'the'))
         |                                      - len(list_filter(w, x -> x = 'a')))
         |               AS BIGINT)
         |               * 20000 + 1000 * n_tokens) // (2000 * n_tokens) AS BIGINT) AS qi
         |  FROM base
         |),
         |g AS (SELECT doc_id, (${gopherPassPred(2)}) AS gopher_pass FROM d),
         |rows_r AS (
         |  SELECT q.qi AS u, CASE WHEN g.gopher_pass THEN 1 ELSE 0 END AS y
         |  FROM q JOIN g USING (doc_id)
         |),
         |b AS (
         |  SELECT list_transform(quantile_cont(u, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
         |           x -> round(x, 4)) AS bs
         |  FROM rows_r
         |),
         |binned AS (
         |  SELECT CAST(list_sum(list_transform(bs,
         |           x -> CASE WHEN u > x THEN 1 ELSE 0 END)) AS BIGINT) AS bin, y
         |  FROM rows_r CROSS JOIN b
         |),
         |t AS (
         |  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos
         |  FROM binned GROUP BY 1
         |),
         |c AS (
         |  SELECT bin, n, n_pos,
         |         CAST(sum(n_pos) OVER (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp,
         |         CAST(sum(n - n_pos) OVER (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn,
         |         CAST(sum(n_pos) OVER () AS BIGINT) AS tp,
         |         CAST(sum(n - n_pos) OVER () AS BIGINT) AS tn
         |  FROM t
         |)
         |SELECT bin, n, n_pos,
         |       round(CAST(cp AS DOUBLE)
         |             / CASE WHEN tp = 0 THEN NULL ELSE CAST(tp AS DOUBLE) END, 4) AS tpr,
         |       round(CAST(cn AS DOUBLE)
         |             / CASE WHEN tn = 0 THEN NULL ELSE CAST(tn AS DOUBLE) END, 4) AS fpr
         |FROM c""".stripMargin,
    // PR replay: q262's bins, step-wise AP from 6dp contributions.
    "q263_pr_curve" ->
      s"""WITH $GopherDocSql,
         |base AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS w,
         |         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT)
         |           AS n_tokens
         |  FROM documents
         |),
         |q AS (
         |  SELECT doc_id,
         |         CAST((CAST(4 * least(n_tokens, 100) * n_tokens
         |                    + 300 * len(list_distinct(w))
         |                    + 300 * (n_tokens - len(list_filter(w, x -> x = 'the'))
         |                                      - len(list_filter(w, x -> x = 'a')))
         |               AS BIGINT)
         |               * 20000 + 1000 * n_tokens) // (2000 * n_tokens) AS BIGINT) AS qi
         |  FROM base
         |),
         |g AS (SELECT doc_id, (${gopherPassPred(2)}) AS gopher_pass FROM d),
         |rows_r AS (
         |  SELECT q.qi AS u, CASE WHEN g.gopher_pass THEN 1 ELSE 0 END AS y
         |  FROM q JOIN g USING (doc_id)
         |),
         |b AS (
         |  SELECT list_transform(quantile_cont(u, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
         |           x -> round(x, 4)) AS bs
         |  FROM rows_r
         |),
         |binned AS (
         |  SELECT CAST(list_sum(list_transform(bs,
         |           x -> CASE WHEN u > x THEN 1 ELSE 0 END)) AS BIGINT) AS bin, y
         |  FROM rows_r CROSS JOIN b
         |),
         |t AS (
         |  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos
         |  FROM binned GROUP BY 1
         |),
         |c AS (
         |  SELECT bin, n, n_pos,
         |         round(CAST(sum(n_pos) OVER dw AS DOUBLE)
         |               / sum(n) OVER dw, 4) AS precision,
         |         round(CAST(sum(n_pos) OVER dw AS DOUBLE)
         |               / CASE WHEN sum(n_pos) OVER () = 0 THEN NULL
         |                      ELSE CAST(sum(n_pos) OVER () AS DOUBLE) END, 4) AS recall
         |  FROM t
         |  WINDOW dw AS (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING)
         |),
         |a AS (
         |  SELECT *, round((recall - coalesce(lag(recall) OVER (ORDER BY bin DESC), 0.0))
         |                  * precision, 6) AS apc
         |  FROM c
         |)
         |SELECT bin, n, n_pos, precision, recall,
         |       round(sum(apc) OVER (), 4) AS ap
         |FROM a""".stripMargin,
    // Best-F1 replay: the PR bins, 4dp F1, (f1 desc, bin desc) argmax.
    "q264_best_f1" ->
      s"""WITH $GopherDocSql,
         |base AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS w,
         |         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT)
         |           AS n_tokens
         |  FROM documents
         |),
         |q AS (
         |  SELECT doc_id,
         |         CAST((CAST(4 * least(n_tokens, 100) * n_tokens
         |                    + 300 * len(list_distinct(w))
         |                    + 300 * (n_tokens - len(list_filter(w, x -> x = 'the'))
         |                                      - len(list_filter(w, x -> x = 'a')))
         |               AS BIGINT)
         |               * 20000 + 1000 * n_tokens) // (2000 * n_tokens) AS BIGINT) AS qi
         |  FROM base
         |),
         |g AS (SELECT doc_id, (${gopherPassPred(2)}) AS gopher_pass FROM d),
         |rows_r AS (
         |  SELECT q.qi AS u, CASE WHEN g.gopher_pass THEN 1 ELSE 0 END AS y
         |  FROM q JOIN g USING (doc_id)
         |),
         |b AS (
         |  SELECT list_transform(quantile_cont(u, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
         |           x -> round(x, 4)) AS bs
         |  FROM rows_r
         |),
         |binned AS (
         |  SELECT CAST(list_sum(list_transform(bs,
         |           x -> CASE WHEN u > x THEN 1 ELSE 0 END)) AS BIGINT) AS bin, y
         |  FROM rows_r CROSS JOIN b
         |),
         |t AS (
         |  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos
         |  FROM binned GROUP BY 1
         |),
         |c AS (
         |  SELECT bin,
         |         round(CAST(sum(n_pos) OVER dw AS DOUBLE) / sum(n) OVER dw, 4) AS precision,
         |         round(CAST(sum(n_pos) OVER dw AS DOUBLE)
         |               / CASE WHEN sum(n_pos) OVER () = 0 THEN NULL
         |                      ELSE CAST(sum(n_pos) OVER () AS DOUBLE) END, 4) AS recall
         |  FROM t
         |  WINDOW dw AS (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING)
         |),
         |f AS (
         |  SELECT bin, precision, recall,
         |         round(2.0 * precision * recall
         |               / CASE WHEN precision + recall = 0 THEN NULL
         |                      ELSE precision + recall END, 4) AS f1
         |  FROM c
         |),
         |r AS (
         |  SELECT *, row_number() OVER (ORDER BY f1 DESC NULLS LAST, bin DESC) AS rnk
         |  FROM f
         |)
         |SELECT bin AS best_bin, precision, recall, f1
         |FROM r WHERE rnk = 1""".stripMargin,
    // Kappa replay: the same 2x2 exact table and closed form.
    "q265_kappa" ->
      s"""WITH $GopherDocSql,
         |base AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS w,
         |         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT)
         |           AS n_tokens
         |  FROM documents
         |),
         |q AS (
         |  SELECT doc_id,
         |         CAST((CAST(4 * least(n_tokens, 100) * n_tokens
         |                    + 300 * len(list_distinct(w))
         |                    + 300 * (n_tokens - len(list_filter(w, x -> x = 'the'))
         |                                      - len(list_filter(w, x -> x = 'a')))
         |               AS BIGINT)
         |               * 20000 + 1000 * n_tokens) // (2000 * n_tokens) AS BIGINT) AS qi
         |  FROM base
         |),
         |g AS (SELECT doc_id, (${gopherPassPred(2)}) AS gopher_pass FROM d),
         |j AS (
         |  SELECT CAST(q.qi AS DOUBLE) / 10000.0 >= 0.5 AS a, g.gopher_pass AS b
         |  FROM q JOIN g USING (doc_id)
         |),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST(count(*) FILTER (a AND b) AS BIGINT) AS tt,
         |         CAST(count(*) FILTER (a AND NOT b) AS BIGINT) AS tf,
         |         CAST(count(*) FILTER (NOT a AND b) AS BIGINT) AS ft,
         |         CAST(count(*) FILTER (NOT a AND NOT b) AS BIGINT) AS ff
         |  FROM j HAVING count(*) > 0
         |),
         |c AS (
         |  SELECT n, tt + ff AS n_agree,
         |         CAST(tt + ff AS DOUBLE) / n AS po,
         |         (CAST(tt + tf AS DOUBLE) * CAST(tt + ft AS DOUBLE)
         |          + CAST(ft + ff AS DOUBLE) * CAST(tf + ff AS DOUBLE))
         |           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe
         |  FROM m
         |)
         |SELECT n, CAST(n_agree AS BIGINT) AS n_agree,
         |       round(po, 4) AS p_o, round(pe, 4) AS p_e,
         |       round((po - pe) / CASE WHEN pe = 1.0 THEN NULL ELSE 1.0 - pe END, 4)
         |         AS kappa
         |FROM c""".stripMargin,
    // Dup-by-source replay: the q31 pair ids joined back to the slice.
    "q266_dup_by_source" ->
      s"""WITH $MinhashPairsSql,
         |ids AS (SELECT idA AS id FROM lshpairs UNION SELECT idB FROM lshpairs)
         |SELECT d.source AS slice, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(count(ids.id) AS BIGINT) AS n_dup,
         |       round(CAST(count(ids.id) AS DOUBLE) / count(*), 4) AS dup_share
         |FROM documents d LEFT JOIN ids ON ids.id = d.doc_id
         |GROUP BY 1""".stripMargin,
    // MCC replay: the q265 2x2, exact HUGEINT products.
    "q267_mcc" ->
      s"""WITH $GopherDocSql,
         |base AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS w,
         |         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT)
         |           AS n_tokens
         |  FROM documents
         |),
         |q AS (
         |  SELECT doc_id,
         |         CAST((CAST(4 * least(n_tokens, 100) * n_tokens
         |                    + 300 * len(list_distinct(w))
         |                    + 300 * (n_tokens - len(list_filter(w, x -> x = 'the'))
         |                                      - len(list_filter(w, x -> x = 'a')))
         |               AS BIGINT)
         |               * 20000 + 1000 * n_tokens) // (2000 * n_tokens) AS BIGINT) AS qi
         |  FROM base
         |),
         |g AS (SELECT doc_id, (${gopherPassPred(2)}) AS gopher_pass FROM d),
         |j AS (
         |  SELECT CAST(q.qi AS DOUBLE) / 10000.0 >= 0.5 AS p, g.gopher_pass AS y
         |  FROM q JOIN g USING (doc_id)
         |),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST(count(*) FILTER (p AND y) AS BIGINT) AS tp,
         |         CAST(count(*) FILTER (p AND NOT y) AS BIGINT) AS fp,
         |         CAST(count(*) FILTER (NOT p AND y) AS BIGINT) AS fn,
         |         CAST(count(*) FILTER (NOT p AND NOT y) AS BIGINT) AS tn
         |  FROM j HAVING count(*) > 0
         |),
         |c AS (
         |  SELECT *,
         |         CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn AS num,
         |         sqrt(CAST(CAST(tp + fp AS HUGEINT) * (tp + fn)
         |                   * (tn + fp) * (tn + fn) AS DOUBLE)) AS den
         |  FROM m
         |)
         |SELECT n, tp, fp, fn, tn,
         |       round(CAST(num AS DOUBLE)
         |             / CASE WHEN den = 0 THEN NULL ELSE den END, 4) AS mcc
         |FROM c""".stripMargin,
    // Brier replay: exact 1e-4-unit squared errors, closed-form
    // reference score.
    "q268_brier" ->
      s"""WITH $GopherDocSql,
         |base AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS w,
         |         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT)
         |           AS n_tokens
         |  FROM documents
         |),
         |q AS (
         |  SELECT doc_id,
         |         CAST((CAST(4 * least(n_tokens, 100) * n_tokens
         |                    + 300 * len(list_distinct(w))
         |                    + 300 * (n_tokens - len(list_filter(w, x -> x = 'the'))
         |                                      - len(list_filter(w, x -> x = 'a')))
         |               AS BIGINT)
         |               * 20000 + 1000 * n_tokens) // (2000 * n_tokens) AS BIGINT) AS qi
         |  FROM base
         |),
         |g AS (SELECT doc_id, (${gopherPassPred(2)}) AS gopher_pass FROM d),
         |j AS (
         |  SELECT q.qi AS u, CASE WHEN g.gopher_pass THEN 1 ELSE 0 END AS y
         |  FROM q JOIN g USING (doc_id)
         |),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(y) AS BIGINT) AS p,
         |         CAST(sum((u - 10000 * y) * (u - 10000 * y)) AS BIGINT) AS se
         |  FROM j HAVING count(*) > 0
         |),
         |c AS (
         |  SELECT n, CAST(p AS DOUBLE) / n AS rate,
         |         round(CAST(se AS DOUBLE) / n / 1e8, 6) AS brier
         |  FROM m
         |),
         |r AS (
         |  SELECT *, round(rate * (1.0 - rate), 6) AS brier_ref FROM c
         |)
         |SELECT n, round(rate, 4) AS base_rate, brier, brier_ref,
         |       round(1.0 - brier
         |             / CASE WHEN brier_ref = 0 THEN NULL ELSE brier_ref END, 4) AS skill
         |FROM r""".stripMargin,
  )
}
