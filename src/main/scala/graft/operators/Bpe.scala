package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding train + apply — completes the G32 (pair stats) /
  * G9 (regex-ish counts) family into a real tokenizer loop: learn a
  * greedy merge list from corpus word frequencies, then encode text
  * with it for EXACT token counts (the number a training-data budget
  * actually bills, vs G9's pretokenizer approximation).
  *
  * Representation contract (both engines replay it bit-for-bit): a
  * word is its tokens, each wrapped \u0002 token \u0003, joined by one
  * space; a document is its words' encodings joined by \u0004. A merge
  * (a, b) applies as ONE left-to-right non-overlapping string replace
  * of "a b" -> wrapped(content(a)+content(b)) per merge, merges in
  * training order — the classic sequential-replay BPE encoder, made
  * string-safe by the out-of-band wrappers (no cross-token or
  * cross-word false matches, no overlap ambiguity: engines' replace()
  * semantics agree on wrapped tokens).
  *
  * Scale shape: training iterates on the WORD-FREQUENCY table, not
  * the corpus — one corpus scan builds (word, count), every greedy
  * iteration is a pair-explode + combine over vocabulary-sized data
  * (~1M rows for a natural-language corpus at any corpus scale) and
  * ONE 1-row argmax collect (a driver-side control scalar, the
  * sanctioned shape). Encoding is a pure per-row projection — nMerges
  * chained replaces, no shuffle, stays inside whole-stage codegen.
  */
object Bpe {

  private val B = "\u0002" // token start
  private val E = "\u0003" // token end
  private val W = "\u0004" // word separator (NOT the in-word token space)

  private def content(wrapped: String): String =
    wrapped.replace(B, "").replace(E, "")

  private def merged(a: String, b: String): String = B + content(a) + content(b) + E

  /** Char-level initial encoding of one word. */
  private def wrapWord(w: Column): Column =
    concat_ws(" ", transform(split(w, ""), c => concat(lit(B), c, lit(E))))

  /** (enc, count) word-frequency table — the training working set. */
  private def vocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.words(col(textCol))).as("__word"))
      .filter(col("__word") =!= "")
      .groupBy("__word").agg(count(lit(1)).as("__cnt"))
      .select(wrapWord(col("__word")).as("__enc"), col("__cnt"))

  /** Greedy BPE training: nMerges iterations of "count adjacent token
    * pairs weighted by word frequency, merge the argmax" with the
    * deterministic tie-break (count desc, left asc, right asc — binary
    * string order, identical in DuckDB). Returns the merge list as
    * WRAPPED (left, right) token pairs in training order; stops early
    * when no pairs remain.
    */
  def train(df: DataFrame, textCol: String = "text", nMerges: Int = 8): Seq[(String, String)] = {
    var v = vocab(df, textCol).localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    for (_ <- 1 to nMerges if !done) {
      val toks = split(col("__enc"), " ")
      // 1-row argmax: a driver-side control scalar, not a data collect
      val best = v
        .filter(size(toks) >= 2)
        .select(col("__cnt"), explode(transform(
          sequence(lit(1), size(toks) - 1),
          i => struct(element_at(toks, i).as("a"), element_at(toks, i + 1).as("b"))))
          .as("__p"))
        .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
        .agg(sum(col("__cnt")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        out += ((a, b))
        // nMerges chained replaces: linear plan, no branching — no
        // checkpoint needed (unlike Dedup.clusters' two-branch rounds)
        v = v.withColumn("__enc",
          replace(col("__enc"), lit(a + " " + b), lit(merged(a, b))))
      }
    }
    out.toSeq
  }

  /** Apply a trained merge list: adds `out` = EXACT BPE token count
    * per row. Tokens = in-word spaces + word separators + 1 on the
    * fully-merged encoding; empty text counts 0.
    */
  def encode(
      df: DataFrame,
      merges: Seq[(String, String)],
      textCol: String = "text",
      out: String = "n_bpe_tokens"): DataFrame = {
    val enc0 = concat_ws(W, transform(TextAnalysis.words(col(textCol)), wrapWord(_)))
    val encN = merges.foldLeft(enc0) { case (c, (a, b)) =>
      replace(c, lit(a + " " + b), lit(merged(a, b)))
    }
    df.withColumn(out,
      when(length(col(textCol)) === 0, lit(0L)).otherwise(
        (length(encN) - length(replace(encN, lit(" "), lit("")))).cast("long") +
          (length(encN) - length(replace(encN, lit(W), lit("")))).cast("long") + 1L))
  }
}
