package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs
  * per-partition so a real codec processes a batch at a time.
  *
  * The decode itself is a clearly-marked STUB (no image/audio codecs in
  * this container): deterministic pseudo-features derived from the
  * bytes. The Spark-side contract — schema, partition-batched
  * execution, feature vector shape — is real and tested; swap
  * [[Multimodal.decodeStub]] for a codec to productionize.
  */
object Multimodal {

  final case class Media(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      features: Array[Float])

  /** STUB decoder: stands in for e.g. JPEG decode + CNN features.
    * Deterministic in the payload so tests are stable.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = bytes.length
    val width = 16 + (n % 64)
    val height = 16 + ((n / 64) % 64)
    val features = Array.tabulate(8) { i =>
      var acc = 0L
      var j = i
      while (j < n) { acc += (bytes(j) & 0xff) * (1 + i); j += 8 }
      (acc % 1000).toFloat / 1000f
    }
    (width, height, features)
  }

  /** Batch feature extraction over a binary column. Runs per-partition
    * (one decoder instance per partition, amortized setup) — the Scala
    * analogue of a pandas-batched UDF pipeline.
    */
  def extractFeatures(df: DataFrame, idCol: String = "doc_id", binCol: String = "payload"): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    spread(df.select(col(idCol).cast("long"), col(binCol)))
      .as[Media]
      .mapPartitions { it =>
        // real pipelines initialize the codec here, once per partition
        it.map { m =>
          val (w, h, feats) = decodeStub(m.payload)
          MediaFeatures(m.doc_id, m.payload.length, w, h, feats)
        }
      }
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB resize: stands in for an image resize codec. Deterministic:
    * truncate/cycle the payload to `targetBytes` (a real implementation
    * decodes, rescales, re-encodes — the Spark contract is identical:
    * binary in, binary out, same row count).
    */
  def resizeStub(bytes: Array[Byte], targetBytes: Int): Array[Byte] =
    if (bytes.isEmpty) bytes
    else Array.tabulate(targetBytes)(i => bytes(i % bytes.length))

  /** Batch resize over a binary column: binary in → binary out, same
    * row count — the exact contract of a real image-resize pipeline,
    * with [[resizeStub]] standing in for the codec. Runs per-partition
    * like [[extractFeatures]] (one codec instance per partition).
    */
  def resize(
      df: DataFrame,
      targetBytes: Int,
      idCol: String = "doc_id",
      binCol: String = "payload"): Dataset[Media] = {
    val spark = df.sparkSession
    import spark.implicits._
    spread(df.select(col(idCol).cast("long"), col(binCol)))
      .as[Media]
      .mapPartitions { it =>
        it.map(m => Media(m.doc_id, resizeStub(m.payload, targetBytes)))
      }
  }

  /** Frame sampling for "video" payloads: emit every `stride`-th
    * fixed-size window of the payload as a frame row — the one-to-many
    * expansion shape (explode at the typed level) a real video pipeline
    * needs. Runs per-partition like [[extractFeatures]].
    */
  def sampleFrames(
      df: DataFrame,
      frameBytes: Int = 64,
      stride: Int = 4,
      idCol: String = "doc_id",
      binCol: String = "payload"): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    spread(df.select(col(idCol).cast("long"), col(binCol)))
      .as[Media]
      .mapPartitions { it =>
        it.flatMap { m =>
          val nFrames = m.payload.length / frameBytes
          (0 until nFrames by stride).iterator.map { f =>
            Frame(m.doc_id, f,
              java.util.Arrays.copyOfRange(m.payload, f * frameBytes, (f + 1) * frameBytes))
          }
        }
      }
  }

  /** Demo pipeline on the documents table: texts become the opaque
    * payloads (standing in for image bytes).
    */
  def documentFeatures(documents: DataFrame): DataFrame = {
    val media = documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"))
    extractFeatures(media)
      .toDF()
      .withColumn("feat0", round(element_at(col("features"), 1).cast("double"), 4))
      .select("doc_id", "n_bytes", "width", "height", "feat0")
  }
}
