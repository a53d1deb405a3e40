package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride through the engine as
  * opaque `BinaryType` blobs with a typed metadata struct alongside —
  * Spark never interprets the bytes, so parquet encodes/splits/shuffles
  * them like any other column and the plan stays columnar end-to-end.
  *
  * Decode/feature-extraction runs batch-at-a-time inside `mapPartitions`
  * (one decoder instance per partition, streaming through rows — constant
  * memory, no driver involvement, scales with partition count). The codec
  * itself is STUBBED deterministically (this container ships no image/audio
  * libs); the Spark-side contract — schema, batching, partitioning — is
  * real and tested.
  *
  * Reference scope: not in the reference repo; north-star addition
  * (BASELINE.json multimodal row).
  */
object MultiModal {

  /** Typed media record: opaque payload + structured metadata. */
  case class MediaMeta(kind: String, lang: String, nChars: Long)
  case class MediaRecord(docId: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(docId: Long, nBytes: Int, headerByte: Int,
                           width: Int, height: Int, checksum: Long)

  /** Attach a payload/meta pair to the documents table. The blob is the
    * UTF-8 text bytes (a stand-in for real media bytes — deterministic and
    * content-derived, so downstream checks are meaningful).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(lit("text/fake").as("kind"), col("lang"),
        col("n_chars").cast("long").as("nChars")).as("meta"))

  /** STUB decoder — deterministic fake in place of a real image/audio
    * codec. Reads "dimensions" from the first payload bytes and computes a
    * rolling checksum; a real deployment swaps only this function body.
    */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Long) = {
    val w = 1 + (if (payload.length > 0) (payload(0) & 0x7f) else 0)
    val h = 1 + (if (payload.length > 1) (payload(1) & 0x7f) else 0)
    var cs = 0L
    var i = 0
    while (i < payload.length) { cs = cs * 131 + (payload(i) & 0xffL); i += 1 }
    (w, h, cs)
  }

  /** Batch feature extraction: one pass per partition, decoder state
    * initialized once per partition (the `it =>` prologue), rows streamed.
    * This is the shape a heavyweight codec needs — amortized init, bounded
    * memory — and it parallelizes by repartitioning upstream.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (e.g. native lib handle)
      it.map { rec =>
        val (w, h, cs) = decodeStub(rec.payload)
        val hb = if (rec.payload.nonEmpty) rec.payload(0) & 0xff else -1
        MediaFeatures(rec.docId, rec.payload.length, hb, w, h, cs)
      }
    }
  }

  /** documents → typed [[MediaRecord]] dataset (payload + meta attached,
    * columns renamed to the case-class encoder's fields). ONE definition
    * — the decode query, the plan spec, and [[features]] all consume
    * this, so a field rename cannot strand a hand-rolled copy.
    */
  def media(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    withPayload(docs).select(
      col("doc_id").as("docId"), col("payload"), col("meta")).as[MediaRecord]
  }

  /** End-to-end: documents → payload+meta → partition-parallel decode. */
  def features(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] =
    extractFeatures(spark, media(spark, docs))

  case class Frame(docId: Long, frameIdx: Int, bytes: Array[Byte])

  /** Frame sampling: slice each payload into fixed-size frames and keep
    * every `every`-th one (a video keyframe-sampling stand-in). A flatMap —
    * narrow, output rows ≈ len/(frameSize·every) per record, no shuffle;
    * downstream ops see frames as ordinary rows and parallelize by
    * repartitioning if frame counts are skewed.
    */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRecord],
                   frameSize: Int, every: Int = 1): Dataset[Frame] = {
    import spark.implicits._
    media.flatMap { rec =>
      val n = rec.payload.length
      (0 until (n + frameSize - 1) / frameSize).iterator
        .filter(_ % every == 0)
        .map { f =>
          val from = f * frameSize
          Frame(rec.docId, f,
            java.util.Arrays.copyOfRange(rec.payload, from, math.min(from + frameSize, n)))
        }
    }
  }

  /** Resize STUB: deterministic stride-downsample of the payload to
    * `targetLen` bytes (a real image resampler swaps in here; the Spark
    * contract — per-row, narrow, bounded output size — is what's tested).
    * Payloads shorter than `targetLen` pass through unchanged.
    */
  def resize(spark: SparkSession, media: Dataset[MediaRecord],
             targetLen: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    media.map { rec =>
      val p = rec.payload
      if (p.length <= targetLen) rec
      else {
        val out = new Array[Byte](targetLen)
        var i = 0
        while (i < targetLen) {
          out(i) = p((i.toLong * p.length / targetLen).toInt)
          i += 1
        }
        rec.copy(payload = out)
      }
    }
  }
}
