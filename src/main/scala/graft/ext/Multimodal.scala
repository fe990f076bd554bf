package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads with a typed metadata struct.
  *
  * The Spark-side plumbing (schema, partition-preserving batch
  * processing, deterministic stand-in "decode") is real; the actual
  * media decode is STUBBED (`decodeStub`) because codec libraries are
  * not available in this environment — swap `decodeStub` for a JNI /
  * library call and everything else (schemas, mapPartitions batching,
  * downstream queries) is unchanged.
  */
object Multimodal {

  /** One media row: payload + typed metadata (the layout a 100 TB
    * multimodal lakehouse table would use; payload column stays
    * opaque so parquet never decodes it on metadata-only queries). */
  case class MediaRow(media_id: Long, modality: String, payload: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  /** Extracted features per media row. */
  case class MediaFeatures(media_id: Long, modality: String, n_bytes: Int,
                           checksum: Long, feature: Array[Float])

  /** Build a media table from the documents table: payload = UTF-8
    * bytes of the text (deterministic stand-in for real blobs). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      // stable pseudo-modality per row
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("doc_id"), lit(16)) * 64 + 256).cast("int").as("width"),
      (pmod(col("doc_id"), lit(9)) * 64 + 256).cast("int").as("height"),
      when(pmod(col("doc_id"), lit(3)) === 1, 16000).otherwise(0).cast("int").as("sample_rate"))

  /** STUB decode: a deterministic 8-dim "feature vector" derived from
    * payload bytes. Real implementation would decode the media and run
    * a feature extractor here — per partition, batched, no driver
    * involvement. The imperative per-partition loop is exactly where a
    * native decoder would sit (mapPartitions keeps library handles
    * open across rows instead of per-row init). */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      f(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    f
  }

  /** Frame sampling: every `stride`-th fixed-size block of the media
    * content — the shape of key-frame extraction for video training
    * data (sample, don't decode everything). The deterministic
    * stand-in defines a "frame" as a `frameChars`-character block of
    * the text payload (a real build swaps block slicing for codec
    * keyframe offsets; the sampling arithmetic, lazy per-row
    * evaluation and downstream schema stay identical). Pure map, no
    * shuffle — sampling 100 TB of video touches each row once and
    * reads only the sampled blocks. */
  def sampleFrames(content: Column, frameChars: Int, stride: Int): Column = {
    val nFrames = ceil(length(content).cast("double") / frameChars).cast("int")
    val idx = filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
      i => i % stride === 0 && i < nFrames)
    transform(idx, i => content.substr(i * frameChars + 1, lit(frameChars)))
  }

  /** Feature extraction over the media table — Dataset + mapPartitions
    * (the Scala analogue of mapInPandas batch processing). The
    * checksum is the 31-polynomial rolling hash of the payload bytes
    * mod 1e9+7 — for ASCII payloads it coincides with
    * [[graft.functions.RollingHash]] over the text, which is what
    * lets the driver gate value-check the mapPartitions plumbing in
    * DuckDB (an unreduced 64-bit product would wrap, and BIGINT
    * overflow is an error, not a wrap, in ANSI engines). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        var crc = 0L
        var i = 0
        while (i < r.payload.length) {
          crc = (crc * 31 + (r.payload(i) & 0xff)) % 1000000007L
          i += 1
        }
        MediaFeatures(r.media_id, r.modality, r.payload.length, crc, decodeStub(r.payload))
      }
    }
  }
}
