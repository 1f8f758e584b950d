package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Schemas.MediaRecord

/** Multimodal column plumbing: opaque `binary` payloads with typed metadata,
  * batched per-partition decode, and deterministic fake feature extraction.
  *
  * The container has no image/audio codecs, so the decode step is a STUB
  * (`fakeDecode`) — a clearly-marked deterministic stand-in. Everything
  * around it is the real Spark contract a production decoder would use:
  * binary column + metadata schema, `mapPartitions` batching (one decoder
  * init per partition, not per row), and a columnar feature output. Swapping
  * `fakeDecode` for a real JNI/codec call changes no plumbing.
  */
object Multimodal {

  /** Build a media table from the documents corpus: payload = UTF-8 bytes of
    * the text (the opaque-binary stand-in), mime/kind derived
    * deterministically. Map-only. */
  def toMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      when(col("doc_id") % 3 === 0, lit("image/png"))
        .when(col("doc_id") % 3 === 1, lit("audio/wav"))
        .otherwise(lit("video/mp4")).as("mime"),
      length(col("text")).cast("long").as("meta_len"))

  /** Feature row produced by the (stub) decoder. */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 width: Int, height: Int, n_frames: Int,
                                 byte_sum: Long)

  /** STUB — stands in for image/audio/video decoding (no codecs in this
    * container). Deterministic in the payload bytes so tests are stable.
    * A real implementation would decode `payload` here (e.g. via a native
    * lib handle created once per partition by `decodeFeatures`). */
  def fakeDecode(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length.toLong
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
    MediaFeatures(r.media_id, r.kind, n,
      width = (64 + n % 576).toInt, height = (64 + (n * 7) % 416).toInt,
      n_frames = (1 + n % 24).toInt, byte_sum = sum)
  }

  /** Partition-batched decode: the decoder "handle" is initialized once per
    * partition (the expensive part for real codecs), then streamed over the
    * iterator — constant memory, no driver involvement. */
  def decodeFeatures(spark: SparkSession, media: Dataset[MediaRecord]): DataFrame = {
    import spark.implicits._
    media.mapPartitions { it =>
      // real pipelines: init codec/native handle here, once per partition
      it.map(fakeDecode)
    }.toDF()
  }

  /** SQL-expressible slice of the pipeline (payload size, checksum, fake
    * decode dims) — the oracle-checkable contract of the plumbing. */
  def mediaFeaturesSql(docs: DataFrame): DataFrame = {
    val media = toMediaTable(docs)
    val n = col("n_bytes")
    media
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("checksum", md5(col("payload")))
      .select(
        col("media_id"), col("kind"), col("mime"), col("n_bytes"), col("checksum"),
        (lit(64) + n % 576).cast("int").as("width"),
        (lit(64) + (n * 7) % 416).cast("int").as("height"),
        (lit(1) + n % 24).cast("int").as("n_frames"))
  }
}
