package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §7.5): image/audio/video as
  * opaque `binary` payloads plus typed metadata, processed by
  * per-partition batch operators.
  *
  * The decode step is STUBBED (no codec libraries in this container):
  * `decodeStub` derives deterministic fake features from the raw
  * bytes. Everything around it — the schema contract, the
  * `mapPartitions` batch shape (one iterator pass, constant memory per
  * partition, no driver involvement), and the partition-preserving
  * plumbing — is real and is what carries over to a 100 TB run where
  * the stub body is replaced by an actual decoder call.
  */
object Multimodal {

  /** Canonical media schema: payload + sniffed format + size. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("format", StringType),
    StructField("n_bytes", LongType)))

  /** Magic-number format sniff over the payload head (real parsers
    * for the common containers; pure column expression, codegen'd).
    */
  def sniffFormat(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val head = hex(substring(payload, 1, 4))
    when(head.startsWith("89504E47"), "png")
      .when(head.startsWith("FFD8FF"), "jpeg")
      .when(head.startsWith("47494638"), "gif")
      .when(head.startsWith("52494646"), "riff") // wav/avi/webp family
      .when(head.startsWith("664C6143"), "flac")
      .when(head.startsWith("1A45DFA3"), "matroska") // mkv/webm
      .otherwise("unknown")
  }

  /** Packs a text table as binary media rows — the test-data adapter
    * (the synthetic corpus has no real images; payload = UTF-8 bytes).
    */
  def packAsMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"))
      .withColumn("format", sniffFormat(col("payload")))
      .withColumn("n_bytes", length(col("payload")).cast("long"))

  /** Output schema of the stubbed feature extractor. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("feature", ArrayType(FloatType))))

  /** "Decode + featurize" over partitions. In production this body is
    * the image/audio decoder; here it emits a deterministic 8-dim
    * byte-histogram-ish feature so tests can assert exact values.
    * The batch shape (iterator → iterator, no materialization) is the
    * real contract.
    */
  def decodeStub(media: DataFrame, featureDim: Int = 8): DataFrame = {
    val enc = RowEncoder.encoderFor(FeatureSchema)
    media.select("media_id", "payload", "format", "n_bytes")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val feat = new Array[Float](featureDim)
          var i = 0
          while (i < payload.length) {
            feat(i % featureDim) += (payload(i) & 0xff) / 255.0f
            i += 1
          }
          Row(id, r.getString(2), r.getLong(3), feat.toSeq)
        }
      }(enc)
  }

  /** Frame sampling for video-like payloads: every `stride`-th chunk
    * index, as (media_id, frame_no, offset). Pure column math — the
    * actual frame grab happens in the decode stage.
    */
  def frameSample(media: DataFrame, chunkBytes: Int, stride: Int): DataFrame =
    media.select(col("media_id"), col("n_bytes"),
      explode(sequence(lit(0L),
        greatest(floor((col("n_bytes") - 1) / chunkBytes), lit(0L)))).as("chunk_no"))
      .where(col("chunk_no") % stride === 0)
      .select(col("media_id"), col("chunk_no"),
        (col("chunk_no") * chunkBytes).as("byte_offset"))
}
