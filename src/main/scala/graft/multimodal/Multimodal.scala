package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The metadata path is REAL: [[ImageHeaders]] parses format and pixel
  * dimensions from the payload's magic bytes (PNG/JPEG/GIF/BMP), pure JVM.
  * Only the pixel-feature codec call is a deterministic STUB (this
  * container has no image/audio libraries). Swap `stubDecode` for a real
  * decoder (JNI / process-per-partition) without touching the plumbing.
  */
object Multimodal {

  /** Canonical media-table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("media_type", StringType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType))))))

  /** Real header decode as a column: null when the payload is not a
    * recognized image, else a (width, height, format) struct read from the
    * format's own header — [[ImageHeaders.ImageMeta]]'s field order IS the
    * `meta` struct's schema. */
  private val headerMeta =
    udf((payload: Array[Byte]) => ImageHeaders.decode(payload))

  def imageMeta(payload: Column): Column = headerMeta(payload)

  /** Wrap any (id, bytes-or-string) frame into the media schema — payload
    * is the raw bytes (UTF-8 for strings), metadata parsed from the real
    * image header when the payload is one (PNG/JPEG/GIF/BMP); opaque
    * non-image payloads get `application/octet-stream` and a null meta. */
  def asMedia(df: DataFrame, idCol: String, dataCol: String): DataFrame = {
    val meta = headerMeta(col(dataCol).cast("binary"))
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(dataCol).cast("binary").as("payload"),
      coalesce(concat(lit("image/"), meta.getField("format")),
        lit("application/octet-stream")).as("media_type"),
      meta.as("meta"))
  }

  /** STUB decode: a real implementation would hand `payload` to an image
    * codec here. The stub derives a deterministic 8-dim feature vector
    * from the payload bytes so the pipeline shape (binary → float array)
    * is fully exercised and testable. */
  private def stubDecode(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      acc(i % 8) += (payload(i) & 0xff)
      i += 1
    }
    acc.map(a => a.toFloat / 255.0f)
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** Batch feature extraction: one decoder instance per partition (the
    * expensive init a real codec needs), rows streamed through it. This is
    * the Scala analog of a pandas-UDF `mapInPandas` batch loop. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map { r =>
        val id = r.getLong(0)
        val payload = Option(r.getAs[Array[Byte]](1))
          .getOrElse(Array.emptyByteArray) // null payload = empty media
        Row(id, payload.length, stubDecode(payload).toSeq)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Deterministic frame-sampling stand-in: pick every `stride`-th byte
    * window as a "frame" (mirrors video frame-sample semantics). */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.select(col("media_id"),
      posexplode(split(base64(col("payload")), "(?<=\\G.{8})")).as(Seq("pos", "frame")))
      .filter(pmod(col("pos"), lit(stride)) === 0)
}
