package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side contract is real — schema, partitioning, batch shape,
  * and the mapPartitions pipeline are what a production decode would use;
  * only the codec call itself is a deterministic STUB (this container has
  * no image/audio libraries). Swap `stubDecode` for a real decoder (JNI /
  * process-per-partition) without touching the plumbing.
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

  /** Wrap any (id, string) frame into the media schema — payload is the
    * UTF-8 bytes, metadata deterministically derived. Stands in for a real
    * object-store read of image bytes. */
  def asMedia(df: DataFrame, idCol: String, dataCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(dataCol).cast("binary").as("payload"),
      lit("image/stub").as("media_type"),
      struct(
        (length(col(dataCol)) % 1024 + 1).cast("int").as("width"),
        (length(col(dataCol)) % 768 + 1).cast("int").as("height"),
        lit("stub").as("format")).as("meta"))

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
