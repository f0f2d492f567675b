package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable t-digest quantile sketch (Dunning's merging-digest variant
  * with the k1 arcsine scale function). SURVEY §7.3's one justified
  * custom Aggregator: the built-in exact `percentile` holds every
  * distinct value on a single reducer — unusable for a high-cardinality
  * column at 100 TB — while a t-digest is fixed-size (≈ `compression`
  * centroids), single-pass, and merges associatively across partitions,
  * which is exactly the `TypedImperativeAggregate` contract.
  *
  * Accuracy: centroid size is bounded by the scale function so clusters
  * near the tails stay tiny — relative rank error is O(1/compression)
  * mid-stream and far better near 0/1. Interpolation anchors on the
  * exact min/max, so p0/p100 are exact.
  */
final class TDigest(val compression: Int) extends Serializable {
  private var cMeans = new ArrayBuffer[Double]()
  private var cWeights = new ArrayBuffer[Double]()
  private val buf = new ArrayBuffer[Double]()
  private val bufferLimit = math.max(64, 5 * compression)

  var totalWeight: Double = 0.0
  var minVal: Double = Double.PositiveInfinity
  var maxVal: Double = Double.NegativeInfinity

  def isEmpty: Boolean = totalWeight == 0.0 && buf.isEmpty

  def add(x: Double): Unit = {
    buf += x
    if (x < minVal) minVal = x
    if (x > maxVal) maxVal = x
    if (buf.length >= bufferLimit) compress()
  }

  def merge(other: TDigest): Unit = {
    other.compress()
    if (other.totalWeight == 0.0) return
    if (other.minVal < minVal) minVal = other.minVal
    if (other.maxVal > maxVal) maxVal = other.maxVal
    mergeInto(other.cMeans, other.cWeights)
  }

  /** Fold the buffer (unit-weight points) into the centroid set. */
  def compress(): Unit = if (buf.nonEmpty) {
    val ws = ArrayBuffer.fill(buf.length)(1.0)
    mergeInto(buf.clone(), ws)
    buf.clear()
  }

  /** k1 scale: k(q) = δ/(2π)·asin(2q−1); a cluster may absorb points
    * while its k-span stays ≤ 1, which caps mid-stream clusters at
    * ~2πq(1−q)·n/δ points and forces singleton clusters at the tails. */
  private def k(q: Double): Double = {
    val qc = math.min(1.0, math.max(0.0, q))
    compression / (2.0 * math.Pi) * math.asin(2.0 * qc - 1.0)
  }

  private def mergeInto(ms: ArrayBuffer[Double], ws: ArrayBuffer[Double]): Unit = {
    val n = cMeans.length + ms.length
    if (n == 0) return
    val idx = new Array[Int](n) // merged order over (existing ++ incoming)
    val allM = new Array[Double](n)
    val allW = new Array[Double](n)
    var i = 0
    while (i < cMeans.length) { allM(i) = cMeans(i); allW(i) = cWeights(i); i += 1 }
    var j = 0
    while (j < ms.length) { allM(i + j) = ms(j); allW(i + j) = ws(j); j += 1 }
    (0 until n).foreach(x => idx(x) = x)
    val order = idx.sortBy(x => allM(x))
    val total = allW.sum // grand total: existing centroids + incoming
    val newM = new ArrayBuffer[Double]()
    val newW = new ArrayBuffer[Double]()
    var curM = allM(order(0)); var curW = allW(order(0))
    var cumLeft = 0.0
    var kLeft = k(0.0)
    var p = 1
    while (p < n) {
      val m = allM(order(p)); val w = allW(order(p))
      val qRight = (cumLeft + curW + w) / total
      if (k(qRight) - kLeft <= 1.0) {
        curM = (curM * curW + m * w) / (curW + w); curW += w
      } else {
        newM += curM; newW += curW
        cumLeft += curW
        kLeft = k(cumLeft / total)
        curM = m; curW = w
      }
      p += 1
    }
    newM += curM; newW += curW
    cMeans = newM; cWeights = newW
    totalWeight = newW.sum
  }

  /** Quantile by linear interpolation between centroid centers, anchored
    * on exact min/max at the tails. */
  def quantile(q: Double): Double = {
    compress()
    if (totalWeight == 0.0) return Double.NaN
    if (cMeans.length == 1) return cMeans(0)
    val target = q * totalWeight
    var cum = 0.0
    var prevPos = 0.0
    var prevVal = minVal
    var i = 0
    while (i < cMeans.length) {
      val center = cum + cWeights(i) / 2.0
      if (target < center) {
        val span = center - prevPos
        return if (span <= 0) cMeans(i)
          else prevVal + (target - prevPos) / span * (cMeans(i) - prevVal)
      }
      cum += cWeights(i)
      prevPos = center
      prevVal = cMeans(i)
      i += 1
    }
    val span = totalWeight - prevPos
    if (span <= 0) maxVal
    else prevVal + (target - prevPos) / span * (maxVal - prevVal)
  }

  /** Re-install a deserialized centroid set verbatim. */
  private[expressions] def restore(ms: ArrayBuffer[Double],
      ws: ArrayBuffer[Double]): Unit = {
    cMeans = ms; cWeights = ws
    totalWeight = ws.sum
  }

  def serialize(): Array[Byte] = {
    compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(compression)
    out.writeDouble(minVal); out.writeDouble(maxVal)
    out.writeInt(cMeans.length)
    var i = 0
    while (i < cMeans.length) {
      out.writeDouble(cMeans(i)); out.writeDouble(cWeights(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }
}

object TDigest {
  def deserialize(bytes: Array[Byte]): TDigest = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = new TDigest(in.readInt())
    d.minVal = in.readDouble(); d.maxVal = in.readDouble()
    val n = in.readInt()
    val ms = new ArrayBuffer[Double](n); val ws = new ArrayBuffer[Double](n)
    var i = 0
    while (i < n) { ms += in.readDouble(); ws += in.readDouble(); i += 1 }
    d.restore(ms, ws)
    d
  }
}

/** TypedImperativeAggregate over [[TDigest]]: single-pass mergeable
  * quantiles with a fixed-size buffer — the partial-aggregate shape that
  * makes describe() safe on 100 TB high-cardinality columns (built-in
  * exact `percentile` gathers all values on one reducer; this gathers
  * ≈`compression` centroids per partition). Returns the requested
  * quantiles as array<double>, null on empty input.
  */
case class TDigestQuantiles(
    child: Expression,
    percentages: Seq[Double],
    compression: Int = 200,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with UnaryLike[Expression] {

  require(percentages.nonEmpty &&
    percentages.forall(p => p >= 0.0 && p <= 1.0),
    s"tdigest_quantiles percentages must be in [0, 1], got $percentages")
  require(compression >= 10, s"compression $compression too small")

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  override def update(b: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Double])
    b
  }

  override def merge(b: TDigest, o: TDigest): TDigest = { b.merge(o); b }

  override def eval(b: TDigest): Any =
    if (b.isEmpty) null
    else new GenericArrayData(percentages.map(b.quantile).toArray)

  override def serialize(b: TDigest): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest =
    TDigest.deserialize(bytes)

  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"tdigest_quantiles needs a double column, got " +
          child.dataType.catalogString)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : TDigestQuantiles = copy(child = newChild)
}

object TDigestQuantiles {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column API: t-digest quantiles of a double column. */
  def tdigest_quantiles(c: Column, percentages: Seq[Double],
      compression: Int = 200): Column =
    GraftColumnBridge.toColumn(
      TDigestQuantiles(GraftColumnBridge.toExpression(c), percentages,
        compression).toAggregateExpression())
}
