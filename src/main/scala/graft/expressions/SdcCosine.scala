package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Symmetric-distance tables, broadcast once per executor: per
  * sub-space the full ksub×ksub centroid dot-product matrix
  * (`dot(s·ksub² + c1·ksub + c2)`) and the centroid squared norms
  * (`n2(s·ksub + c)`). Query-independent — ONE table serves every
  * pair, unlike the per-query ADC LUT. m·ksub² doubles (m=8,
  * ksub=256 → 4 MB) — executor metadata, never per-task. */
final case class SdcLut(
    dot: Array[Double],
    n2: Array[Double],
    m: Int,
    ksub: Int) extends Serializable

/** Symmetric PQ cosine: approximate cosine of TWO packed codes —
  * `cos(reconstruct(a), reconstruct(b))` — scored entirely from the
  * broadcast centroid-pair tables inside whole-stage codegen. This is
  * what a code-to-code k-NN join runs on: both sides stay 8 bytes, the
  * full-precision vectors are never shuffled. NULL on either side or a
  * zero-norm reconstruction scores the package-wide −2.0 sentinel. */
case class SdcCosine(
    left: Expression,
    right: Expression,
    lut: Broadcast[SdcLut]) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sdc_cosine needs two packed int64 PQ codes, got " +
            s"${l.catalogString}, ${r.catalogString}")
    }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) -2.0
    else score(a.asInstanceOf[Long], b.asInstanceOf[Long])
  }

  /** Public so generated code can invoke it via a plan reference. */
  def score(a: Long, b: Long): Double = {
    val t = lut.value
    var dot = 0.0; var na2 = 0.0; var nb2 = 0.0
    var s = 0
    while (s < t.m) {
      val ca = ((a >> (8 * s)) & 0xFF).toInt
      val cb = ((b >> (8 * s)) & 0xFF).toInt
      dot += t.dot(s * t.ksub * t.ksub + ca * t.ksub + cb)
      na2 += t.n2(s * t.ksub + ca)
      nb2 += t.n2(s * t.ksub + cb)
      s += 1
    }
    val denom = math.sqrt(na2) * math.sqrt(nb2)
    if (denom == 0.0) -2.0 else dot / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val scorer = ctx.addReferenceObj("sdcCosine", this,
      classOf[SdcCosine].getName)
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(
      code = l.code + r.code + code"""
        |final double ${ev.value} = (${l.isNull} || ${r.isNull})
        |  ? -2.0D : $scorer.score(${l.value}, ${r.value});
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SdcCosine =
    copy(left = newLeft, right = newRight)
}

object SdcCosine {
  import org.apache.spark.sql.GraftColumnBridge

  def sdc_cosine(a: Column, b: Column, lut: Broadcast[SdcLut]): Column =
    GraftColumnBridge.toColumn(SdcCosine(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b),
      lut))
}
