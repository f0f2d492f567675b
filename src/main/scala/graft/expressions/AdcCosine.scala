package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Per-query ADC lookup tables, broadcast once per executor:
  * `dot(s·ksub + c) = q_s · cent_{s,c}` and `n2(s·ksub + c) =
  * ‖cent_{s,c}‖²`, plus the query norm. m·ksub doubles — metadata
  * scale, but embedding them as LITERAL arrays puts 2m copies of the
  * table into every task binary (the same bloat the r3 literal
  * codebook had at large k; at ksub=256 that is ~16 × 2048 doubles per
  * task). */
final case class AdcLut(
    dot: Array[Double],
    n2: Array[Double],
    m: Int,
    ksub: Int,
    qNorm: Double) extends Serializable

/** ADC cosine of a packed PQ code against one query, scored from a
  * BROADCAST LUT inside whole-stage codegen: unpack byte `s` of the
  * int64 code, two table lookups per sub-space, one division at the
  * end. Exactly `cos(q, reconstruct(code))`, summed in sub-space order
  * (deterministic); a zero-norm reconstruction or zero-norm query
  * scores the package-wide −2.0 sentinel; a NULL code scores −2.0 too
  * (nullable=false keeps the top-k ordering total). */
case class AdcCosine(
    child: Expression,
    lut: Broadcast[AdcLut]) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case LongType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"adc_cosine needs a packed int64 PQ code, got ${t.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) -2.0 else score(v.asInstanceOf[Long])
  }

  /** Public so generated code can invoke it via a plan reference. */
  def score(code: Long): Double = {
    val t = lut.value
    var dot = 0.0; var rn2 = 0.0
    var s = 0
    while (s < t.m) {
      val idx = s * t.ksub + ((code >> (8 * s)) & 0xFF).toInt
      dot += t.dot(idx); rn2 += t.n2(idx)
      s += 1
    }
    val denom = t.qNorm * math.sqrt(rn2)
    if (denom == 0.0) -2.0 else dot / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val scorer = ctx.addReferenceObj("adcCosine", this,
      classOf[AdcCosine].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code + code"""
        |final double ${ev.value} =
        |  ${c.isNull} ? -2.0D : $scorer.score(${c.value});
        """.stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : AdcCosine = copy(child = newChild)
}

object AdcCosine {
  import org.apache.spark.sql.GraftColumnBridge

  def adc_cosine(code: Column, lut: Broadcast[AdcLut]): Column =
    GraftColumnBridge.toColumn(AdcCosine(
      GraftColumnBridge.toExpression(code), lut))
}
