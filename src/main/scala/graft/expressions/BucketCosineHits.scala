package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All members of a packed bucket whose cosine against the query vector
  * clears a threshold, as `array<struct<id, cos>>` — the compiled inner
  * loop of centroid-blocked near-dup search (Dedup.cosineDupPairsBlocked).
  *
  * Why a custom Expression (SURVEY §7.3 preference order (b)): the
  * candidate set of a blocked similarity self-join is
  * probes·bucketSize·n — orders of magnitude larger than input or
  * output — so the per-candidate cost decides the whole operator. Both
  * built-in formulations pay per-candidate ROW costs: a candidate join
  * materializes a two-vector row per candidate inside the sort-merge
  * join (~550 B of memory traffic each; measured 90 s / 200k vectors),
  * and the HOF form `filter(transform(members, …), …)` allocates a
  * struct per candidate and evaluates the lambda through interpreted
  * `Expression.eval` (measured slower still). Here each candidate is
  * three fused primitive loops over the member's elements — compiled
  * JVM code invoked from inside whole-stage codegen, like
  * [[CodebookTopK]] — and only SURVIVORS allocate an output struct.
  *
  * Semantics match `round(cosine_native(q, m.v), 4) >= threshold`
  * exactly: cosine in element order with double accumulation
  * ([[CosineSimilarity]]), HALF_UP rounding to 4 dp via BigDecimal
  * (what `round()` does), null/length-mismatch/zero-norm cosines
  * dropped (null never clears a threshold). The BigDecimal rounding
  * only runs for candidates within 5e-5 of the threshold's acceptance
  * region — a raw cosine below `threshold − 5e-5` cannot round up to
  * pass, so the hot loop stays allocation-free.
  *
  * The query vector's own bucket entry survives as a cos≈1 self-hit
  * (id-type-generic self-exclusion would box every member id); callers
  * drop it with one post-explode `a =!= id` filter at survivor scale.
  * A null query or null members yields an empty array. Member ids pass
  * through verbatim at their input type; mutable values (strings) are
  * defensively copied out of the packed row's buffer.
  */
case class BucketCosineHits(left: Expression, right: Expression,
    threshold: Double) extends BinaryExpression {

  private def memberStruct: StructType = right.dataType match {
    case ArrayType(s: StructType, _) => s
    case _ => new StructType()
  }

  // total even while unresolved: error-reporting/plan-printing paths may
  // consult dataType before checkInputDataTypes rejects a malformed
  // right side, and fields(0) on the empty-struct fallback would throw
  // IndexOutOfBounds there, masking the friendly TypeCheckFailure. A
  // NullType id placeholder keeps those paths alive; checkInputDataTypes
  // remains the sole rejection point.
  override def dataType: DataType = {
    val (idT, idN) = memberStruct.fields.headOption
      .map(f => (f.dataType, f.nullable))
      .getOrElse((NullType: DataType, true))
    ArrayType(StructType(Seq(
      StructField("id", idT, idN),
      StructField("cos", DoubleType, nullable = false))),
      containsNull = false)
  }

  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def vecOk(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    // 2-field form: (id, vec) — norms re-accumulated per candidate;
    // 3-field form: (id, vec, norm double) — the norm precomputed ONCE
    // per member at pack time (element-order fold, bit-identical to the
    // in-loop accumulation), halving the inner loop's multiplies for
    // the probes·bucket·n candidate volume
    val membersOk = right.dataType match {
      case ArrayType(s: StructType, _) if s.fields.length == 2 =>
        vecOk(s.fields(1).dataType)
      case ArrayType(s: StructType, _) if s.fields.length == 3 =>
        vecOk(s.fields(1).dataType) && s.fields(2).dataType == DoubleType
      case _ => false
    }
    if (vecOk(left.dataType) && membersOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "bucket_cosine_hits needs (float/double array, " +
          "array<struct<id, float/double array[, norm double]>>), got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  @transient private lazy val queryIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val memberIsFloat: Boolean =
    memberStruct.fields(1).dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
  @transient private lazy val idType: DataType =
    memberStruct.fields(0).dataType
  // raw cosines below this can never round up (4 dp HALF_UP) to pass
  @transient private lazy val rawGate: Double = threshold - 5e-5

  override def eval(input: InternalRow): Any = {
    val q = left.eval(input)
    val m = right.eval(input)
    hits(if (q == null) null else q.asInstanceOf[ArrayData],
      if (m == null) null else m.asInstanceOf[ArrayData])
  }

  @transient private lazy val memberFields: Int = memberStruct.fields.length
  @transient private lazy val hasNormField: Boolean = memberFields == 3

  /** Public so generated code can invoke it via a plan reference. */
  def hits(q: ArrayData, members: ArrayData): ArrayData = {
    if (q == null || members == null) return new GenericArrayData(Array.empty[Any])
    val dim = q.numElements()
    val qv = new Array[Double](dim)
    var qn = 0.0
    var i = 0
    while (i < dim) {
      val x = if (queryIsFloat) q.getFloat(i).toDouble else q.getDouble(i)
      qv(i) = x; qn += x * x
      i += 1
    }
    val qNorm = math.sqrt(qn)
    val nm = members.numElements()
    val out = new java.util.ArrayList[Any](4)
    var c = 0
    while (c < nm) {
      if (!members.isNullAt(c)) {
        val row = members.getStruct(c, memberFields)
        val v = row.getArray(1)
        if (v != null && v.numElements() == dim) {
          // 3-field packs carry √Σy² precomputed (same element-order
          // fold — bit-identical denominator); 2-field packs pay the
          // second accumulator per candidate as before
          if (hasNormField && !row.isNullAt(2)) {
            var dot = 0.0
            var j = 0
            while (j < dim) {
              val y = if (memberIsFloat) v.getFloat(j).toDouble
                else v.getDouble(j)
              dot += qv(j) * y
              j += 1
            }
            emit(out, row, qNorm * row.getDouble(2), dot)
          } else {
            var dot = 0.0; var nb = 0.0
            var j = 0
            while (j < dim) {
              val y = if (memberIsFloat) v.getFloat(j).toDouble
                else v.getDouble(j)
              dot += qv(j) * y; nb += y * y
              j += 1
            }
            emit(out, row, qNorm * math.sqrt(nb), dot)
          }
        }
      }
      c += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def emit(out: java.util.ArrayList[Any], row: InternalRow,
      denom: Double, dot: Double): Unit = {
    if (denom != 0.0) {
      val raw = dot / denom
      if (raw >= rawGate) {
        val rounded = BigDecimal(raw)
          .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP)
          .toDouble
        if (rounded >= threshold) {
          val id = InternalRow.copyValue(row.get(0, idType))
          out.add(new GenericInternalRow(Array[Any](id, rounded)))
        }
      }
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val scorer = ctx.addReferenceObj("bucketHits", this,
      classOf[BucketCosineHits].getName)
    val q = left.genCode(ctx)
    val m = right.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    ev.copy(
      code = q.code + m.code + code"""
        |final $arrCls ${ev.value} = $scorer.hits(
        |  ${q.isNull} ? null : ${q.value},
        |  ${m.isNull} ? null : ${m.value});
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketCosineHits =
    copy(left = newLeft, right = newRight)
}

object BucketCosineHits {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column API: surviving (id, cos) structs of a packed bucket vs a
    * query vector at `round(cos,4) >= threshold`. */
  def bucket_cosine_hits(query: Column, members: Column,
      threshold: Double): Column =
    GraftColumnBridge.toColumn(BucketCosineHits(
      GraftColumnBridge.toExpression(query),
      GraftColumnBridge.toExpression(members), threshold))
}
