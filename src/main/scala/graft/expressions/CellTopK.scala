package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-`k` fine-centroid labels for a vector within ONE coarse cell's
  * packed fine codebook — the per-row scorer of the SHARDED (two-level,
  * distributed-fine) IVF routing (graft.functions.Similarity
  * .trainShardedCodebook / graft.functions.Dedup
  * .cosineDupPairsShardedInt8).
  *
  * [[CodebookTopK]] scores against a BROADCAST codebook, which caps the
  * codebook at what every executor can hold (the 65,536-centroid knee:
  * k×dim doubles ≈ 134 MB at dim 256). Here the fine codebook is a
  * DataFrame keyed by coarse cell — each cell's fine matrix arrives as
  * the `members` argument of the row being scored (a keyed JOIN moved
  * it, never a broadcast), so effective k grows ∝ corpus while the only
  * broadcast left is the k₁ ≈ √k coarse matrix. This expression is the
  * per-cell analogue of CodebookTopK's flat scan and keeps its scoring
  * semantics verbatim: cosine in element order, rounded to 6 dp
  * HALF_UP, member-position tie-break (members arrive label-sorted, so
  * position order IS label order). A null/length-mismatched/zero-norm
  * query returns an EMPTY array — the vector routes nowhere and pairs
  * nowhere, matching the exact path's treatment of an undefined cosine
  * (CodebookTopK's −2.0 sentinel exists to keep its output aligned with
  * a label column; routing-to-pair consumers have no such constraint
  * and dropping is strictly safer than routing garbage).
  *
  * `members`: array<struct<flabel int, cvec array<double>, nrm double>>
  * with `nrm` precomputed at pack time by the same element-order fold
  * (the BucketCosineHits member-norm pattern). Per-candidate cost is
  * one fused dot-product loop invoked from whole-stage codegen — a
  * loop iteration, not a row.
  */
case class CellTopK(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k >= 1, "k must be >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      // an Int8VecPack query: scored as cos(codes, cvec) — the scales
      // cancel on the query side (cnorm normalizes the codes), so the
      // sharded ROUTING exchange can ship 1 B/dim packs instead of
      // 4 B/dim floats, the same bytes-cut the pair join already took
      case s: StructType => s.fields.length == 3 &&
        s.fields(0).dataType == BinaryType &&
        s.fields(1).dataType == DoubleType &&
        s.fields(2).dataType == DoubleType
      case _ => false
    }
    val memOk = right.dataType match {
      case ArrayType(s: StructType, _) => s.fields.length == 3 &&
        s.fields(0).dataType == IntegerType &&
        (s.fields(1).dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        }) &&
        s.fields(2).dataType == DoubleType
      case _ => false
    }
    if (vecOk && memOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "cell_topk needs (float/double array, array<struct<flabel int, " +
          "cvec array<double>, nrm double>>), got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  @transient private lazy val elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val queryIsPack: Boolean =
    left.dataType.isInstanceOf[StructType]

  /** Public so generated code can invoke it via a plan reference.
    * `q` is an ArrayData (float/double query) or an InternalRow (an
    * Int8VecPack), per the declared input type. */
  def topk(q: Any, members: ArrayData): ArrayData = {
    if (q == null || members == null)
      return new GenericArrayData(Array.empty[Any])
    var v: ArrayData = null
    var codes: Array[Byte] = null
    var dim = 0
    var qNorm = 0.0
    if (queryIsPack) {
      val row = q.asInstanceOf[InternalRow]
      codes = row.getBinary(0)
      if (codes == null) return new GenericArrayData(Array.empty[Any])
      dim = codes.length
      qNorm = row.getDouble(1)
    } else {
      v = q.asInstanceOf[ArrayData]
      dim = v.numElements()
      var qn = 0.0
      var i = 0
      while (i < dim) {
        val x = if (elemIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
        qn += x * x
        i += 1
      }
      qNorm = math.sqrt(qn)
    }
    if (qNorm == 0.0) return new GenericArrayData(Array.empty[Any])
    val nm = members.numElements()
    val p = math.min(k, nm)
    if (p == 0) return new GenericArrayData(Array.empty[Any])
    val bestCos = new Array[Double](p)
    val bestLbl = new Array[Int](p)
    var filled = 0
    var c = 0
    while (c < nm) {
      if (!members.isNullAt(c)) {
        val row = members.getStruct(c, 3)
        if (!row.isNullAt(1)) {
          val cent = row.getArray(1)
          if (cent.numElements() == dim) {
            var dot = 0.0
            var j = 0
            if (codes != null) {
              while (j < dim) {
                dot += codes(j).toDouble * cent.getDouble(j)
                j += 1
              }
            } else {
              while (j < dim) {
                val x =
                  if (elemIsFloat) v.getFloat(j).toDouble else v.getDouble(j)
                dot += x * cent.getDouble(j)
                j += 1
              }
            }
            val denom = qNorm * row.getDouble(2)
            if (denom != 0.0) {
              // 6-dp HALF_UP rounding: exact near-ties become POSITION
              // ties broken by member order = label order, the
              // CodebookTopK convention
              val cos = BigDecimal(dot / denom)
                .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
                .toDouble
              if (filled < p || cos > bestCos(p - 1)) {
                var ins = filled
                while (ins > 0 && cos > bestCos(ins - 1)) ins -= 1
                if (ins < p) {
                  val last = math.min(filled, p - 1)
                  var w = last
                  while (w > ins) {
                    bestCos(w) = bestCos(w - 1); bestLbl(w) = bestLbl(w - 1)
                    w -= 1
                  }
                  bestCos(ins) = cos; bestLbl(ins) = row.getInt(0)
                  if (filled < p) filled += 1
                }
              }
            }
          }
        }
      }
      c += 1
    }
    val out = new Array[Any](filled)
    var o = 0
    while (o < filled) { out(o) = bestLbl(o); o += 1 }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    val m = right.eval(input)
    topk(v, if (m == null) null else m.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val scorer = ctx.addReferenceObj("cellTopK", this,
      classOf[CellTopK].getName)
    val v = left.genCode(ctx)
    val m = right.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    ev.copy(
      code = v.code + m.code + code"""
        |final $arrCls ${ev.value} = $scorer.topk(
        |  ${v.isNull} ? null : (Object) ${v.value},
        |  ${m.isNull} ? null : ${m.value});
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellTopK =
    copy(left = newLeft, right = newRight)
}

object CellTopK {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column API: top-`k` fine labels within the row's packed cell. */
  def cell_topk(vec: Column, members: Column, k: Int): Column =
    GraftColumnBridge.toColumn(CellTopK(
      GraftColumnBridge.toExpression(vec),
      GraftColumnBridge.toExpression(members), k))
}
