package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
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
  * per-cell analogue of CodebookTopK's scan and keeps its scoring
  * semantics verbatim: cosine in element order, rounded to 6 dp
  * HALF_UP, member-position tie-break (members arrive label-sorted, so
  * position order IS label order). A null/length-mismatched/zero-norm
  * query returns an EMPTY array — the vector routes nowhere and pairs
  * nowhere, matching the exact path's treatment of an undefined cosine
  * (CodebookTopK's −2.0 sentinel exists to keep its output aligned with
  * a label column; routing-to-pair consumers have no such constraint
  * and dropping is strictly safer than routing garbage).
  *
  * SUB-COARSE walk (the r9 fix for the measured Θ(n^1.5) routing term,
  * VERDICT r8 item 1): a flat member scan costs k₂·dim per probe row,
  * and the sharded sizing puts k₂ ≈ √(n/targetBucket) — the per-row
  * cost itself grew with the corpus (measured α 1.472 at 2.5M→6M
  * vectors, the n^1.5 signature). When `subc` carries the per-cell
  * sub-coarse layer [[CellCoarsePack]] builds (√k₂ sub-centroids, each
  * with its member positions), the scan becomes CodebookTopK's
  * two-level walk one level down: score the √k₂ sub-centroids (raw,
  * unrounded — internal ordering only), greedily take the best
  * sub-cells until they hold max(128, 6·k) member candidates, then run
  * the EXACT scoring — same rounding, same position tie-break,
  * positions ascending — over that candidate subset only. Per-row cost
  * drops to ~(√k₂ + 128 + 6k)·dim, flat in n across the measured tiers.
  * The walk is skipped — bit-identically flat — when `subc` is empty
  * (small cell or pre-r9 pack), when k ≥ members (an EXHAUSTIVE ask:
  * the "pFine ≥ max k₂ ⇒ provably exact" oracle contract must keep
  * scanning everything), or when the greedy pool reaches the whole
  * cell anyway. The subset selection is the one approximate step; the
  * dedup recall argument survives because near-duplicates route
  * near-identically — gated in CompiledExprSpec against the exact
  * O(n²) join with the walk forced on.
  *
  * `members`: array<struct<flabel int, cvec array<double>, nrm double>>
  * with `nrm` precomputed at pack time by the same element-order fold
  * (the BucketCosineHits member-norm pattern). `subc`:
  * array<struct<svec array<double>, snrm double, mpos array<int>>> from
  * [[CellCoarsePack]] (empty array ⇒ flat). Per-candidate cost is one
  * fused dot-product loop invoked from whole-stage codegen — a loop
  * iteration, not a row.
  */
case class CellTopK(first: Expression, second: Expression,
    third: Expression, k: Int) extends TernaryExpression {

  require(k >= 1, "k must be >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = first.dataType match {
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
    val memOk = second.dataType match {
      case ArrayType(s: StructType, _) => s.fields.length == 3 &&
        s.fields(0).dataType == IntegerType &&
        (s.fields(1).dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        }) &&
        s.fields(2).dataType == DoubleType
      case _ => false
    }
    val subOk = third.dataType match {
      case ArrayType(s: StructType, _) => s.fields.length == 3 &&
        (s.fields(0).dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        }) &&
        s.fields(1).dataType == DoubleType &&
        (s.fields(2).dataType match {
          case ArrayType(IntegerType, _) => true
          case _ => false
        })
      case _ => false
    }
    if (vecOk && memOk && subOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "cell_topk needs (float/double array or int8 pack, " +
          "array<struct<flabel int, cvec array<double>, nrm double>>, " +
          "array<struct<svec array<double>, snrm double, " +
          "mpos array<int>>>), got " +
          s"${first.dataType.catalogString} / " +
          s"${second.dataType.catalogString} / " +
          s"${third.dataType.catalogString}")
  }

  @transient private lazy val elemIsFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val queryIsPack: Boolean =
    first.dataType.isInstanceOf[StructType]

  /** Raw dot(query, cent) in element order — the shared inner loop of
    * member scoring and sub-cell scoring. Exactly one of `codes` / `v`
    * is non-null, per the declared query type. */
  private def qDot(codes: Array[Byte], v: ArrayData, cent: ArrayData,
      dim: Int): Double = {
    var dot = 0.0
    var j = 0
    if (codes != null) {
      while (j < dim) {
        dot += codes(j).toDouble * cent.getDouble(j)
        j += 1
      }
    } else {
      while (j < dim) {
        val x = if (elemIsFloat) v.getFloat(j).toDouble else v.getDouble(j)
        dot += x * cent.getDouble(j)
        j += 1
      }
    }
    dot
  }

  /** Member positions the exact scan should visit, ASCENDING — or null
    * for a flat scan of every member. Mirrors CodebookTopK
    * .candidatePositions: raw sub-cell scores order the walk, the pool
    * floor is max(128, 6·k), and a pool that would cover the whole
    * cell returns null (flat is equal and cheaper). */
  private def walkPositions(codes: Array[Byte], v: ArrayData,
      qNorm: Double, dim: Int, subc: ArrayData, nm: Int): Array[Int] = {
    if (subc == null) return null
    val ns = subc.numElements()
    if (ns == 0) return null
    if (k >= nm) return null // exhaustive ask: scan everything
    val want = math.max(128, 6 * k)
    if (want >= nm) return null
    val sScore = new Array[Double](ns)
    var j = 0
    while (j < ns) {
      var s = -2.0
      if (!subc.isNullAt(j)) {
        val row = subc.getStruct(j, 3)
        if (!row.isNullAt(0)) {
          val svec = row.getArray(0)
          if (svec.numElements() == dim) {
            val denom = qNorm * row.getDouble(1)
            if (denom != 0.0) s = qDot(codes, v, svec, dim) / denom
          }
        }
      }
      sScore(j) = s
      j += 1
    }
    val order = Array.range(0, ns).sortBy(j => (-sScore(j), j))
    var total = 0
    var take = 0
    while (take < ns && total < want) {
      val row = subc.getStruct(order(take), 3)
      total += (if (row.isNullAt(2)) 0 else row.getArray(2).numElements())
      take += 1
    }
    if (total >= nm) return null // would scan everything — flat is equal
    val out = new Array[Int](total)
    var o = 0
    var t = 0
    while (t < take) {
      val row = subc.getStruct(order(t), 3)
      if (!row.isNullAt(2)) {
        val ms = row.getArray(2)
        val nmm = ms.numElements()
        var i = 0
        while (i < nmm) { out(o) = ms.getInt(i); o += 1; i += 1 }
      }
      t += 1
    }
    java.util.Arrays.sort(out)
    out
  }

  /** Public so generated code can invoke it via a plan reference.
    * `q` is an ArrayData (float/double query) or an InternalRow (an
    * Int8VecPack), per the declared input type. */
  def topk(q: Any, members: ArrayData, subc: ArrayData): ArrayData = {
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
    val cand = walkPositions(codes, v, qNorm, dim, subc, nm)
    val total = if (cand == null) nm else cand.length
    val bestCos = new Array[Double](p)
    val bestLbl = new Array[Int](p)
    var filled = 0
    var ci = 0
    while (ci < total) {
      val c = if (cand == null) ci else cand(ci)
      if (!members.isNullAt(c)) {
        val row = members.getStruct(c, 3)
        if (!row.isNullAt(1)) {
          val cent = row.getArray(1)
          if (cent.numElements() == dim) {
            val dot = qDot(codes, v, cent, dim)
            val denom = qNorm * row.getDouble(2)
            if (denom != 0.0) {
              // 6-dp HALF_UP rounding: exact near-ties become POSITION
              // ties broken by member order = label order, the
              // CodebookTopK convention (the walk visits positions
              // ascending, so the tie-break matches the flat scan on
              // the scored subset)
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
      ci += 1
    }
    val out = new Array[Any](filled)
    var o = 0
    while (o < filled) { out(o) = bestLbl(o); o += 1 }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val v = first.eval(input)
    val m = second.eval(input)
    val s = third.eval(input)
    topk(v,
      if (m == null) null else m.asInstanceOf[ArrayData],
      if (s == null) null else s.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val scorer = ctx.addReferenceObj("cellTopK", this,
      classOf[CellTopK].getName)
    val v = first.genCode(ctx)
    val m = second.genCode(ctx)
    val s = third.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    ev.copy(
      code = v.code + m.code + s.code + code"""
        |final $arrCls ${ev.value} = $scorer.topk(
        |  ${v.isNull} ? null : (Object) ${v.value},
        |  ${m.isNull} ? null : ${m.value},
        |  ${s.isNull} ? null : ${s.value});
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CellTopK =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CellTopK {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column API: top-`k` fine labels within the row's packed cell,
    * walking the row's sub-coarse layer when one is present. */
  def cell_topk(vec: Column, members: Column, subc: Column,
      k: Int): Column =
    GraftColumnBridge.toColumn(CellTopK(
      GraftColumnBridge.toExpression(vec),
      GraftColumnBridge.toExpression(members),
      GraftColumnBridge.toExpression(subc), k))
}
