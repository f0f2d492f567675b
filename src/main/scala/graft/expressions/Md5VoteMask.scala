package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The 64 SimHash vote bits of one token as a packed long — the
  * compiled form of the 32-substring + 64-`isin` projection
  * `graft.functions.Dedup.simhash64Blocks` used to build per token.
  *
  * Why a custom Expression (SURVEY §7.3 preference order (b)): the
  * per-token vote derivation is the inner loop of the SimHash
  * fingerprint pass — every distinct token of every document pays it —
  * and the built-in form evaluated 64 `IN (<8 one-char strings>)`
  * predicates over 32 `substring` slices of the md5 HEX STRING per
  * token (~512 UTF8String comparisons plus 33 string materializations
  * per token; the fingerprint stage measured 1.7–4.7 s of the
  * q_simhash_neardup bench seconds at sf0.1). This expression computes
  * the identical bits straight off the 16 md5 BYTES in one pass, inside
  * whole-stage codegen.
  *
  * Bit semantics — EXACTLY [[graft.functions.Dedup.simhash64Blocks]]'s
  * published mapping (hex digit d of md5(token); even global bit j
  * reads digit ⌊j/2⌋'s HIGH bit — digit ∈ 8..f; odd j its LOW bit —
  * digit odd): hex digit d is the high nibble of md5 byte ⌊d/2⌋ for
  * even d, the low nibble for odd d; bit j of the returned mask is 1
  * iff the token votes +1 on global SimHash bit j. A vote sum over
  * tokens then recovers s_j = 2·Σ maskbit_j − n_tokens, so the
  * strictly-positive test `s_j > 0` becomes the integer test
  * `2·Σ maskbit_j > n` — bit-identical fingerprints. Null token →
  * null (the explode feeding this never emits one). */
case class Md5VoteMask(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_vote_mask needs a string, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    mask(input.asInstanceOf[UTF8String])

  /** Public so generated code can invoke it via a plan reference. */
  def mask(s: UTF8String): Long = {
    val md = Md5VoteMask.digests.get()
    val d = md.digest(s.getBytes) // digest() resets the instance
    var m = 0L
    var dig = 0 // hex digit index 0..31: bits (2·dig, 2·dig+1)
    while (dig < 32) {
      val b = d(dig >> 1) & 0xFF
      val nib = if ((dig & 1) == 0) (b >> 4) & 0xF else b & 0xF
      m |= ((nib >> 3) & 1).toLong << (2 * dig) // even bit: digit ∈ 8..f
      m |= (nib & 1).toLong << (2 * dig + 1) // odd bit: digit odd
      dig += 1
    }
    m
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5VoteMask", this,
      classOf[Md5VoteMask].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.mask($s);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Md5VoteMask = copy(child = newChild)
}

object Md5VoteMask {
  import org.apache.spark.sql.GraftColumnBridge

  /** One MessageDigest per task thread: getInstance per row would
    * dominate the loop this expression exists to remove. */
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Column API: packed 64-bit SimHash vote mask of `token`. */
  def md5_vote_mask(token: Column): Column =
    GraftColumnBridge.toColumn(Md5VoteMask(
      GraftColumnBridge.toExpression(token)))
}
