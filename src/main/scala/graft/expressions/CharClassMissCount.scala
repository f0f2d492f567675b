package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of CODEPOINTS in a string that are NOT in a fixed set of
  * allowed ASCII characters — the compiled form of
  * `regexp_count(text, "[^<allowed>]")` for a literal character class.
  *
  * Why a custom Expression (SURVEY §7.3 preference order (b)): the
  * punctuation/symbol ratio is the per-document inner loop of every
  * quality gate, and `regexp_count` walks the text through
  * `java.util.regex` at ~100 ns per character (measured 15.3 s for one
  * pass over the 500k-doc scale corpus — with the quality score's
  * three-pass consumers, the regex alone was ~45 of `q_quality_select`'s
  * 90 seconds). A negated literal character class needs none of the
  * regex machinery: this expression walks the string once with a
  * 128-entry boolean table (~1 ns/char), inside whole-stage codegen.
  *
  * Semantics match the regex exactly: iteration is by CODEPOINT (java
  * regex counts one match per codepoint, so an astral-plane emoji is
  * one miss, not two UTF-16 units), and every non-ASCII codepoint is a
  * miss — `[^A-Za-z0-9 ]` matches CJK characters, and so does this.
  * Null input → null.
  */
case class CharClassMissCount(child: Expression, allowed: String)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_class_miss_count needs a string, got ${t.catalogString}")
    }

  @transient private lazy val table: Array[Boolean] = {
    val t = new Array[Boolean](128)
    allowed.foreach { c =>
      require(c < 128, s"allowed set must be ASCII, got '$c'")
      t(c) = true
    }
    t
  }

  override def nullSafeEval(input: Any): Any = {
    // walk the UTF-8 BYTES directly — the allowed set is ASCII-only, so
    // an ASCII byte (< 0x80) is one codepoint tested against the table
    // and every other LEAD byte (>= 0xC0) is one non-ASCII codepoint =
    // one miss; continuation bytes (0x80..0xBF) belong to an already
    // counted codepoint and are skipped. This avoids the per-row
    // java.lang.String materialization (char[] copy + UTF-8 decode) the
    // old toString form paid in exactly the hot loop this expression
    // exists to optimize. Spark strings are valid UTF-8, so lead/
    // continuation classification is exhaustive.
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var i = 0
    var miss = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0) { // 0x00..0x7F: ASCII codepoint
        if (!table(b)) miss += 1
      } else if ((b & 0xC0) != 0x80) { // lead byte of a multi-byte cp
        miss += 1
      }
      i += 1
    }
    miss
  }

  /** Public so generated code can invoke it via a plan reference. */
  def count(s: UTF8String): Int =
    nullSafeEval(s).asInstanceOf[Int]

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val counter = ctx.addReferenceObj("classMiss", this,
      classOf[CharClassMissCount].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $counter.count($s);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CharClassMissCount = copy(child = newChild)
}

object CharClassMissCount {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column API: codepoints of `text` outside the allowed ASCII set. */
  def char_class_miss_count(text: Column, allowed: String): Column =
    GraftColumnBridge.toColumn(CharClassMissCount(
      GraftColumnBridge.toExpression(text), allowed))
}
