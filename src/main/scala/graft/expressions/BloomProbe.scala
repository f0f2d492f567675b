package graft.expressions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Column-level Bloom membership probe on Spark's NATIVE
  * `BloomFilterMightContain` expression — the codegen'd predicate the
  * engine itself injects for runtime row-level filtering — instead of a
  * Scala UDF closure.
  *
  * Why it matters: the ledger pre-gates ([[graft.sources.DedupLedger
  * .filterNewBloom]], [[graft.sources.NearDupLedger.filterNewBloom]])
  * probe once per BATCH ROW in the projection ahead of the anti-join;
  * a UDF there is an opaque black box that splits whole-stage codegen
  * and pays per-row Scala⇄Catalyst marshalling, while the native
  * expression deserializes the filter once per task and probes inside
  * the generated loop. The filter ships as a BINARY LITERAL in the
  * plan (the same way Spark's own InjectRuntimeFilter plants it), so
  * it rides the task broadcast exactly like the UDF's captured closure
  * did — no extra distribution cost, strictly less per-row cost.
  *
  * Contract: `value` must be a LONG column and the filter must have
  * been built over the SAME long domain (e.g. both sides
  * `xxhash64(key)`) — `BloomFilterImpl.putLong`/`mightContainLong` are
  * the shared hash path. Probing a filter built over raw strings with
  * a hashed value (or vice versa) would break the no-false-negative
  * guarantee, which is why the call sites hash BOTH build and probe
  * sides with `xxhash64`.
  */
object BloomProbe {

  /** Serialize a driver-built sketch to the spark-sketch stream format
    * (the format `BloomFilterMightContain.deserialize` expects). */
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** `true` iff the filter might contain the LONG `value` — no false
    * negatives, ≤fpp false positives, codegen-native. */
  def mightContainLong(bloom: BloomFilter, value: Column): Column =
    GraftColumnBridge.toColumn(
      BloomFilterMightContain(
        Literal(serialize(bloom), BinaryType),
        GraftColumnBridge.toExpression(value)))
}
