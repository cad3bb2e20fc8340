package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_any_contains(hashes)` — true iff ANY element of an
  * `array<bigint>` column might be in a broadcast [[BloomFilter]].
  *
  * The probe side of the two-stage decontamination
  * (Curation.decontaminateBloomStaged / DocStream.decontaminateFilter):
  * a Scala UDF here would box every document's hash array into a
  * `Seq[Long]` and break whole-stage codegen right between the codegen'd
  * ShingleHash64 that feeds it and the filter that consumes it. This
  * expression reads the unsafe array's primitive longs in place and
  * short-circuits on the first hit, inside the codegen stage.
  *
  * The sketch rides a Spark `Broadcast` captured in the expression (one
  * copy per executor, torrent-distributed), mirroring how Spark's own
  * runtime-filter `BloomFilterMightContain` receives its sketch — not a
  * plan literal, which would re-ship megabytes with every task binary.
  */
case class BloomAnyContains(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_any_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${t.sql}")
    }

  override def nullSafeEval(arr: Any): Any =
    BloomAnyContains.anyContains(bloom.value, arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloom, classOf[Broadcast[_]].getName)
    defineCodeGen(ctx, ev, arr =>
      s"graft.functions.BloomAnyContains.anyContains(" +
        s"(org.apache.spark.util.sketch.BloomFilter)$bcRef.value(), $arr)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomAnyContains {

  /** Static entry shared by eval and generated code: primitive reads,
    * short-circuit on first hit.
    */
  def anyContains(bf: BloomFilter, arr: ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (bf.mightContainLong(arr.getLong(i))) return true
      i += 1
    }
    false
  }

  /** Column API: probe an `array<bigint>` column against a broadcast sketch. */
  def apply(hashes: Column, bloom: Broadcast[BloomFilter]): Column =
    ColumnBridge.toColumn(BloomAnyContains(ColumnBridge.toExpression(hashes), bloom))
}
