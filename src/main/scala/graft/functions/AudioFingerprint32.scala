package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

import graft.operators.Audio

/** Native audio-fingerprint expression over a `binary` WAV column:
  * `afp32(blob)` — the SQL face of [[Audio.fingerprintPcm8]]'s 32-band
  * amplitude hash, so an audio near-dup audit can run as plain SQL
  * (`GROUP BY afp32(blob)`, Hamming joins) with the same bits the batch
  * operator emits.
  *
  * Each evaluation streams the blob's PCM frames (javax.sound.sampled,
  * behind the same declared-length guard as the operator — headers
  * claiming more than [[Audio.MaxFingerprintSamples]] frames refuse) — a
  * deliberately heavy scalar function like `ahash64`; the cost is the
  * decode the semantics require, inside whole-stage codegen. Undecodable,
  * null, empty, truncated, wrong-layout, or oversized blobs evaluate to
  * NULL (classify, never throw — crawl-corpus contract).
  */
case class AudioFingerprint32(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "afp32"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary argument, got ${t.sql}")
    }

  override def nullSafeEval(blob: Any): Any =
    AudioFingerprint32.compute(blob.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Long ${ev.value}Tmp = graft.functions.AudioFingerprint32.compute($c);
         |if (${ev.value}Tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Tmp.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioFingerprint32 {

  /** Column form. */
  def afp32(blob: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.toColumn(
      AudioFingerprint32(org.apache.spark.sql.graft.ColumnBridge.toExpression(blob)))

  /** Static entry the generated code calls; boxed so "undecodable" has a
    * value distinct from every fingerprint.
    */
  def compute(blob: Array[Byte]): java.lang.Long =
    Audio.fingerprintPcm8(blob, 32).map(java.lang.Long.valueOf).orNull
}
