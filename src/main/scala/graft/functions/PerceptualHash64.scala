package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

import graft.operators.Multimodal

/** Native perceptual-hash expressions over a `binary` image column:
  * `ahash64(blob)` / `dhash64(blob)` — the SQL face of
  * [[Multimodal.decodeAndFeaturize]]'s hash kernels, so a near-dup image
  * audit can run as plain SQL (`GROUP BY ahash64(blob)`, Hamming joins)
  * with the same bits the batch operator emits.
  *
  * Each evaluation pixel-decodes its blob (javax.imageio, behind the same
  * decompression-bomb guard as the operator — rasters past
  * [[Multimodal.MaxDecodePixels]] refuse) — a deliberately heavy scalar
  * function, like the engine-shipped `xpath`/`from_json` family: the cost
  * is the decode the semantics require, and it runs inside whole-stage
  * codegen with no boxing beyond the nullable result. Undecodable, null,
  * empty, or oversized blobs evaluate to NULL (classify, never throw —
  * crawl-corpus contract).
  */
case class PerceptualHash64(child: Expression, gradient: Boolean)
    extends UnaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = if (gradient) "dhash64" else "ahash64"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary argument, got ${t.sql}")
    }

  override def nullSafeEval(blob: Any): Any =
    PerceptualHash64.compute(blob.asInstanceOf[Array[Byte]], gradient)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Long ${ev.value}Tmp = graft.functions.PerceptualHash64.compute($c, $gradient);
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

object PerceptualHash64 {

  /** Column forms of the two hashes. */
  def aHash(blob: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.toColumn(
      PerceptualHash64(org.apache.spark.sql.graft.ColumnBridge.toExpression(blob), gradient = false))
  def dHash(blob: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.toColumn(
      PerceptualHash64(org.apache.spark.sql.graft.ColumnBridge.toExpression(blob), gradient = true))

  /** Static entry the generated code calls. Boxed Long so "undecodable"
    * has a value distinct from every hash; one box per row on a path that
    * just ran a full image decode.
    */
  def compute(blob: Array[Byte], gradient: Boolean): java.lang.Long = {
    val img = Multimodal.readImage(blob)
    if (img == null) null
    else if (gradient) java.lang.Long.valueOf(Multimodal.dHash(Multimodal.luminanceGrid(img, 9, 8)))
    else java.lang.Long.valueOf(Multimodal.aHash(Multimodal.luminanceGrid(img, 8, 8)))
  }
}
