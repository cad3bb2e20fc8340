package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** SQL faces of the [[LogHistogram]] quantile-sketch arithmetic —
  * `qsketch_bucket(v)`, `qsketch_lo(b)`, `qsketch_hi(b)` — as native
  * codegen'd expressions (the ShingleHash64 discipline: a UDF here would
  * break whole-stage codegen on what is a hot-path map function). With
  * these plus plain `GROUP BY`, the ENTIRE sketch is expressible in SQL:
  * `SELECT source, qsketch_bucket(n_chars) b, count(*) c ... GROUP BY 1, 2`
  * is the declarative build the Aggregator face optimizes, and
  * `qsketch_lo(b)`/`qsketch_hi(b)` decode any stored bucket column back
  * to value bounds — including histograms written by other engines that
  * followed the same integer rule.
  *
  * Semantics match the kernel exactly: `qsketch_bucket` clamps negatives
  * to bucket 0 (the Aggregator's corrupt-length posture); the bound
  * decoders return NULL outside the bucket domain [0, 960) — a domain
  * error is a NULL, not an exception that kills a 100 TB query.
  */
case class QsketchBucket(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "qsketch_bucket"

  // every integral width is accepted and widened in place —
  // `qsketch_bucket(42)` (an INT literal) and INT count columns written
  // by other engines work like they do with the built-ins, without
  // reaching for the private[sql] ImplicitCastInputTypes machinery
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an integral argument, got ${t.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    LogHistogram.bucket(v.asInstanceOf[Number].longValue()).toLong

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"(long) graft.functions.LogHistogram.bucket($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared shape of the two bound decoders: NULL outside [0, 960). */
abstract class QsketchBound extends UnaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  protected def decode(b: Int): Long
  protected def kernelName: String

  // INT bucket columns (e.g. written by another engine) widen in place,
  // same posture as [[QsketchBucket]]
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an integral bucket argument, got ${t.sql}")
    }

  override def nullSafeEval(b: Any): Any = {
    val x = b.asInstanceOf[Number].longValue()
    if (x < 0 || x >= LogHistogram.NumBuckets) null else decode(x.toInt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      if ($b < 0 || $b >= ${LogHistogram.NumBuckets}) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.LogHistogram.$kernelName((int) $b);
      }""")
}

case class QsketchLo(child: Expression) extends QsketchBound {
  override def prettyName: String = "qsketch_lo"
  override protected def kernelName: String = "lowerBound"
  override protected def decode(b: Int): Long = LogHistogram.lowerBound(b)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class QsketchHi(child: Expression) extends QsketchBound {
  override def prettyName: String = "qsketch_hi"
  override protected def kernelName: String = "upperBound"
  override protected def decode(b: Int): Long = LogHistogram.upperBound(b)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
