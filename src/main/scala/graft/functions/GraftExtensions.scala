package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering graft's native expressions with
  * the SQL function registry, so `spark.sql("SELECT cosine_similarity(a,b)
  * ...")` works alongside the Column API. Install via
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * (GraftSession does) or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity takes exactly 2 arguments")
        CosineSimilarity(args(0), args(1))
      },
    ))
  }
}
