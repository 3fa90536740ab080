package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point: enables the engine's SQL functions via
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) so plain-SQL users get
  * `blake2b` without touching the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("blake2b"),
      new ExpressionInfo(classOf[Blake2bExpr].getName, "blake2b"),
      exprs => functions.blake2bBuilder(exprs)))
    extensions.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "vector_dot"),
      exprs => functions.vectorDotBuilder(exprs)))
  }
}
