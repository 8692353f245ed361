package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: registers graft's native functions at
  * session build time —
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * This is the install-once path (every session in the deployment gets
  * the functions, same mechanism Iceberg uses for its extension SQL);
  * [[GraftFunctions.register]] remains the per-session path for
  * already-built sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_norm_sq"),
      new ExpressionInfo(classOf[VecNormSq].getName, "vec_norm_sq"),
      (args: Seq[Expression]) => VecNormSq(args(0))))
  }
}
