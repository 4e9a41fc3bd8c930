package graft

import graft.functions.{BodyCodec, VectorMath}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extensions entry point: makes the engine's custom
  * expressions available to ANY session (including pure-SQL users)
  * via
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  * — the idiomatic deployment hook for a Spark-native library (no
  * session-side registration calls needed). Grows with the engine:
  * optimizer rules / strategies slot in here the moment profiling
  * motivates one.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("deflate"),
      new ExpressionInfo(BodyCodec.DeflateCompress.getClass.getName, "deflate"),
      (exprs: Seq[Expression]) => BodyCodec.DeflateCompress(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("inflate"),
      new ExpressionInfo(BodyCodec.DeflateDecompress.getClass.getName, "inflate"),
      (exprs: Seq[Expression]) => BodyCodec.DeflateDecompress(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_long"),
      new ExpressionInfo(VectorMath.DotLongArrays.getClass.getName, "dot_long"),
      (exprs: Seq[Expression]) => VectorMath.DotLongArrays(exprs.head, exprs(1))))
  }
}
