package graft.plans

import graft.functions.{DotProduct, GraftFunctions, LshBucket, RollingHash}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions for graft: registers the native SQL functions so
  * `spark.sql.extensions=graft.plans.GraftExtensions` exposes them to every
  * session (SQL and DataFrame API alike).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.DotName),
      new ExpressionInfo(classOf[DotProduct].getName, GraftFunctions.DotName),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.RollingHashName),
      new ExpressionInfo(classOf[RollingHash].getName, GraftFunctions.RollingHashName),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.LshBucketName),
      new ExpressionInfo(classOf[LshBucket].getName, GraftFunctions.LshBucketName),
      (exprs: Seq[Expression]) => LshBucket(exprs.head)))
  }
}
