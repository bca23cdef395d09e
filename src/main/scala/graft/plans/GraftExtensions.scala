package graft.plans

import graft.functions.{DotProduct, GraftFunctions, LshBucket, Md5Prefix, NearestCell, RollingHash}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions for graft: registers the native SQL functions so
  * `spark.sql.extensions=graft.plans.GraftExtensions` exposes them to every
  * session (SQL and DataFrame API alike). Builders are the shared ones in
  * [[GraftFunctions]] — the injection path and ensureRegistered must agree.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.DotName),
      new ExpressionInfo(classOf[DotProduct].getName, GraftFunctions.DotName),
      GraftFunctions.dotBuilder))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.RollingHashName),
      new ExpressionInfo(classOf[RollingHash].getName, GraftFunctions.RollingHashName),
      GraftFunctions.rollingHashBuilder))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.LshBucketName),
      new ExpressionInfo(classOf[LshBucket].getName, GraftFunctions.LshBucketName),
      GraftFunctions.lshBucketBuilder))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.NearestCellName),
      new ExpressionInfo(classOf[NearestCell].getName, GraftFunctions.NearestCellName),
      GraftFunctions.nearestCellBuilder))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.Md5PrefixName),
      new ExpressionInfo(classOf[Md5Prefix].getName, GraftFunctions.Md5PrefixName),
      GraftFunctions.md5PrefixBuilder))
  }
}
