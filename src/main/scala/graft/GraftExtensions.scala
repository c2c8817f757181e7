package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.{DotProduct, L2SquaredDistance, TopKByDistance}

/** SQL surface for graft's custom Catalyst expressions: registers
  * `l2sq(a, b)`, `dot_product(a, b)` and `topk_by_dist(id, dist, k)` so
  * `spark.sql(...)` users get the same kernels as the Column API.
  *
  * Two registration paths:
  *  - `GraftExtensions` via `spark.sql.extensions=graft.GraftExtensions`
  *    (or `.withExtensions(new GraftExtensions)`) — cluster-wide.
  *  - [[GraftFunctions.register]] on a live session — ad hoc.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((
      FunctionIdentifier("l2sq"),
      new ExpressionInfo(classOf[L2SquaredDistance].getName, "l2sq"),
      (children: Seq[Expression]) => L2SquaredDistance(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("topk_by_dist"),
      new ExpressionInfo(classOf[TopKByDistance].getName, "topk_by_dist"),
      (children: Seq[Expression]) => GraftExtensions.topKFromSql(children)))
  }
}

object GraftExtensions {
  /** SQL builder for topk_by_dist — applies the same Long/Double input
    * casts as the Column API (GraftFunctions.topKByDist), so an int id or
    * float/decimal dist column works instead of ClassCastException-ing in
    * the raw asInstanceOf accumulator. */
  private[graft] def topKFromSql(children: Seq[Expression]): Expression =
    TopKByDistance(
      Cast(children(0), LongType),
      Cast(children(1), DoubleType),
      children(2)).toAggregateExpression()
}

object GraftFunctions {
  /** Register the same functions on an already-running session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "l2sq", es => L2SquaredDistance(es(0), es(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "dot_product", es => DotProduct(es(0), es(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "topk_by_dist", es => GraftExtensions.topKFromSql(es), "built-in")
  }
}
