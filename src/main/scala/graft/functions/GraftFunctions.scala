package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType}

import graft.functions.expressions.{FreqItemsAgg, PolyHash64, VecCosine, VecDot, VecEuclidean}

/** SQL registration of graft's native expressions, two ways:
  *
  *   - `GraftFunctions.register(spark)` — imperative, for an existing
  *     session (tests, notebooks);
  *   - `spark.sql.extensions=graft.functions.GraftSessionExtensions` —
  *     declarative injection at session build, the production path.
  *
  * After either, `SELECT vec_cosine(a.embedding, b.embedding) ...` works in
  * plain Spark SQL.
  */
object GraftFunctions {

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (args => VecDot(args(0), args(1))),
    "vec_cosine" -> (args => VecCosine(args(0), args(1))),
    "vec_euclidean" -> (args => VecEuclidean(args(0), args(1))),
    "poly_hash64" -> (args => PolyHash64(args(0))),
    // freq_items(token, capacity): Misra-Gries heavy-hitters sketch;
    // capacity must be a literal (it sizes the aggregation buffer).
    // Match a foldable integral Literal explicitly — calling eval() on an
    // arbitrary parsed expression (a column ref, a subquery) would throw
    // an internal Unresolved exception instead of this message.
    "freq_items" -> (args => FreqItemsAgg(args(0), args(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, _: IntegerType) => i
      case org.apache.spark.sql.catalyst.expressions.Literal(l: Long, _: LongType) => l.toInt
      case org.apache.spark.sql.catalyst.expressions.Literal(s: Short, _: ShortType) => s.toInt
      case other => throw new IllegalArgumentException(
        "freq_items capacity must be an integer literal, got " +
        (if (other.foldable && other.resolved) String.valueOf(other.eval())
         else other.sql))
    }).toAggregateExpression()))

  def register(spark: SparkSession): Unit = fns.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.expressions", name),
      builder)
  }

  def inject(ext: SparkSessionExtensions): Unit = fns.foreach { case (name, builder) =>
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.expressions", name),
      builder))
  }
}

class GraftSessionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.inject(ext)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinPruning)
    ext.injectOptimizerRule(_ => graft.plans.MetadataAggregates)
    ext.injectParser((_, parser) => new graft.sql.GraftSqlParser(parser))
  }
}
