package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's codegen'd vector kernels, so
  * `spark.sql("SELECT graft_dot(a, b) ...")` reaches the same generated
  * loop the Column API does — SQL-first users (notebooks, JDBC, dbt-style
  * pipelines) shouldn't be second-class for the hot path.
  *
  * Two entry points, one source of truth ([[GraftExtensions.functions]]):
  *  - cluster deployment: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the [[SparkSessionExtensions]] injection path; applies to every
  *    session the driver builds, before any query parses)
  *  - an already-built session (tests, embedded use):
  *    `GraftExtensions.register(spark)` via the session's FunctionRegistry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  type Builder = Seq[Expression] => Expression

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def binary(name: String, mk: (Expression, Expression) => Expression): Builder = {
    case Seq(a, b) => mk(a, b)
    case args => throw new IllegalArgumentException(
      s"$name expects exactly 2 arguments, got ${args.length}")
  }

  /** (identifier, doc, builder) triples in the exact shape
    * [[SparkSessionExtensions.injectFunction]] consumes. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - codegen'd dot product over two array<double>"),
      binary("graft_dot", DotProduct.apply)),
    (FunctionIdentifier("graft_agree_count"),
      info("graft_agree_count",
        "graft_agree_count(a, b) - codegen'd positionwise equality count over two array<long>"),
      binary("graft_agree_count", ArrayAgreeCount.apply)))

  /** Register into an already-built session (the injection path above only
    * applies at session build time). Idempotent: re-registration replaces
    * the same identifier. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (id, inf, builder) =>
      reg.registerFunction(id, inf, exprs => builder(exprs))
    }
  }
}
