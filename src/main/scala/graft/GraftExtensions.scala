package graft

import org.apache.spark.sql.SparkSessionExtensions

/** `spark.sql.extensions`-style wiring for sessions built outside
  * [[Sessions.build]] (e.g. spark-submit with
  * `--conf spark.sql.extensions=graft.GraftExtensions`): registers the
  * custom planner strategy, optimizer rule, and native functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => plans.TopKStrategy)
    e.injectOptimizerRule(_ => plans.RewriteRowNumberTopK)
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[functions.CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.CosineSimilarity(exprs(0), exprs(1))))
  }
}
