package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.SimHash64

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions available to pure-SQL users.
  *
  * spark-submit: `--conf spark.sql.extensions=graft.GraftExtensions`;
  * or imperatively on an existing session: `GraftExtensions.registerAll`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
  }
}

object GraftExtensions {
  /** Session-scoped registration for sessions built without the
    * extensions conf (tests, notebooks). */
  def registerAll(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64",
      (children: Seq[Expression]) => SimHash64(children.head),
      "built-in")
}
