package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{SimHash64, WordShingles}

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
    e.injectFunction((
      FunctionIdentifier("graft_word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_word_shingles"),
      GraftExtensions.wordShinglesBuilder))
  }
}

object GraftExtensions {
  /** Session-scoped registration for sessions built without the
    * extensions conf (tests, notebooks). */
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64",
      (children: Seq[Expression]) => SimHash64(children.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_word_shingles", wordShinglesBuilder, "built-in")
  }

  /** `graft_word_shingles(text, n)` — the width must be a foldable
    * integer literal (it parameterizes the generated code). */
  private[graft] def wordShinglesBuilder(
      children: Seq[Expression]): Expression = {
    require(children.length == 2,
      "graft_word_shingles(text, n) takes exactly two arguments")
    val n = children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"graft_word_shingles: n must be an integer literal, got $other")
    }
    WordShingles(children.head, n)
  }
}
