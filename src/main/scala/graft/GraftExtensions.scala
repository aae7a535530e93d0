package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{MinHashSig, SimHash64, WordShingles}

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
    e.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      GraftExtensions.minHashSigBuilder))
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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_sig", minHashSigBuilder, "built-in")
  }

  /** `graft_word_shingles(text, n)` — the width must be a FOLDABLE
    * integer expression (it parameterizes the generated code, so it is
    * evaluated once here at resolution time: bare literals, `1 + 2`,
    * `CAST(3 AS INT)` all work; a per-row column does not). */
  private[graft] def wordShinglesBuilder(
      children: Seq[Expression]): Expression = {
    require(children.length == 2,
      "graft_word_shingles(text, n) takes exactly two arguments")
    WordShingles(children.head, foldableInt(children(1), "n"))
  }

  /** `graft_minhash_sig(text, k, n)` — both widths must be foldable
    * integer expressions (they parameterize the generated code). */
  private[graft] def minHashSigBuilder(
      children: Seq[Expression]): Expression = {
    require(children.length == 3,
      "graft_minhash_sig(text, k, n) takes exactly three arguments")
    MinHashSig(children.head, foldableInt(children(1), "k"),
      foldableInt(children(2), "n"))
  }

  private def foldableInt(e: Expression, name: String): Int = e match {
    case x if x.foldable &&
        x.dataType == org.apache.spark.sql.types.IntegerType =>
      val v = x.eval()
      require(v != null, s"graft function: $name must not be null")
      v.asInstanceOf[Int]
    case other => throw new IllegalArgumentException(
      s"graft function: $name must be a foldable integer expression, " +
        s"got $other")
  }
}
