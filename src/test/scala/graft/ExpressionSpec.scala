package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.link.Linker
import graft.ops.Dedup

class ExpressionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("entry() smoke: flagship pipeline returns triples") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq == Seq("subj", "pred", "obj"))
  }

  test("native SimHash64 expression: Column API == scalar, null-safe, codegen'd") {
    import spark.implicits._
    val df = Seq(Some("the quick brown fox"), Some(""), None).toDF("text")
    val got = df.select(Dedup.simhash64(col("text")).as("sig")).collect()
    assert(got(0).getLong(0) == Dedup.simhash64Scala("the quick brown fox"))
    assert(got(1).getLong(0) == 0L)
    assert(got(2).isNullAt(0)) // null in → null out (UnaryExpression default)
    // expression participates in codegen (it is not a UDF in the plan)
    val plan = df.select(Dedup.simhash64(col("text"))).queryExecution
      .executedPlan.toString
    assert(plan.contains("graft_simhash64"), plan)
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
  }

  test("SQL registration via GraftExtensions.registerAll") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql("SELECT graft_simhash64('a b c') AS s").head.getLong(0)
    assert(r == Dedup.simhash64Scala("a b c"))
  }

  test("expandOccurrences explodes every literal occurrence (L2)") {
    import spark.implicits._
    val text = "Reuters dit que Reuters confirme."
    val m = graft.core.Mention(
      "GDL-1936-05-02-a-i0001", "org.ent.pressagency.Reuters", "Reuters",
      "Reuters", "Q130879", 0, 0, 7, 0, 7, 0.99, "fr",
      "GDL-1936-05-02-a-i0001:0:7:newsag:bert_fr")
    val mentions = Seq(m).toDS()
    val texts = Seq(("GDL-1936-05-02-a-i0001", text)).toDF("url", "text")
    val out = Linker.expandOccurrences(mentions, texts).collect().sortBy(_.lOffset)
    assert(out.length == 2)
    assert(out.map(x => (x.lOffset, x.rOffset)).toSeq == Seq((0, 7), (16, 23)))
    out.foreach(x => assert(text.substring(x.lOffset, x.rOffset) == "Reuters"))
  }
}
