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

  test("native WordShingles expression: exact parity with the HOF form") {
    import spark.implicits._
    val cases = Seq(
      "", " ", "a", "a b", "a b c", "a b c d e",
      "a  b c", "a b c ", " a b c", "a a a a a",
      "x y x y x y",                      // duplicate shingles → distinct
      "é ü ß mot café naïve über straße", // multibyte UTF-8
      (1 to 50).map(i => s"w${i % 7}").mkString(" "))
    val df = cases.toDF("text")
    val hof = df.select(col("text"), array_distinct(
      Dedup.shinglesFromToks(split(col("text"), " "), 3)).as("sh"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val native = df.select(col("text"),
      Dedup.distinctShingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    cases.foreach { c =>
      assert(native(c) == hof(c), s"mismatch for '$c'")
    }
    // null-safe + codegen participation (not a UDF in the plan)
    val withNull = Seq(Option("a b c d"), None).toDF("text")
    val got = withNull.select(Dedup.distinctShingles(col("text"), 3)).collect()
    assert(got(0).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(got(1).isNullAt(0))
    val plan = df.select(Dedup.distinctShingles(col("text"), 3))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_word_shingles"), plan)
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
  }

  test("MinHashSig golden vectors: the persisted-store hash bits are frozen") {
    // Pinned LITERAL signatures (sigVersion 2, byte-level FNV-1a + splitmix
    // lanes). A refactor changing ANY bit invalidates every persisted
    // signature store — this test fails before that ships silently. The
    // scalar/expression parity test below cannot catch it: both sides
    // share the implementation.
    assert(graft.ops.Dedup.minhashSignatureScala("a b c d", 8, 3).toSeq ==
      Seq(-7527774262517465797L, -5648662696977092344L,
        -3266088934761384696L, -561923584402119555L, 1331966423886713835L,
        -6766897350310455657L, -6285090614558246580L, 1461944798984329798L))
    assert(graft.ops.Dedup
      .minhashSignatureScala("déjà vu über alles ok", 4, 2).toSeq ==
      Seq(-6838320596913052328L, -8663087270482914889L,
        -6560083771308102888L, -1916953010297927134L))
  }

  test("native MinHashSig expression: parity with the scalar form, codegen'd, no UDF") {
    import spark.implicits._
    val texts = Seq("a b c d e f", "", "x", "a b", "w1 w2 w3 w4 w5",
      "é ü mot café naïve sur le marché")
    val df = texts.toDF("text")
    val got = df.select(col("text"),
      graft.ops.Dedup.minhashSignature(col("text"), 32, 3).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    texts.foreach { t =>
      assert(got(t) ==
        graft.ops.Dedup.minhashSignatureScala(t, 32, 3).toSeq,
        s"mismatch for '$t'")
    }
    // short texts (< n tokens) yield the all-MaxValue sentinel signature
    assert(got("x") == Seq.fill(32)(Long.MaxValue))
    // the dedup signature path is UDF-free and codegen-participating
    val plan = df.select(
      graft.ops.Dedup.minhashSignature(col("text"), 32, 3))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_minhash_sig"), plan)
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
  }

  test("SQL registration via GraftExtensions.registerAll") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql("SELECT graft_simhash64('a b c') AS s").head.getLong(0)
    assert(r == Dedup.simhash64Scala("a b c"))
    val sh = spark.sql("SELECT graft_word_shingles('a b c d', 3) AS sh")
      .head.getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    // any FOLDABLE integer expression works (evaluated at resolution)
    val sh2 = spark.sql("SELECT graft_word_shingles('a b c d', 1 + 2) AS sh")
      .head.getSeq[String](0)
    assert(sh2 == sh)
    // a non-foldable width is a loud analysis-time failure
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_word_shingles('a b c', CAST(rand() * 3 AS INT))")
        .collect()
    }
    assert(e.getMessage.contains("foldable integer"))
    val mh = spark.sql("SELECT graft_minhash_sig('a b c d', 32, 3) AS s")
      .head.getSeq[Long](0)
    assert(mh == graft.ops.Dedup.minhashSignatureScala("a b c d", 32, 3).toSeq)
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
