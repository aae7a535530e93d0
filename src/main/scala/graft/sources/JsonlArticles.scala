package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Article

/** JSONL content-item ingest (SURVEY S1-S3) — fixture-parity reader for the
  * reference's `*.jsonl(.bz2)` article archives
  * (`cli_tagger.py:250-281`; schema per `tests/na_tagger_in.jsonl`).
  *
  * Scale note: bz2 is non-splittable — one partition per file — which is
  * why all scale paths go through parquet tables instead (SURVEY §7.4 risk
  * 6); this reader exists for golden-parity tests and one-off ingest, and
  * `from_json` with an explicit schema keeps parsing Catalyst-native with
  * column pruning (the reference parses whole records in Python closures).
  */
object JsonlArticles {

  /** Content-item schema (`tests/na_tagger_in.jsonl`, accesses at
    * `cli_tagger.py:130-131,220,282`). */
  val ContentItemSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("pp", ArrayType(IntegerType)),
    StructField("d", StringType),
    StructField("ts", StringType),
    StructField("tp", StringType),
    StructField("t", StringType),
    StructField("ft", StringType),
    StructField("lg_comp", StringType)
  ))

  /** Raw content-item rows. The `length(value) > 2` pre-filter is S2
    * (`cli_tagger.py:280`). */
  def readContentItems(spark: SparkSession, paths: String*): DataFrame =
    spark.read.text(paths: _*)
      .where(length(col("value")) > 2)
      .select(from_json(col("value"), ContentItemSchema).as("ci"))
      .select(col("ci.*"))

  /** Map content items onto the engine's `Article` row (`ft` → `text`
    * byte-identically; `id` → `url`; `lg_comp` → `lang`). */
  def asArticles(contentItems: DataFrame): Dataset[Article] = {
    val spark = contentItems.sparkSession
    import spark.implicits._
    contentItems
      .select(
        col("id").as("url"),
        to_timestamp(col("ts")).as("warc_ts"),
        coalesce(col("ft"), lit("")).cast("binary").as("html"),
        coalesce(col("ft"), lit("")).as("text"),
        coalesce(col("lg_comp"), lit("")).as("lang"),
        coalesce(col("tp"), lit("")).as("tp"))
      .as[Article]
  }

  /** K1-parity writer: mention rows grouped per article into the nested
    * 2024 form `{id, sys_id, nes:[...]}` (`tests/na_tagger_out.jsonl`). */
  def toNestedJsonl(mentions: DataFrame, articleIds: DataFrame): DataFrame = {
    val nested = mentions
      .groupBy(col("url"))
      .agg(collect_list(struct(
        lit("newsag").as("type"),
        col("surface"),
        col("name"),
        col("lOffset"),
        col("rOffset"),
        col("confidence"),
        col("qid"),
        col("id"))).as("nes"))
    articleIds
      .select(col("url"))
      .join(nested, Seq("url"), "left")
      .select(
        col("url").as("id"),
        lit("graft spark alias model").as("sys_id"),
        coalesce(col("nes"), array()).as("nes"))
  }
}
