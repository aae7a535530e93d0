package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ner.{AliasTrieScorer, NerStage}

object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/tmp/graft_scaling_corpus_2000000"
    val articles = spark.read.parquet(dir).as[graft.core.Article]
    val scorer = new AliasTrieScorer
    println("===== NO SHUFFLE =====")
    NerStage.detect(articles, scorer).explain("formatted")
    println("===== SHUFFLE =====")
    NerStage.detect(articles, scorer, numPartitions = 32).explain("formatted")
    spark.stop()
  }
}
