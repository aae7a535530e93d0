package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{CleaningPipeline, SignatureStore}

/** The composed cleaning chain: stage semantics on a planted fixture,
  * the store-append tail, and the one-text-pass guarantee (filesystem
  * read statistics — the staged artifacts live in the block manager, so
  * file-scheme bytes are exactly the parquet scans). */
class CleaningPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def words(p: String, n: Int = 30) =
    (1 to n).map(t => s"${p}_$t").mkString(" ")

  test("composed chain: contaminated, exact-dup, and near-dup docs drop; store gets survivors") {
    import spark.implicits._
    val benchToks = (1 to 12).map(i => s"b$i").mkString(" ")
    val bench = Seq((900L, benchToks)).toDF("bench_id", "text")
    val doc1 = "x1 x2 " + benchToks + " y1 y2"   // contaminated
    val doc2 = doc1 + " z1"                      // near-dup of 1, also contaminated
    val doc3 = words("m")                        // exact-dup group {3,4}: keep 3
    val doc5 = words("m") + " x9"                // near-dup of 3: dropped
    val doc6 = words("u")                        // clean unique survivor
    val docs = Seq(
      (1L, doc1), (2L, doc2), (3L, doc3), (4L, doc3), (5L, doc5),
      (6L, doc6))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("de"))

    // store pre-seeded with one retained doc (id 0) so the append path
    // and the monotone watermark are both exercised
    val store = java.nio.file.Files
      .createTempDirectory("graft_clean_store").toString
    SignatureStore.write(
      Seq((0L, words("seed"))).toDF("doc_id", "text"), store,
      nPrefixes = 8, k = 32, bands = 16, shingleN = 3)

    val kept = CleaningPipeline.cleanedMeta(docs, bench,
      keepCols = Seq("lang"), k = 32, bands = 16, shingleN = 3,
      maxBucket = 64, minJaccard = 0.8, minOverlap = 5,
      storePath = Some(store))
    assert(kept.columns.toSeq == Seq("doc_id", "lang"))
    val keptIds = kept.collect().map(_.getLong(0)).toSet
    assert(keptIds == Set(3L, 6L))

    // the full-row transform agrees
    val full = CleaningPipeline.clean(docs, bench, k = 32, bands = 16,
      shingleN = 3, maxBucket = 64, minJaccard = 0.8, minOverlap = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(full == Set(3L, 6L))

    // survivors are IN the store: a near-dup of survivor 6 pairs with it
    val probe6 = Seq((100L, doc6 + " tail")).toDF("doc_id", "text")
    val got6 = SignatureStore.probe(spark, store, probe6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got6 == Set((6L, 100L)))
    // ...and dropped docs are NOT: a near-dup of contaminated doc 1 finds
    // nothing (1 and 2 were both flagged, never appended)
    val probe1 = Seq((101L, doc1 + " w")).toDF("doc_id", "text")
    assert(SignatureStore.probe(spark, store, probe1).count() == 0)
    // a near-dup of dropped doc 5 still pairs with its retained
    // representative 3 (the store holds exactly the retained corpus)
    val probe5 = Seq((102L, doc5 + " q")).toDF("doc_id", "text")
    val got5 = SignatureStore.probe(spark, store, probe5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got5 == Set((3L, 102L)))

    // re-running the same job refuses on the watermark by default
    // (misnumbered-source protection), and succeeds idempotently as a
    // declared replay — survivors unchanged, the store still answers
    intercept[IllegalArgumentException] {
      CleaningPipeline.cleanedMeta(docs, bench, keepCols = Seq("lang"),
        k = 32, bands = 16, shingleN = 3, maxBucket = 64,
        minJaccard = 0.8, minOverlap = 5, storePath = Some(store)).count()
    }
    val rerun = CleaningPipeline.cleanedMeta(docs, bench,
      keepCols = Seq("lang"), k = 32, bands = 16, shingleN = 3,
      maxBucket = 64, minJaccard = 0.8, minOverlap = 5,
      storePath = Some(store), allowStoreReplay = true)
      .collect().map(_.getLong(0)).toSet
    assert(rerun == keptIds)
    assert(SignatureStore.probe(spark, store, probe6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((6L, 100L)))
  }

  test("pipeline refuses a store with different banding parameters") {
    import spark.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_clean_badstore").toString
    SignatureStore.write(
      Seq((0L, words("seed"))).toDF("doc_id", "text"), store,
      nPrefixes = 8, k = 32, bands = 8, shingleN = 3) // 8 bands, not 16
    val docs = Seq((1L, words("a"))).toDF("doc_id", "text")
    val bench = Seq((900L, words("bb"))).toDF("bench_id", "text")
    val e = intercept[IllegalArgumentException] {
      CleaningPipeline.cleanedMeta(docs, bench, Nil, k = 32, bands = 16,
        shingleN = 3, storePath = Some(store))
    }
    assert(e.getMessage.contains("bands"))
  }

  test("property: composed chain ≡ independent stages on seeded random corpora") {
    import spark.implicits._
    // the one-pass composition must be EXACTLY the three standalone
    // operators chained — same flags, same keep-mins, same clusters —
    // under inputs nobody hand-picked: mutation-heavy corpora (exact
    // dups, near-dups, chains), benchmarks excerpted from corpus docs
    // (guaranteed contamination), and a bucket cap that sometimes bites
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      val vocab = (0 until 30).map(i => s"v$i")
      val texts = scala.collection.mutable.ArrayBuffer.empty[String]
      def freshText(): String = {
        val n = 8 + rnd.nextInt(14)
        (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      def nextText(): String = {
        val t =
          if (texts.nonEmpty && rnd.nextInt(10) < 6) {
            val base = texts(rnd.nextInt(texts.size))
            rnd.nextInt(3) match {
              case 0 => base // exact dup
              case 1 => base + " " + vocab(rnd.nextInt(vocab.size))
              case _ =>
                val toks = base.split(" ")
                toks.updated(rnd.nextInt(toks.length),
                  vocab(rnd.nextInt(vocab.size))).mkString(" ")
            }
          } else freshText()
        texts += t
        t
      }
      val n = 20 + rnd.nextInt(40)
      val docs = (0 until n).map(i => (i.toLong, nextText()))
        .toDF("doc_id", "text")
      // bench: excerpts of a few corpus docs → some docs must flag
      val bench = (0 until 1 + rnd.nextInt(3)).map { j =>
        (900L + j,
          texts(rnd.nextInt(texts.size)).split(" ").take(10).mkString(" "))
      }.toDF("bench_id", "text")
      val (maxBucket, minOverlap) =
        (if (rnd.nextBoolean()) 2 else 64, 1 + rnd.nextInt(4))

      val composed = CleaningPipeline.cleanedMeta(docs, bench, Nil,
        k = 32, bands = 16, shingleN = 3, maxBucket = maxBucket,
        minJaccard = 0.8, minOverlap = minOverlap)
        .collect().map(_.getLong(0)).toSet
      val independent = graft.ops.Dedup.nearDupDedup(
        graft.ops.Dedup.exactDedup(
          graft.ops.Decontaminate.decontaminate(docs, bench,
            shingleN = 3, minOverlap = minOverlap)),
        k = 32, bands = 16, shingleN = 3, maxBucket = maxBucket,
        minJaccard = 0.8)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(composed == independent,
        s"seed=$seed n=$n maxBucket=$maxBucket minOverlap=$minOverlap: " +
          s"only-composed=${composed -- independent} " +
          s"only-independent=${independent -- composed}")
    }
  }

  test("corpus text is read exactly once across the whole chain") {
    import spark.implicits._
    // byte-level FS statistics can't see Spark 4's local-parquet fast
    // path (vectored reads bypass Hadoop statistics), so the corpus is
    // read through [[CountingLocalFs]] — its own scheme, every data-file
    // OPEN counted — and the assertion is self-calibrating: the composed
    // chain must open exactly as many parquet files as ONE plain scan of
    // the same table does. The independent-stages chain opens ~3× that.
    spark.sparkContext.hadoopConfiguration.set("fs.cntfs.impl",
      classOf[CountingLocalFs].getName)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_clean_once").toString
    val rows = (0L until 3000L).map { i =>
      val base = words(s"d$i", 60)
      val t = if (i % 10 == 0) words(s"d${i - 1}", 60) + " extra" else base
      (i, t)
    }
    rows.toDF("doc_id", "text").repartition(8)
      .write.mode("overwrite").parquet(s"$dir/docs")
    Seq((900L, words("bmark", 40))).toDF("bench_id", "text")
      .write.mode("overwrite").parquet(s"$dir/bench")

    // calibration: one full scan of the corpus through the counting FS
    CountingLocalFs.reset()
    spark.read.parquet(s"cntfs:$dir/docs")
      .agg(sum(length(col("text")))).collect()
    val oneScanOpens = CountingLocalFs.parquetOpens()
    assert(oneScanOpens >= 8, s"calibration degenerate: $oneScanOpens")

    CountingLocalFs.reset()
    val n = CleaningPipeline.cleanedMeta(
      spark.read.parquet(s"cntfs:$dir/docs"),
      spark.read.parquet(s"$dir/bench"), // bench on plain file:// —
      Nil,                               // only corpus opens are counted
      k = 32, bands = 16, shingleN = 3, maxBucket = 64).count()
    val composedOpens = CountingLocalFs.parquetOpens()
    assert(n > 2000 && n < 3000, s"fixture sanity: $n survivors")
    info(s"corpus file opens: one scan = $oneScanOpens, " +
      s"composed chain = $composedOpens")
    assert(composedOpens == oneScanOpens,
      s"composed chain opened corpus files $composedOpens times vs " +
        s"$oneScanOpens for a single scan — text read more than once?")
  }
}
