package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`) —
  * training-data-pipeline layer.
  *
  * Scale design:
  *  - brute-force top-k is a single narrow projection (dot product via
  *    `zip_with`/`aggregate` HOFs — no UDF) followed by
  *    `orderBy(...).limit(k)`, which Spark plans as TakeOrderedAndProject:
  *    per-partition partial top-k, only k rows per partition reach the
  *    driver-side merge — no global sort, no full shuffle;
  *  - the LSH path buckets vectors by random-hyperplane sign bits
  *    (deterministic seeded hyperplanes); queries probe only their bucket,
  *    turning a full scan into a 1/2^bits scan at a measured recall cost;
  *  - all-pairs forms are never materialized.
  */
object Ann {

  /** Dot product of two array<float/double> columns — `zip_with` +
    * `aggregate`, stays in codegen. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force cosine top-k against one query vector (broadcast as a
    * literal array — no join at all). Deterministic tie-break on vec_id. */
  def topKCosine(
      embeddings: DataFrame,
      query: Seq[Float],
      k: Int
  ): DataFrame = {
    val q = typedlitSeq(query)
    embeddings
      .select(col("vec_id"),
        cosine(col("embedding"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  private def typedlitSeq(v: Seq[Float]): Column =
    array(v.map(x => lit(x.toDouble)): _*)

  /** Random-hyperplane LSH bucket id: `bits` sign bits of dot products with
    * seeded pseudo-random hyperplanes. Hyperplane component h[j][d] is a
    * deterministic hash of (j, d) mapped to [-1, 1) — reproducible on any
    * cluster without shipping matrices. */
  def lshBucket(emb: Column, bits: Int, dim: Int, seed: Long = 7L): Column = {
    val bitCols = (0 until bits).map { j =>
      val d = dot(emb, array((0 until dim).map(i => lit(hashUnit(seed, j, i))): _*))
      when(d >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << j)
    }
    bitCols.reduce(_ + _)
  }

  /** Deterministic pseudo-random unit in [-1, 1). */
  def hashUnit(seed: Long, j: Int, i: Int): Double = {
    var z = seed + j * 0x9E3779B97F4A7C15L + i * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  /** LSH-bucketed ANN: assign every vector a bucket once (one narrow pass),
    * then the query probes only its own bucket. Returns top-k within the
    * bucket; recall vs brute force is measured in the spec. */
  def topKCosineLsh(
      embeddings: DataFrame,
      query: Seq[Float],
      k: Int,
      bits: Int = 4,
      seed: Long = 7L
  ): DataFrame = {
    val dim = query.length
    val bucketed = embeddings.withColumn(
      "bucket", lshBucket(col("embedding"), bits, dim, seed))
    // query bucket computed driver-side with the same hash — no job needed
    val qBucket = {
      var acc = 0L
      (0 until bits).foreach { j =>
        var d = 0.0
        (0 until dim).foreach(i => d += query(i) * hashUnit(seed, j, i))
        if (d >= 0) acc |= (1L << j)
      }
      acc
    }
    val q = typedlitSeq(query)
    bucketed
      .where(col("bucket") === qBucket)
      .select(col("vec_id"), cosine(col("embedding"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Embedding-cosine near-duplicate detection (the dedup path for
    * embedded corpora): vectors are LSH-bucketed once (narrow pass), only
    * same-bucket pairs are compared, and survivors are exact-cosine
    * verified. Multi-band: `bands` independent hyperplane sets; a pair is
    * a candidate if it collides in ANY band (recall compounds per band —
    * near-identical vectors miss a b-bit band with prob ≈ b·θ/π, so four
    * 8-bit bands push recall ≥ 0.999 at θ ≈ 0.05 rad). Bucket fan-out is
    * capped like the MinHash path (boilerplate guard). */
  def embeddingNearDupPairs(
      embeddings: DataFrame,
      dim: Int,
      minCosine: Double = 0.95,
      bits: Int = 8,
      bands: Int = 4,
      maxBucket: Int = 256,
      seed: Long = 7L
  ): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        lshBucket(col("embedding"), bits, dim, seed + b * 1000003L).as("key"))
    }
    val bandedAll = embeddings
      .select(col("vec_id"), col("embedding"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("vec_id"), col("embedding"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    // skew guard: a degenerate bucket (e.g. the all-zeros region) would go
    // quadratic in the self-join — drop oversized buckets explicitly
    // (inspect via bucketStats; not a silent cap)
    val sizes = bandedAll.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("_bsz"))
    val banded = bandedAll.join(sizes, Seq("band", "key"))
      .where(col("_bsz") <= maxBucket)
      .drop("_bsz")
    val a = banded.select(col("band"), col("key"),
      col("vec_id").as("id1"), col("embedding").as("e1"))
    val bDf = banded.select(col("band"), col("key"),
      col("vec_id").as("id2"), col("embedding").as("e2"))
    a.join(bDf, Seq("band", "key"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        cosine(col("e1"), col("e2")).as("cosine"))
      .where(col("cosine") >= minCosine)
      .groupBy(col("id1"), col("id2"))
      .agg(first(col("cosine")).as("cosine"))
  }

  /** IVF-style coarse quantization: per-bucket centroid table (one
    * aggregation), for inspection/repartition planning at scale. */
  def bucketStats(embeddings: DataFrame, bits: Int, dim: Int,
      seed: Long = 7L): DataFrame =
    embeddings
      .withColumn("bucket", lshBucket(col("embedding"), bits, dim, seed))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
}
