package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.unsafe.types.UTF8String

/** Randomized differential properties for the pure kernels the engine's
  * dedup/canonicalization correctness rests on — each checked against an
  * independent straight-line reference implementation, not against the
  * code under test. Samples are drawn with FIXED seeds (deterministic
  * suite; scalatestplus is not in the offline cache, so generators are
  * driven directly via `Gen.pureApply`). */
class PropertySpec extends AnyFunSuite {

  private val genParams = Gen.Parameters.default

  /** 200 seeded samples of a generator. */
  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (1 to n).map(i => g.pureApply(genParams, Seed(i.toLong)))

  private lazy val spark = SparkTestSession.spark

  // --- generators ------------------------------------------------------

  /** Texts with adversarial spacing: empty tokens (double spaces),
    * leading/trailing spaces, unicode words, duplicates. */
  private val wordGen: Gen[String] = Gen.oneOf(
    "a", "b", "cc", "déjà", "über", "w1", "w2", "-", "x.y", "ß")
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, wordGen)
    seps <- Gen.listOfN(math.max(n - 1, 0), Gen.oneOf(" ", "  ", "   "))
    lead <- Gen.oneOf("", " ")
    trail <- Gen.oneOf("", " ", "  ")
  } yield lead + ws.zipAll(seps, "", "").map(p => p._1 + p._2).mkString + trail

  // --- WordShingles vs a straight-line reference -----------------------

  /** Reference: Spark `split(text, " ")` semantics (keep empty tokens),
    * slice+join shingles, first-occurrence distinct. */
  private def refShingles(text: String, n: Int): Seq[String] = {
    val toks = text.split(" ", -1).toSeq
    if (toks.length < n) Seq.empty
    else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" "))
      .distinct
  }

  test("property: WordShingles ≡ split/slice/distinct reference on adversarial spacing") {
    samples(Gen.zip(textGen, Gen.choose(1, 4)), 400).foreach {
      case (text, n) =>
        val got = graft.functions.WordShingles
          .compute(UTF8String.fromString(text), n)
          .toArray[UTF8String](org.apache.spark.sql.types.StringType)
          .map(_.toString).toSeq
        assert(got == refShingles(text, n), s"text='$text' n=$n")
    }
  }

  // --- MinHash vs an independent straight-line reference ----------------

  /** Independent reimplementation of the sigVersion-2 spec (FNV-1a over
    * each shingle STRING's UTF-8 bytes + splitmix lanes) built on the
    * split/slice shingle reference — different code shape (string-level,
    * collection combinators) than the offset-arithmetic production kernel,
    * so boundary off-by-ones cannot cancel out across both. */
  private def refMinHash(text: String, k: Int, n: Int): Seq[Long] = {
    def mix(z0: Long): Long = {
      var z = z0
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val sig = Array.fill(k)(Long.MaxValue)
    val toks = text.split(" ", -1).toSeq
    val shingles =
      if (toks.length < n) Seq.empty[String]
      else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" "))
    shingles.foreach { s =>
      val h0 = s.getBytes("UTF-8").foldLeft(0xCBF29CE484222325L)(
        (h, b) => (h ^ (b & 0xFFL)) * 0x100000001B3L)
      val h = mix(h0)
      (0 until k).foreach { j =>
        val hj = mix(h ^ (j * 0x9E3779B97F4A7C15L))
        if (hj < sig(j)) sig(j) = hj
      }
    }
    sig.toSeq
  }

  test("property: MinHashSig ≡ independent string-level reference (exact bits)") {
    samples(Gen.zip(textGen, Gen.oneOf(4, 32), Gen.choose(1, 4)), 300)
      .foreach { case (text, k, n) =>
        assert(graft.ops.Dedup.minhashSignatureScala(text, k, n).toSeq ==
          refMinHash(text, k, n), s"text='$text' k=$k n=$n")
      }
  }

  // --- MinHash jaccard estimation --------------------------------------

  test("property: MinHash lane agreement estimates true shingle jaccard (seeded)") {
    val rnd = new scala.util.Random(7)
    val k = 256
    (1 to 25).foreach { _ =>
      // two texts sharing a controlled fraction of a token pool
      val shared = (1 to 20).map(i => s"s$i")
      val aOnly = (1 to rnd.nextInt(15) + 1).map(i => s"a$i")
      val bOnly = (1 to rnd.nextInt(15) + 1).map(i => s"b$i")
      val a = (shared ++ aOnly).mkString(" ")
      val b = (shared ++ bOnly).mkString(" ")
      val sa = graft.ops.Dedup.minhashSignatureScala(a, k, 3)
      val sb = graft.ops.Dedup.minhashSignatureScala(b, k, 3)
      val est = sa.zip(sb).count(p => p._1 == p._2).toDouble / k
      val sha = refShingles(a, 3).toSet
      val shb = refShingles(b, 3).toSet
      val truth = (sha & shb).size.toDouble / (sha | shb).size
      // 256 lanes → σ = sqrt(j(1-j)/256) ≤ 0.032; ±0.15 is ~5σ, and the
      // generator is seeded so this is deterministic, not flaky
      assert(math.abs(est - truth) < 0.15,
        s"est=$est truth=$truth a='${a.take(40)}…'")
    }
  }

  // --- connected components vs driver union-find -----------------------

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  test("property: ConnectedComponents ≡ union-find on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 10).foreach { round =>
      val nNodes = 5 + rnd.nextInt(60)
      val nEdges = 1 + rnd.nextInt(80)
      val edges = (1 to nEdges).map(_ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val got = graft.canon.ConnectedComponents
          .run(edges.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = unionFind(edges)
        // same node set, same label-invariant partition AND the same
        // min-id representative per component
        assert(got == want, s"round $round: $edges")
      }
    }
  }

  // --- Rebuilt token offsets on adversarial spacing ---------------------

  test("property: Rebuilt.fromText tokens cover exactly the non-space runs, offsets exact") {
    samples(textGen, 400).foreach { (text: String) =>
      val item = graft.sources.Rebuilt.fromText("u", "fr", "ar", text,
        lineWidth = 12)
      val toks = item.ppreb.flatMap(_.t).sortBy(_.s)
      // exact offsets, no space inside any token
      toks.foreach { t =>
        assert(t.s >= 0 && t.s + t.l <= text.length)
        val w = text.substring(t.s, t.s + t.l)
        assert(w.nonEmpty && !w.contains(' '), s"'$w' in '$text'")
      }
      // the tokens are exactly the maximal non-space runs of the text
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var i = 0
      while (i < text.length) {
        if (text.charAt(i) != ' ') {
          val start = i
          while (i < text.length && text.charAt(i) != ' ') i += 1
          runs += ((start, i - start))
        } else i += 1
      }
      assert(toks.map(t => (t.s, t.l)) == runs.toSeq, s"text='$text'")
      // break offsets stay in bounds and nested
      assert(item.pb.toSet.subsetOf(item.lb.toSet))
      assert(item.rb.toSet.subsetOf(item.pb.toSet))
    }
  }
}
