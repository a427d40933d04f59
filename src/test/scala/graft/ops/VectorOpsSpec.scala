package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** IVF centroid-quality property (round-2 verdict #6): trained k-means
  * centroids must beat the lowest-id default on recall@k when the low
  * ids are a degenerate sample (all in one cluster) — the realistic
  * failure mode of "first N vectors as centroids" at corpus scale.
  */
class VectorOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("graft-vector-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("k-means IVF centroids beat lowest-id centroids on recall@k") {
    import spark.implicits._
    val dim = 64; val nClusters = 8; val n = 400; val k = 5
    // 8 orthogonal cluster directions (block-one-hot) + deterministic
    // per-point perturbation. Ids 0..15 all sit in cluster 0, so the
    // lowest-id centroid default degenerates to 16 near-identical
    // centroids; ids 16+ cycle through all clusters.
    def vec(i: Int): Seq[Float] = {
      val cluster = if (i < 16) 0 else i % nClusters
      (0 until dim).map { d =>
        val base = if (d / (dim / nClusters) == cluster) 1.0f else 0.0f
        base + 0.06f * (((i * 7 + d * 13) % 11) - 5)
      }
    }
    val embs = (0 until n).map(i => (i.toLong, vec(i), i % nClusters))
      .toDF("vec_id", "embedding", "label")
    // ground truth: exact brute-force cosine top-k (test-scale N²)
    val truth = VectorOps.cosineTopK(embs, k)
      .select("vec_id", "neighbor").as[(Long, Long)].collect().toSet
    def recall(centroids: Option[Array[(Int, Seq[Double], Double)]]): Double = {
      val got = VectorOps.ivfTopK(embs, k, 16, 2, centroids)
        .select("vec_id", "neighbor").as[(Long, Long)].collect().toSet
      (truth intersect got).size.toDouble / truth.size
    }
    val rDefault = recall(None)
    val trained = VectorOps.trainCentroids(embs, nCentroids = 16, iters = 10)
    val rTrained = recall(Some(trained))
    info(f"recall@$k: lowest-id centroids $rDefault%.3f, k-means $rTrained%.3f")
    assert(rTrained > rDefault,
      f"k-means recall $rTrained%.3f did not beat lowest-id $rDefault%.3f")
    assert(rTrained >= 0.95, f"k-means recall $rTrained%.3f < 0.95")
    // determinism: training twice yields identical centroids
    val again = VectorOps.trainCentroids(embs, nCentroids = 16, iters = 10)
    assert(trained.map(_._2) sameElements again.map(_._2))
  }

  test("distributed k-means: recall matches driver trainer, deterministic " +
    "under any partitioning") {
    import spark.implicits._
    val dim = 64; val nClusters = 8; val n = 400; val k = 5
    def vec(i: Int): Seq[Float] = {
      val cluster = if (i < 16) 0 else i % nClusters
      (0 until dim).map { d =>
        val base = if (d / (dim / nClusters) == cluster) 1.0f else 0.0f
        base + 0.06f * (((i * 7 + d * 13) % 11) - 5)
      }
    }
    val embs = (0 until n).map(i => (i.toLong, vec(i), i % nClusters))
      .toDF("vec_id", "embedding", "label")
    val truth = VectorOps.cosineTopK(embs, k)
      .select("vec_id", "neighbor").as[(Long, Long)].collect().toSet
    val dist = VectorOps.trainCentroidsDistributed(embs, nCentroids = 16, iters = 10)
    val got = VectorOps.ivfTopK(embs, k, 16, 2, Some(dist))
      .select("vec_id", "neighbor").as[(Long, Long)].collect().toSet
    val recall = (truth intersect got).size.toDouble / truth.size
    info(f"distributed k-means recall@$k: $recall%.3f")
    assert(recall >= 0.95, f"distributed k-means recall $recall%.3f < 0.95")
    // DETERMINISM ACROSS PARTITIONINGS — the property the decimal
    // dimension sums exist for: a double sum would drift with the
    // aggregation order and produce partitioning-dependent codebooks.
    // Compare via doubleToLongBits (bit-for-bit, NaN-safe).
    def bits(cs: Array[(Int, Seq[Double], Double)]) =
      cs.map { case (i, v, nm) =>
        (i, v.map(java.lang.Double.doubleToLongBits).toList,
          java.lang.Double.doubleToLongBits(nm))
      }.toList
    val p3 = VectorOps.trainCentroidsDistributed(embs.repartition(3), 16, iters = 10)
    val p7 = VectorOps.trainCentroidsDistributed(embs.repartition(7), 16, iters = 10)
    assert(bits(p3) == bits(p7),
      "distributed k-means codebook differs across partitionings")
    // both trainers implement the same criterion family; their codebooks
    // need not be identical (different candidate pools) but must be
    // interchangeable in quality on this well-separated input
    val driver = VectorOps.trainCentroids(embs, nCentroids = 16, iters = 10)
    val driverGot = VectorOps.ivfTopK(embs, k, 16, 2, Some(driver))
      .select("vec_id", "neighbor").as[(Long, Long)].collect().toSet
    val driverRecall = (truth intersect driverGot).size.toDouble / truth.size
    assert(math.abs(recall - driverRecall) <= 0.05,
      f"distributed recall $recall%.3f vs driver $driverRecall%.3f " +
        "diverge by more than 0.05")
    // too few distinct vectors for the codebook must raise, not loop
    val tiny = (0 until 4).map(i => (i.toLong, vec(i), 0)).toDF("vec_id", "embedding", "label")
    intercept[IllegalArgumentException] {
      VectorOps.trainCentroidsDistributed(tiny, nCentroids = 16)
    }
  }

  test("cosineTopK broadcast-scan path equals the N² verifier bit-for-bit") {
    import spark.implicits._
    // the round-4 mapPartitions rewrite must stay exact AND tie-stable:
    // many partitions (local[4], repartition(7)) so the partition-local
    // top-k merge and (cos desc, id asc) tie order are both exercised
    // includes a ZERO-NORM row: its cosines are NaN, which sorts LARGEST
    // under Spark's window ordering — the broadcast path's insertion loop
    // must totally order it the same way (Double.compare, not >/==) or
    // the two paths diverge (round-4 review finding)
    val embs = graft.BenchDedupScaling.syntheticEmbeddings(spark, 300, 16)
      .unionByName(Seq((1000L, Seq.fill(16)(0.0f))).toDF("vec_id", "embedding"))
      .repartition(7)
    val f = col("vec_id") % 10 === 0 // 31 queries incl. the zero vector
    // compare via doubleToLongBits: Scala tuple equality uses primitive
    // == for Double, under which NaN != NaN — the bit pattern IS the
    // bit-for-bit contract and canonicalizes NaN
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Double)].collect()
        .map(t => (t._1, t._2, t._3, java.lang.Double.doubleToLongBits(t._4)))
        .toSet
    val got = rows(VectorOps.cosineTopK(embs, 3, Some(f)))
    val want = rows(VectorOps.cosineTopK(embs, 3, None).where(f))
    assert(got == want,
      s"${(got -- want).size} extra, ${(want -- got).size} missing")
    // an empty query subset yields an empty result, not a failure
    assert(VectorOps.cosineTopK(embs, 3, Some(col("vec_id") < 0)).count() == 0)
  }

  test("semanticNearDupPairs: cluster candidates, exact refine, tie rule") {
    import spark.implicits._
    // 2 orthogonal centroids; planted vectors with known geometry:
    //  ids 1,2  → cluster 0, cos(1,2) = 1.0 (colinear: v, 2v)
    //  id  3    → cluster 0 but nearly orthogonal to 1,2 (cos ≈ 0.196)
    //  ids 10,11 → cluster 1, cos ≈ 0.9806 (one flipped low-weight dim)
    //  id  20   → exact centroid TIE (equal dot with both) → cluster 0
    val c0 = Array(1.0, 0.0, 0.0, 0.0)
    val c1 = Array(0.0, 1.0, 0.0, 0.0)
    val embs = Seq(
      (1L, Seq(1.0f, 0.1f, 0.0f, 0.0f)),
      (2L, Seq(2.0f, 0.2f, 0.0f, 0.0f)),
      (3L, Seq(1.0f, 0.0f, 5.0f, 0.0f)),
      (10L, Seq(0.1f, 1.0f, 0.0f, 1.0f)),
      (11L, Seq(-0.1f, 1.0f, 0.0f, 1.0f)),
      (20L, Seq(1.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = VectorOps.semanticNearDupPairs(embs, Array(c0, c1), 0.8)
      .select("vec_a", "vec_b", "cluster")
      .as[(Long, Long, Int)].collect().toSet
    // (1,2) pass in cluster 0; (10,11) pass in cluster 1; 3 is a
    // cluster-0 CANDIDATE but the exact refine rejects it; 20 ties →
    // cluster 0, rejected by refine against 1,2 (cos ≈ 0.71-0.78 < 0.8)
    assert(out == Set((1L, 2L, 0), (10L, 11L, 1)), out)
    // tie → LOWEST centroid index (the k-means assignment rule)
    val tieCluster = VectorOps.semanticNearDupPairs(
      Seq((20L, Seq(1.0f, 1.0f, 0.0f, 0.0f)),
        (21L, Seq(1.0f, 1.0f, 0.0f, 0.001f))).toDF("vec_id", "embedding"),
      Array(c0, c1), 0.8)
      .select("cluster").as[Int].collect().toSet
    assert(tieCluster == Set(0), tieCluster)
    // cross-cluster near-identical vectors are MISSED by construction
    // (the documented boundary semantics): colinear pair split by the
    // argmax boundary produces no pair
    val miss = VectorOps.semanticNearDupPairs(
      Seq((30L, Seq(1.0f, 0.999f, 0.0f, 0.0f)),
        (31L, Seq(0.999f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"),
      Array(c0, c1), 0.8)
    assert(miss.count() == 0)
    intercept[IllegalArgumentException] {
      VectorOps.semanticNearDupPairs(embs, Array.empty, 0.8)
    }
  }

  test("PQ: 16-nibble codes; top-k recall >= 0.9 vs exact (frozen codebook)") {
    import spark.implicits._
    val embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val cb = VectorOps.pqCodebookFromMicro(graft.PqFixtures.codebookMicro)
    val codes = VectorOps.pqEncode(embs, cb).as[(Long, Long)].collect()
    assert(codes.length == embs.count())
    // re-encoding is deterministic
    val again = VectorOps.pqEncode(embs, cb).as[(Long, Long)].collect()
    assert(codes.sortBy(_._1) sameElements again.sortBy(_._1))
    // recall@3 vs the exact broadcast-scan baseline, same query set as
    // the driver query (round-6 verdict #3: >= 0.9 with re-rank)
    val filter = col("vec_id") % 20 === 0 && col("vec_id") < 4000
    val truth = VectorOps.cosineTopK(embs, 3, Some(filter))
      .select("vec_id", "neighbor").as[(Long, Long)].collect().toSet
    val got = VectorOps.pqTopK(embs, cb, filter, 3)
      .select("vec_id", "neighbor").as[(Long, Long)].collect().toSet
    val recall = (truth intersect got).size.toDouble / truth.size
    info(f"PQ recall@3 = $recall%.3f over ${truth.size} truth pairs")
    assert(recall >= 0.9, f"PQ recall $recall%.3f < 0.9")
  }

  test("frozen PQ codebook equals a fresh deterministic training run") {
    // the FreezePq artifact and the trainer must never drift: training
    // is zero-RNG (farthest-first init + strict-< Lloyd's on the
    // id-ordered sample), so regeneration is bit-reproducible — a
    // mismatch here means the committed fixture no longer describes
    // the shipped trainer (or the input table changed under it)
    val embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val fresh = VectorOps.trainPqCodebookMicro(embs)
    assert(java.util.Arrays.deepEquals(
      fresh.asInstanceOf[Array[AnyRef]],
      graft.PqFixtures.codebookMicro.asInstanceOf[Array[AnyRef]]),
      "PqFixtures.codebookMicro drifted from trainPqCodebookMicro — " +
        "regenerate via graft.tools.FreezePq")
  }

  test("IVF-PQ: full-probe equals pqTopK exactly; partial probe trades recall") {
    import spark.implicits._
    val embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val cb = VectorOps.pqCodebookFromMicro(graft.PqFixtures.codebookMicro)
    val filter = col("vec_id") % 20 === 0 && col("vec_id") < 4000
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "rnk", "neighbor").as[(Long, Long, Long)]
        .collect().toSet
    // probing EVERY bucket makes the candidate set the whole corpus —
    // the result must equal the flat PQ scan bit-for-bit (the
    // completeness argument made executable)
    val flat = rowsOf(VectorOps.pqTopK(embs, cb, filter, 3))
    val full = rowsOf(VectorOps.ivfPqTopK(embs, cb, filter, 3,
      nCoarse = 8, nProbe = 8))
    assert(full == flat, "full-probe IVF-PQ must equal the flat PQ scan")
    // partial probe (the driver default, 2 of 8 buckets): recall vs the
    // flat scan with the degenerate lowest-id default, then with TRAINED
    // coarse centroids — training the coarse quantizer is what buys
    // probe-recall at scale (the same property the IVF test pins)
    val flatPairs = flat.map { case (q, _, n) => (q, n) }
    def recallOf(cents: Option[Array[(Int, Seq[Double], Double)]]): Double = {
      val part = rowsOf(VectorOps.ivfPqTopK(embs, cb, filter, 3,
        nCoarse = 8, nProbe = 2, coarse = cents))
        .map { case (q, _, n) => (q, n) }
      (flatPairs intersect part).size.toDouble / flatPairs.size
    }
    val rDefault = recallOf(None)
    val trained = VectorOps.trainCentroids(embs, nCentroids = 8, iters = 10)
    val rTrained = recallOf(Some(trained))
    info(f"IVF-PQ nProbe=2/8 recall vs flat PQ: lowest-id $rDefault%.3f, " +
      f"k-means $rTrained%.3f")
    assert(rTrained >= rDefault,
      f"trained coarse recall $rTrained%.3f below lowest-id $rDefault%.3f")
    // 2 of 8 probes = 25% of the corpus scanned; ~0.56 recall on this
    // 3-natural-cluster corpus is the structural trade (neighbors
    // straddle coarse boundaries) — the floor guards collapse, the
    // knob for more recall is nProbe, pinned equal-at-full-probe above
    assert(rTrained >= 0.5, f"trained partial-probe recall $rTrained%.3f collapsed")
  }

  test("residual IVF-PQ beats the plain variant under re-rank pressure " +
    "(round-7 verdict #3)") {
    import spark.implicits._
    val embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val cb = VectorOps.pqCodebookFromMicro(graft.PqFixtures.codebookMicro)
    val books = VectorOps.residualBooksFromMicro(graft.PqFixtures.residualBooksMicro)
    val filter = col("vec_id") % 20 === 0 && col("vec_id") < 4000
    val truth = VectorOps.cosineTopK(embs, 3, Some(filter))
      .select("vec_id", "neighbor").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("vec_id", "neighbor").as[(Long, Long)].collect().toSet
      (truth intersect got).size.toDouble / truth.size
    }
    // the exact re-rank must NOT be the safety net: rerank barely above
    // k makes the ADC ordering itself carry recall. Full probe isolates
    // pure code quality (bucket routing identical in both variants) —
    // measured 0.573 plain vs 0.720 residual at rerank=8
    val plainFull = recallOf(VectorOps.ivfPqTopK(embs, cb, filter, 3,
      nCoarse = 8, nProbe = 8, rerank = 8))
    val residFull = recallOf(VectorOps.ivfPqResidualTopK(embs, books, filter, 3,
      nCoarse = 8, nProbe = 8, rerank = 8))
    info(f"rerank=8 full-probe: plain $plainFull%.3f, residual $residFull%.3f")
    assert(residFull >= plainFull + 0.05,
      f"residual recall $residFull%.3f did not clearly beat plain $plainFull%.3f")
    // fixed nProbe=2 (the driver default): probe misses hit both
    // variants identically, residual still wins inside probed buckets
    val plainP2 = recallOf(VectorOps.ivfPqTopK(embs, cb, filter, 3,
      nCoarse = 8, nProbe = 2, rerank = 4))
    val residP2 = recallOf(VectorOps.ivfPqResidualTopK(embs, books, filter, 3,
      nCoarse = 8, nProbe = 2, rerank = 4))
    info(f"rerank=4 nProbe=2: plain $plainP2%.3f, residual $residP2%.3f")
    assert(residP2 >= plainP2,
      f"residual recall $residP2%.3f below plain $plainP2%.3f at fixed nProbe")
  }

  test("residual IVF-PQ: prebuilt lake index equals the in-query build; " +
    "frozen residual books equal fresh training") {
    import spark.implicits._
    val embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val books = VectorOps.residualBooksFromMicro(graft.PqFixtures.residualBooksMicro)
    val filter = col("vec_id") % 20 === 0 && col("vec_id") < 2000
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "rnk", "neighbor").as[(Long, Long, Long)].collect().toSet
    val inQuery = rowsOf(VectorOps.ivfPqResidualTopK(embs, books, filter, 3))
    val dir = java.nio.file.Files.createTempDirectory("graft_residx").toString
    try {
      // the production shape: the index written once, PARTITIONED BY
      // bucket, read back for the query
      VectorOps.buildIvfPqResidualIndex(embs, books)
        .write.mode("overwrite").partitionBy("bucket").parquet(dir)
      val prebuilt = rowsOf(VectorOps.ivfPqResidualTopK(embs, books, filter, 3,
        index = Some(spark.read.parquet(dir))))
      assert(prebuilt == inQuery, "prebuilt residual index diverged from in-query build")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
    // zero-RNG training: the committed fixture must equal regeneration
    val fresh = VectorOps.trainResidualPqBooksMicro(embs)
    assert(fresh.length == graft.PqFixtures.residualBooksMicro.length)
    fresh.indices.foreach { b =>
      assert(java.util.Arrays.deepEquals(
        fresh(b).asInstanceOf[Array[AnyRef]],
        graft.PqFixtures.residualBooksMicro(b).asInstanceOf[Array[AnyRef]]),
        s"residual book $b drifted from trainResidualPqBooksMicro — " +
          "regenerate via graft.tools.FreezePq")
    }
  }
}
