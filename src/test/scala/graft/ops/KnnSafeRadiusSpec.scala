package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.dggs.{Sphere, Z7}
import graft.spark.Grids
import Sphere.GeoRad

/** Validates the kNN disk-coverage radii (SpatialOps.diskSafeKm) against
  * an exact geometric lower bound, and the staged ring-1 → ring-2 →
  * brute escalation on a sparse corpus (round-2 verdict #3 + ADVICE:
  * "the 0.6×inradius constant is asserted rather than derived").
  *
  * The bound: for a query point p in cell z, the distance to the
  * EXTERIOR of z's k-disk is ≥ min over ring-(k+1) cells c of
  * (dist(p, center(c)) − circumradius(c)) — every exterior point lies in
  * a ring-(k+1)-or-farther cell, and no point of c is farther than its
  * circumradius from its center. If that lower bound ≥ diskSafeKm(res,k)
  * for the worst sampled p (densified cell boundary + center, pentagons
  * and their fans included), the "≥k candidates within diskSafeKm ⇒
  * proven complete" certificate in knnJoinStaged is sound there.
  */
class KnnSafeRadiusSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("graft-knn-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("diskSafeKm is a lower bound on disk-exterior distance (k=1..4; res 1-7)") {
    // res 1 included because the driver's dggs_knn query runs at res 1,
    // where ISEA distortion and pentagon fans are at their worst; res
    // 6-7 included because the sparse-corpus probeDisk use case (next
    // tests) leans on the certificate there (round-5 review finding —
    // the knob's target regime must be inside the validated range).
    // The measurement itself is the SHARED graft.tools.KnnProbe
    // implementation, so the factors the tool records and the bound
    // this test enforces cannot drift apart.
    for (res <- 1 to 7; k <- 1 to 4) {
      val safe = SpatialOps.diskSafeKm(res, k)
      val worst = graft.tools.KnnProbe.measureExteriorBound(res, k)
      assert(worst >= safe,
        f"res $res k $k: measured exterior-distance lower bound $worst%.3f km " +
          f"< diskSafeKm $safe%.3f km — coverage certificate unsound")
      info(f"res $res k $k: diskSafeKm=$safe%.2f km, measured min bound=$worst%.2f km " +
        f"(margin ${worst / safe}%.2fx)")
    }
  }

  test("sparse corpus: ring-2 stage certifies, brute residue <= 1%, result exact") {
    import spark.implicits._
    // ~1 point per res-6 cell (rIn(6) ≈ 11.2 km): an 21×21 grid at
    // ~11 km spacing with deterministic jitter (kills symmetric distance
    // ties). d_3 ≈ 11 km > ringSafe(6)=6.7 km, so ring-1 cannot certify;
    // ≤ diskSafe(6,2)=20.1 km, so ring-2 certifies — the sparse-region
    // shape the round-2 escalation broadcast handled with a full scan.
    val pts = (for (i <- 0 until 21; j <- 0 until 21) yield {
      val jit = ((i * 7 + j * 13) % 11) * 1.3e-4
      (f"p$i%02d_$j%02d", 10.0 + i * 0.159 + jit, 50.0 + j * 0.1 + jit)
    }).toDF("id", "lon", "lat")
    val queries = pts.select(col("id").as("q_id"), col("lon"), col("lat"))
    val targets = pts.select(col("id").as("t_id"), col("lon"), col("lat"))
    val k = 3
    val (result, residue) = SpatialOps.knnJoinStaged(
      queries, targets, "lon", "lat", k, 6, excludeSelf = Seq("q_id" -> "t_id"))
    val got = result.select("q_id", "rnk", "t_id")
      .as[(String, Long, String)].collect().toSet
    val nResidue = residue.count()
    assert(nResidue <= (441 * 0.01).toLong,
      s"brute-force residue after ring-2: $nResidue of 441 queries (> 1%)")

    // exact equality vs driver-side brute force
    def hav(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
      val dlat = math.toRadians(lat2 - lat1); val dlon = math.toRadians(lon2 - lon1)
      val a = math.pow(math.sin(dlat / 2), 2) +
        math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
          math.pow(math.sin(dlon / 2), 2)
      2.0 * Sphere.EarthRadiusKm * math.asin(math.sqrt(a))
    }
    val all = pts.as[(String, Double, Double)].collect()
    val want = all.flatMap { case (q, qlon, qlat) =>
      all.filter(_._1 != q)
        .map { case (t, tlon, tlat) => (t, hav(qlon, qlat, tlon, tlat)) }
        .sortBy { case (t, d) => (d, t) }
        .take(k).zipWithIndex
        .map { case ((t, _), r) => (q, (r + 1).toLong, t) }
    }.toSet
    assert(got == want, s"staged kNN != brute force " +
      s"(${(got -- want).size} extra, ${(want -- got).size} missing)")
  }

  test("sparser corpus: disk-2 cannot certify, probeDisk=3 does; result exact") {
    import spark.implicits._
    // ~25 km spacing at res 6: d_3 > diskSafe(6,2) ≈ 20.1 km so the
    // default disk-2 probe leaves a large brute residue; diskSafe(6,3)
    // ≈ 33.6 km so a disk-3 probe certifies (the round-5 probeDisk knob
    // — KnnProbe measured factors ≥ 0.75 for k=3/4, margin over 0.6)
    val pts = (for (i <- 0 until 15; j <- 0 until 15) yield {
      val jit = ((i * 7 + j * 13) % 11) * 1.3e-4
      (f"p$i%02d_$j%02d", 10.0 + i * 0.36 + jit, 50.0 + j * 0.225 + jit)
    }).toDF("id", "lon", "lat")
    val queries = pts.select(col("id").as("q_id"), col("lon"), col("lat"))
    val targets = pts.select(col("id").as("t_id"), col("lon"), col("lat"))
    val k = 3
    val (r2, residue2) = SpatialOps.knnJoinStaged(
      queries, targets, "lon", "lat", k, 6, excludeSelf = Seq("q_id" -> "t_id"))
    val (r3, residue3) = SpatialOps.knnJoinStaged(
      queries, targets, "lon", "lat", k, 6, excludeSelf = Seq("q_id" -> "t_id"),
      probeDisk = 3)
    val n2 = residue2.count(); val n3 = residue3.count()
    assert(n2 > 225 / 2,
      s"expected the disk-2 probe to fail certification at 25 km spacing, residue $n2")
    // residue = exactly the 4 grid CORNERS: their 3rd-nearest is the
    // ~35.4 km diagonal, just past diskSafe(6,3) ≈ 33.6 km — the
    // certificate is conservative by design, and corner queries fall
    // back to the exact brute path
    assert(n3 <= 4, s"disk-3 residue $n3 of 225 queries (expected ≤ 4 corners)")
    // both paths (certified and residue-heavy) remain EXACT and equal
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "rnk", "t_id").as[(String, Long, String)].collect().toSet
    assert(rows(r2) == rows(r3))
    spark.catalog.clearCache()
  }
}
