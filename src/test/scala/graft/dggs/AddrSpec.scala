package graft.dggs

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip properties of the Q2DD / PROJTRI / PLANE address frames
  * (graft.dggs.Addr). The frames are engine-canonical (no DGGRID goldens
  * exist in the reference tests — divergence documented per-type in
  * COVERAGE.md); what must hold exactly is cell → addr → cell identity.
  */
class AddrSpec extends AnyFunSuite {

  private val g = new IGeo7() // default vert0/azimuth

  private def cellsAt(r: Int): Seq[Long] =
    (0 to 11).flatMap(b => Z7.descendants(Z7.pack(b, Seq.empty), r))

  test("Q2DD round-trips every res-3 cell (incl. pentagons)") {
    cellsAt(3).foreach { z =>
      val (q, x, y) = Addr.z7ToQ2dd(g, z)
      assert(q >= 1 && q <= 10)
      assert(Addr.q2ddToZ7(g, q, x, y, 3) == z, Z7.toZ7String(z))
    }
  }

  test("PROJTRI round-trips every res-3 cell") {
    cellsAt(3).foreach { z =>
      val (t, x, y) = Addr.z7ToProjtri(g, z)
      assert(t >= 0 && t < 20)
      assert(math.hypot(x, y) <= g.snyder.rc + 1e-12)
      assert(Addr.projtriToZ7(g, t, x, y, 3) == z, Z7.toZ7String(z))
    }
  }

  test("PLANE round-trips every res-3 cell; face frames are disjoint") {
    val seen = scala.collection.mutable.HashSet[(Double, Double)]()
    cellsAt(3).foreach { z =>
      val (px, py) = Addr.z7ToPlane(g, z)
      assert(seen.add((px, py)), s"PLANE collision at ${Z7.toZ7String(z)}")
      assert(Addr.planeToZ7(g, px, py, 3) == z, Z7.toZ7String(z))
    }
  }

  test("VERTEX2DD round-trips every res-3 cell; vertex matches the base cell") {
    cellsAt(3).foreach { z =>
      val (v, t, x, y) = Addr.z7ToVertex2dd(g, z)
      assert(v >= 0 && v <= 11)
      assert(v == g.vertexOfBase(Z7.baseCell(z)), Z7.toZ7String(z))
      assert(t >= 0 && t < 20)
      assert(Addr.vertex2ddToZ7(g, t, x, y, 3) == z, Z7.toZ7String(z))
    }
  }

  test("error contract: INTERLEAVE/Z3/ZORDER raise the aperture-3/4 constraint") {
    // mirrors the reference's own type constraint (dggrid_runner.py:125)
    // and its ValueError error-contract style (dggrid_runner.py:2077-2086)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[1]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val cells = Seq("00123").toDF("name")
    for (bad <- Seq("INTERLEAVE", "Z3", "ZORDER")) {
      val e = intercept[IllegalArgumentException] {
        graft.ops.GridOps.addressTransform(cells, "name", "Z7_STRING", bad, 3)
      }
      assert(e.getMessage.contains("aperture-3/4"), bad)
    }
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.GridOps.addressTransform(cells, "name", "WAT", "Z7", 3)
    }
    assert(e2.getMessage.contains("unsupported input"))
  }

  test("Q2DD chart coords land inside the unit quad chart (deep res spot check)") {
    val ids = (0 until 100).map(i => Z7.pack(i % 12, Seq(1, 3, 0, (i % 7), 5, (i * 3) % 7)))
      .filter(z => !Z7.isPentagon(Z7.ancestorAt(z, 0)) || Z7.digits(z).forall(_ != 2))
    ids.foreach { z =>
      val (q, x, y) = Addr.z7ToQ2dd(g, z)
      assert(Addr.q2ddToZ7(g, q, x, y, 6) == z)
    }
  }
}
