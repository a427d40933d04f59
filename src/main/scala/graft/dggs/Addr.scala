package graft.dggs

import Sphere._
import Lattice._

/** Address-type conversions beyond Z7/SEQNUM/GEO/Q2DI (reference type zoo
  * at dggrid_runner.py:121-236). All engine-canonical — DGGRID publishes
  * no golden values for these in the reference tests, so the frames are
  * ours and documented per type (COVERAGE.md); what the property tests
  * pin is exact round-tripping.
  *
  *  - Q2DD   : quad 1..10 + continuous quad-chart coords of the cell's
  *             lattice point (the chart `latticeToChart` uses; DGGRID's
  *             Q2DD is likewise quad + (x,y) double — dggrid_runner.py:128)
  *  - PROJTRI: Snyder triangle 0..19 + face-local plane coords of the
  *             cell center (DGGRID: triangle + (x,y) on the ISEA plane)
  *  - PLANE  : (x,y) on a single unfolded plane. Engine layout: an
  *             EXPLODED 5×4 grid of face frames (face f at column f%5,
  *             row f/5, pitch 3·rc) — NOT DGGRID's folded icosahedron
  *             net (unpublished); invertible and collision-free, which
  *             is the property the tests pin.
  */
object Addr {

  /** Q2DD: quad + chart coords of the cell's lattice point. */
  def z7ToQ2dd(g: IGeo7, z: Long): (Int, Double, Double) = {
    val fix = g.decode(z)
    val (x, y) = g.latticeToChart(fix.v, fix.res)
    (fix.quad, x, y)
  }

  def q2ddToZ7(g: IGeo7, q: Int, x: Double, y: Double, res: Int): Long = {
    val (fa, fb) = g.chartToLattice(x, y, res)
    val v = hexRound(fa, fb)
    val (vtx, digits) = g.digitsOf(g.CellFix(q, v, res))
    Z7.pack(g.baseOfVertex(vtx), digits.toSeq)
  }

  /** PROJTRI: Snyder face + face-local plane coords of the cell center. */
  def z7ToProjtri(g: IGeo7, z: Long): (Int, Double, Double) = {
    val fp = g.snyder.forward(g.cellCenter(z))
    (fp.face, fp.x, fp.y)
  }

  def projtriToZ7(g: IGeo7, t: Int, x: Double, y: Double, res: Int): Long =
    g.cellForPoint(g.snyder.inverse(g.snyder.FacePoint(t, x, y)), res)

  /** VERTEX2DD (dggrid_runner.py:129: "vertex number, triangle number,
    * and (x, y) coordinates on ISEA plane"): the icosahedron vertex
    * owning the cell's Z7 base cell (0..11) + the PROJTRI triangle and
    * face-local coords. DGGRID's exact vertex-frame convention is
    * unpublished, so the coords are engine-canonical (= the PROJTRI
    * frame) and the vertex number is derivable metadata — the inverse
    * therefore ignores it (AddrSpec pins the round-trip).
    */
  def z7ToVertex2dd(g: IGeo7, z: Long): (Int, Int, Double, Double) = {
    val (t, x, y) = z7ToProjtri(g, z)
    (g.vertexOfBase(Z7.baseCell(z)), t, x, y)
  }

  def vertex2ddToZ7(g: IGeo7, t: Int, x: Double, y: Double, res: Int): Long =
    projtriToZ7(g, t, x, y, res)

  /** face-frame pitch of the exploded PLANE layout (3× the plane
    * circumradius keeps frames disjoint: |x|,|y| ≤ rc within a face)
    */
  def planePitch(g: IGeo7): Double = 3.0 * g.snyder.rc

  def z7ToPlane(g: IGeo7, z: Long): (Double, Double) = {
    val (t, x, y) = z7ToProjtri(g, z)
    val pitch = planePitch(g)
    (x + (t % 5) * pitch, y - (t / 5) * pitch)
  }

  def planeToZ7(g: IGeo7, px: Double, py: Double, res: Int): Long = {
    val pitch = planePitch(g)
    val colD = math.round(px / pitch).toInt
    val rowD = math.round(-py / pitch).toInt
    val col = math.max(0, math.min(4, colD))
    val row = math.max(0, math.min(3, rowD))
    projtriToZ7(g, row * 5 + col, px - col * pitch, py + row * pitch, res)
  }
}
