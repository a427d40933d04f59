package graft.dggs

/** Canonical quad-boundary ownership for hexagonal quad-chart kernels
  * (extracted from Isea3H so the aperture-3 and aperture-4 hex kernels
  * share one ownership convention — the rules depend only on the quad
  * layout, not the aperture).
  *
  * A residue class's geometric representative can fall on the quad
  * boundary (shared with a neighbour quad on the sphere), so each
  * boundary point is assigned ONE canonical owner:
  *
  *  - polar edges around v0 (near edges of two northern quads): owned by
  *    the quad where the edge is O-A; the loser re-homes those classes
  *    on the opposite far edge A-C (their exact lattice translate);
  *  - ring edges: owned by the northern quad that re-homed onto them
  *    (as A-C), else by the southern quad where they are near edges;
  *  - v11 edges: owned by the southern quad that lost the corresponding
  *    near ring edge (re-homed on its far-edge translate);
  *  - corners (residue 0): northern quads own their corner C (vertices
  *    v6-v10), southern quads their corner O (v1-v5); v0/v11 are the cap
  *    bases. A quad's all-zero digit path is therefore its owned corner
  *    — `isPentagon ⇔ digits all 0`, the same rule as Z7.
  */
final class QuadOwnership(val quads: QuadLayout) extends Serializable {

  /** the two cap vertices (bases 0 and 11): the vertices owned by no
    * quad corner under the rules below.
    */
  val capVerts: (Int, Int) = {
    val owned = ((1 to 5).map(q => quads.corners(q)(3)) ++ // northern C
      (6 to 10).map(q => quads.corners(q)(0))).toSet       // southern O
    val caps = (0 to 11).filterNot(owned.contains)
    require(caps.length == 2, s"expected 2 cap vertices, got $caps")
    (caps.head, caps.last)
  }
  /** vertex -> owning base (0/11 for caps; else the owning quad) */
  val vertexBase: Array[Int] = {
    val arr = Array.fill(12)(-1)
    arr(capVerts._1) = 0
    arr(capVerts._2) = 11
    for (q <- 1 to 5) arr(quads.corners(q)(3)) = q
    for (q <- 6 to 10) arr(quads.corners(q)(0)) = q
    require(arr.forall(_ >= 0), s"vertex ownership incomplete: ${arr.mkString(",")}")
    arr
  }
  /** base (quad) -> its owned corner index (3 = C northern, 0 = O southern) */
  val ownedCornerIdx: Array[Int] =
    Array(-1, 3, 3, 3, 3, 3, 0, 0, 0, 0, 0)

  /** per quad: does it own the near-edge reps of its O-A (j=0) / O-B
    * (i=0) classes? If not, those classes re-home on the far translate
    * (B-C for a lost O-A, A-C for a lost O-B).
    */
  val (ownsOA: Array[Boolean], ownsOB: Array[Boolean]) = {
    val oa = new Array[Boolean](11)
    val ob = new Array[Boolean](11)
    // sphere edge (sorted vertex pair) -> owner quad, for every edge
    // that is SOME quad's near edge
    val owner = scala.collection.mutable.Map[(Int, Int), Int]()
    def norm(a: Int, b: Int) = if (a < b) (a, b) else (b, a)
    // 1. northern quads own their O-A polar edge (the cyclic rule); the
    //    A-C ring edge is then theirs as the O-B translate re-home
    for (q <- 1 to 5) {
      val cs = quads.corners(q)
      val pe = norm(cs(0), cs(1)) // O-A polar edge
      require(!owner.contains(pe), s"polar edge $pe claimed twice")
      owner(pe) = q
      oa(q) = true
      val rc = norm(cs(1), cs(3)) // A-C ring edge (re-home target)
      require(!owner.contains(rc), s"ring edge $rc claimed twice")
      owner(rc) = q
      ob(q) = false
    }
    // every polar edge must now be claimed exactly once
    for (q <- 1 to 5; e <- Seq(norm(quads.corners(q)(0), quads.corners(q)(1)),
                               norm(quads.corners(q)(0), quads.corners(q)(2))))
      require(owner.contains(e), s"polar edge $e unclaimed")
    // 2. southern quads keep whichever near ring edge is unclaimed;
    //    exactly one must have been taken by a northern re-home
    for (q <- 6 to 10) {
      val cs = quads.corners(q)
      val eOA = norm(cs(0), cs(1))
      val eOB = norm(cs(0), cs(2))
      val lostOA = owner.contains(eOA)
      val lostOB = owner.contains(eOB)
      require(lostOA != lostOB,
        s"southern quad $q: expected exactly one lost near edge ($lostOA, $lostOB)")
      oa(q) = !lostOA
      ob(q) = !lostOB
      if (!lostOA) owner(eOA) = q
      if (!lostOB) owner(eOB) = q
      // re-home the lost side on its far translate (a v11 edge)
      val far = if (lostOA) norm(cs(2), cs(3)) else norm(cs(1), cs(3))
      require(!owner.contains(far), s"v11 edge $far claimed twice")
      owner(far) = q
    }
    // 3. global completeness: all 30 icosahedron edges minus the 10
    //    in-quad diagonals = 20 boundary edges, each owned exactly once
    val boundary = (for (q <- 1 to 10; cs = quads.corners(q);
                         e <- Seq(norm(cs(0), cs(1)), norm(cs(0), cs(2)),
                                  norm(cs(1), cs(3)), norm(cs(2), cs(3))))
      yield e).toSet
    require(owner.keySet == boundary,
      s"edge ownership incomplete: ${(boundary -- owner.keySet)}")
    (oa, ob)
  }

  /** sphere-edge owner quad lookup (sorted vertex pair) */
  val edgeOwner: Map[(Int, Int), Int] = {
    def norm(a: Int, b: Int) = if (a < b) (a, b) else (b, a)
    (for (q <- 1 to 10) yield {
      val cs = quads.corners(q)
      Seq(
        if (ownsOA(q)) Some(norm(cs(0), cs(1)) -> q) else None,
        if (ownsOB(q)) Some(norm(cs(0), cs(2)) -> q) else None,
        // far-edge ownership = the re-homes: northern owns A-C iff it
        // lost O-B; southern owns the translate of its lost near edge
        if (!ownsOB(q)) Some(norm(cs(1), cs(3)) -> q) else None,
        if (!ownsOA(q)) Some(norm(cs(2), cs(3)) -> q) else None
      ).flatten
    }).flatten.toMap
  }
}
