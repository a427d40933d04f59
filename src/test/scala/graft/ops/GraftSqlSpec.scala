package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.spark.GraftSql

/** The SQL registration surface is the public API a Spark-SQL-only user
  * (JDBC/thrift, notebooks) sees — this sweep exercises EVERY registered
  * function name through `spark.sql` once (round-4 verdict #7) and fails
  * when the registry and [[GraftSql.functionNames]] drift in either
  * direction, so a new registration cannot ship untested.
  */
class GraftSqlSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", "false")
    .appName("graft-sql-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("every registered SQL function runs via spark.sql and the registry is in sync") {
    import spark.implicits._
    def catalogFunctions(): Set[String] = spark.catalog.listFunctions
      .filter(col("isTemporary") === true)
      .select("name").as[String].collect().toSet
    val before = catalogFunctions()
    GraftSql.register(spark)
    // what register() ACTUALLY installed = the catalog diff (robust to
    // Spark listing builtins as temporary)
    val registered = catalogFunctions() -- before
    // (name → assertion run through spark.sql). Each case checks a real
    // property, not just non-null — relationships (round trips, prefix
    // ancestry, ring sizes) rather than frozen constants where possible.
    def one(sql: String): Any = spark.sql(s"SELECT $sql AS v").head().get(0)
    val z = one("z7_cell(24.7D, 59.4D, 5)").asInstanceOf[Long]
    val sweep: Map[String, () => Unit] = Map(
      "z7_cell" -> (() => assert(one("z7_cell(24.7D, 59.4D, 5)") == z)),
      "z7_string" -> (() =>
        assert(one(s"z7_string($z)").asInstanceOf[String].length == 7)), // 2 base + 5 digits
      "z7_from_string" -> (() =>
        assert(one(s"z7_from_string(z7_string($z))") == z)),
      "z7_parent" -> (() =>
        assert(one(s"z7_string(z7_parent($z))") ==
          one(s"substr(z7_string($z), 1, 6)"))),
      "z7_ancestor" -> (() =>
        assert(one(s"z7_string(z7_ancestor($z, 2))") ==
          one(s"substr(z7_string($z), 1, 4)"))),
      "z7_resolution" -> (() => assert(one(s"z7_resolution($z)") == 5)),
      "z7_is_pentagon" -> (() =>
        assert(one(s"z7_is_pentagon($z)") == false)),
      "z7_children" -> (() =>
        assert(one(s"size(z7_children($z))") == 7)),
      "z7_ring1" -> (() => assert(one(s"size(z7_ring1($z))") == 6)),
      "z7_disk" -> (() => assert(one(s"size(z7_disk($z, 1))") == 7)),
      "z7_range_min" -> (() =>
        assert(one(s"z7_range_min(z7_ancestor($z, 2)) <= $z") == true)),
      "z7_range_max" -> (() =>
        assert(one(s"z7_range_max(z7_ancestor($z, 2)) >= $z") == true)),
      "z7_seqnum" -> (() =>
        assert(one(s"z7_seqnum($z) BETWEEN 1 AND ${10L * 16807 + 2}") == true)),
      "z7_from_seqnum" -> (() =>
        assert(one(s"z7_from_seqnum(z7_seqnum($z), 5)") == z)),
      "z7_center_lon" -> (() => {
        val lon = one(s"z7_center_lon($z)").asInstanceOf[Double]
        assert(math.abs(lon - 24.7) < 2.0, lon) // res-5 cell near the point
      }),
      "z7_center_lat" -> (() => {
        val lat = one(s"z7_center_lat($z)").asInstanceOf[Double]
        assert(math.abs(lat - 59.4) < 2.0, lat)
      }),
      "z7_boundary_wkt" -> (() => {
        val w = one(s"z7_boundary_wkt($z)").asInstanceOf[String]
        assert(w.startsWith("POLYGON ((") && w.split(",").length == 7) // closed hex ring
      }),
      "t4_cell" -> (() =>
        assert(one("t4_string(t4_cell(24.7D, 59.4D, 4))")
          .asInstanceOf[String].length == 6)), // 2 face + 4 digits
      "t4_string" -> (() =>
        assert(one("length(t4_string(t4_cell(0.0D, 0.0D, 3)))") == 5)),
      "t4_ancestor" -> (() =>
        assert(one("t4_string(t4_ancestor(t4_cell(24.7D, 59.4D, 4), 2))") ==
          one("substr(t4_string(t4_cell(24.7D, 59.4D, 4)), 1, 4)"))),
      "d4_cell" -> (() =>
        assert(one("d4_string(d4_cell(24.7D, 59.4D, 4))")
          .asInstanceOf[String].length == 6)),
      "d4_string" -> (() =>
        assert(one("length(d4_string(d4_cell(0.0D, 0.0D, 3)))") == 5)),
      "d4_ancestor" -> (() =>
        assert(one("d4_string(d4_ancestor(d4_cell(24.7D, 59.4D, 4), 2))") ==
          one("substr(d4_string(d4_cell(24.7D, 59.4D, 4)), 1, 4)"))),
      "z3_cell" -> (() => {
        // SQL path == column/kernel path (the frozen-mapping anchor)
        assert(one("z3_string(z3_cell(24.7D, 59.4D, 6))") ==
          graft.dggs.Z3.toZ3String(graft.dggs.Isea3HGrids.default
            .cellForPoint(graft.dggs.Sphere.GeoRad.fromDeg(59.4, 24.7), 6)))
      }),
      "z3_string" -> (() =>
        assert(one("length(z3_string(z3_cell(0.0D, 0.0D, 3)))") == 5)),
      "z3_ancestor" -> (() =>
        assert(one("z3_string(z3_ancestor(z3_cell(24.7D, 59.4D, 6), 2))") ==
          one("substr(z3_string(z3_cell(24.7D, 59.4D, 6)), 1, 4)"))),
      "z4_cell" -> (() => {
        assert(one("z4_string(z4_cell(24.7D, 59.4D, 6))") ==
          graft.dggs.Z4.toZ4String(graft.dggs.Isea4HGrids.default
            .cellForPoint(graft.dggs.Sphere.GeoRad.fromDeg(59.4, 24.7), 6)))
      }),
      "z4_string" -> (() =>
        assert(one("length(z4_string(z4_cell(0.0D, 0.0D, 3)))") == 5)),
      "z4_ancestor" -> (() =>
        assert(one("z4_string(z4_ancestor(z4_cell(24.7D, 59.4D, 6), 2))") ==
          one("substr(z4_string(z4_cell(24.7D, 59.4D, 6)), 1, 4)"))),
      "z43_cell" -> (() => {
        // mixed level 3 in the shared Z4 layout; n4 = res reproduces the
        // pure aperture-4 id (the Isea43H pure-equivalence contract)
        assert(one("z4_string(z43_cell(24.7D, 59.4D, 6, 3))") ==
          graft.dggs.Z4.toZ4String(graft.dggs.Isea43HGrids.default(3)
            .cellForPoint(graft.dggs.Sphere.GeoRad.fromDeg(59.4, 24.7), 6)))
        assert(one("z43_cell(24.7D, 59.4D, 6, 6)") ==
          one("z4_cell(24.7D, 59.4D, 6)"))
      }),
      "to_authalic_lat" -> (() => {
        val a = one("to_authalic_lat(45.0D)").asInstanceOf[Double]
        assert(a < 45.0 && a > 44.5, a) // authalic pulls toward the equator
      }),
      "to_geodetic_lat" -> (() => {
        val g = one("to_geodetic_lat(to_authalic_lat(45.0D))").asInstanceOf[Double]
        assert(math.abs(g - 45.0) < 1e-9, g)
      }),
      "z7_vertex2dd" -> (() =>
        assert(one(s"z7_vertex2dd($z)") != null)),
      "z7_projtri" -> (() => assert(one(s"z7_projtri($z)") != null)),
      "z7_q2dd" -> (() => assert(one(s"z7_q2dd($z)") != null)),
      "z7_plane" -> (() => assert(one(s"z7_plane($z)") != null)),
      // LLM-pipeline building blocks (round-6): shingle overlap is the
      // contamination-count kernel; top_*_n the repetition kernels;
      // ahash64_pnm runs the REAL codec on an in-SQL P5 payload
      "word_shingles" -> (() => {
        assert(one("size(word_shingles('a b c d', 3))") == 2)
        // distinct contract + the contamination-count composition shape
        assert(one("size(word_shingles('x y x y x y', 2))") == 2)
        assert(one(
          "size(array_intersect(word_shingles('a b c d e', 3), " +
            "word_shingles('q b c d q', 3)))") == 1)
      }),
      "top_word_n" -> (() => {
        assert(one("top_word_n('a b a b a')") == 3L)
        // limit -1 split keeps trailing empties (TextOps/oracle parity)
        // and a whitespace-only doc counts empty tokens, not crashes
        assert(one("top_word_n('a a ')") == 2L)
        assert(one("top_word_n(' ')") == 2L)
        assert(one("top_word_n(CAST(NULL AS STRING))") == null)
      }),
      "top_bigram_n" -> (() => {
        assert(one("top_bigram_n('a b a b a')") == 2L)
        assert(one("top_bigram_n('solo')") == 0L)
        assert(one("top_bigram_n(CAST(NULL AS STRING))") == null)
      }),
      "ahash64_pnm" -> (() => {
        // the MediaOpsSpec block-0 image: exactly bit 0 set
        val px = Array.tabulate(256) { i =>
          val (y, x) = (i / 16, i % 16)
          if (y < 2 && x < 2) 200.toByte else 10.toByte
        }
        val hex = ("P5 16 16 255\n".getBytes("US-ASCII") ++ px)
          .map(b => f"${b & 0xFF}%02x").mkString
        assert(one(s"ahash64_pnm(unhex('$hex'))") == "8000000000000000")
      }),
      "audiohash64_wav" -> (() => {
        // 64-frame mono clip, window length 1: frame 0 loud (|12000|),
        // rest quiet (|500|) → total 43500, only bit 0 clears ×64
        val samples = Array.tabulate(64) { i =>
          val lvl = if (i == 0) 12000 else 500
          (if (i % 2 == 0) lvl else -lvl).toShort
        }
        val hex = MediaOps.encodeWav(8000, 1, samples)
          .map(b => f"${b & 0xFF}%02x").mkString
        assert(one(s"audiohash64_wav(unhex('$hex'))") == "8000000000000000")
      }),
      "hamming64" -> (() => {
        assert(one("hamming64('8000000000000000', '8000000000000001')") == 1)
        assert(one("hamming64('ffffffffffffffff', 'ffffffffffffffff')") == 0)
        assert(one("hamming64('0000000000000000', 'ffffffffffffffff')") == 64)
        assert(one("hamming64(CAST(NULL AS STRING), 'ffffffffffffffff')") == null)
        // contract violations raise descriptively, not with a raw
        // StringIndexOutOfBounds/NumberFormat from the internals
        val e = intercept[Exception](one("hamming64('abc', 'abcd')"))
        assert(e.getMessage.contains("16-hex"), e.getMessage)
        val e2 = intercept[Exception](one("hamming64('zzzzzzzzzzzzzzzz', 'ffffffffffffffff')"))
        assert(e2.getMessage.contains("not a hex"), e2.getMessage)
      }),
      "mix_bucket6" -> (() => {
        // pinned to the portable md5 formula: md5("42:mix") starts
        // "c54b3b" → 0xc54b3b = 12929851 — the same value the DuckDB
        // oracle (and TextOps.sampleMix) computes for doc 42
        assert(one("mix_bucket6('42', 'mix')") == 12929851L)
        assert(one("mix_bucket6('42', 'mix') = " +
          "conv(substr(md5('42:mix'), 1, 6), 16, 10)") == true)
        assert(one("mix_bucket6(CAST(NULL AS STRING), 'mix')") == null)
      }),
      "redact_pii" -> (() => {
        assert(one("redact_pii('mail a9@ex.org and +1 (555) 010-9999 end')") ==
          "mail <EMAIL> and <PHONE> end")
        // sub-threshold shapes survive untouched
        assert(one("redact_pii('a@b plus 12345 stay')") == "a@b plus 12345 stay")
        assert(one("redact_pii(CAST(NULL AS STRING))") == null)
      }),
      "sig_match_frac" -> (() => {
        assert(one("sig_match_frac(array('a','b','c','d'), array('a','x','c','y'))")
          == 0.5)
        assert(one("sig_match_frac(array('a'), array('a'))") == 1.0)
        assert(one("sig_match_frac(CAST(NULL AS ARRAY<STRING>), array('a'))")
          == null)
        val e = intercept[Exception](
          one("sig_match_frac(array('a','b'), array('a'))"))
        assert(e.getMessage.contains("equal-length"), e.getMessage)
      }),
      "wkt_intersects" -> (() => {
        // overlapping, touching (JTS: true), disjoint
        assert(one("wkt_intersects('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))', " +
          "'POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))')") == true)
        assert(one("wkt_intersects('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))', " +
          "'POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))')") == true)
        assert(one("wkt_intersects('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))', " +
          "'POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))')") == false)
        // null on either side → null, not an NPE (round-6 ADVICE)
        assert(one("wkt_intersects(CAST(NULL AS STRING), 'POINT (0 0)')") == null)
        assert(one("wkt_intersects('POINT (0 0)', CAST(NULL AS STRING))") == null)
      }),
      "haversine_km" -> (() => {
        // zero distance; one degree of longitude at the equator ≈ 111.2 km
        assert(one("haversine_km(24.7D, 59.4D, 24.7D, 59.4D)") == 0.0)
        val d = one("haversine_km(0.0D, 0.0D, 1.0D, 0.0D)").asInstanceOf[Double]
        assert(math.abs(d - 111.19) < 0.2, d)
        // matches the engine column kernel bit-for-bit
        val eng = spark.range(1).select(graft.ops.SpatialOps.haversineKm(
          org.apache.spark.sql.functions.lit(5.0),
          org.apache.spark.sql.functions.lit(10.0),
          org.apache.spark.sql.functions.lit(-3.0),
          org.apache.spark.sql.functions.lit(47.0)).as("v")).head().getDouble(0)
        assert(one("haversine_km(5.0D, 10.0D, -3.0D, 47.0D)") == eng)
      }),
      "wkt_contains_point" -> (() => {
        assert(one("wkt_contains_point('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))', " +
          "1.0D, 1.0D)") == true)
        assert(one("wkt_contains_point('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))', " +
          "3.0D, 1.0D)") == false)
        assert(one("wkt_contains_point(CAST(NULL AS STRING), 0.0D, 0.0D)") == null)
      }),
      "kmv_distinct" -> (() => {
        // exact below k; agrees with count(distinct) there
        val r = spark.sql("SELECT kmv_distinct(CAST(id % 40 AS STRING), 64) AS v " +
          "FROM range(200)").head().getDouble(0)
        assert(r == 40.0, r)
        // grouped + partial-aggregated (the plan shape is pinned in
        // KmvSketchSpec; here the SQL surface contract)
        val g = spark.sql("SELECT id % 2 AS g, " +
          "kmv_distinct(CAST(id AS STRING), 128) AS v FROM range(100) GROUP BY 1")
          .collect().map(x => (x.getLong(0), x.getDouble(1))).toMap
        assert(g == Map(0L -> 50.0, 1L -> 50.0), g)
        // k must be a literal — a column k cannot size the buffer
        val e = intercept[Exception](spark.sql(
          "SELECT kmv_distinct(CAST(id AS STRING), CAST(id AS INT)) FROM range(5)")
          .collect())
        val msgs = Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
          .mkString(" | ")
        assert(msgs.contains("integer literal"), msgs)
      }),
      "z7_family_size" -> (() => {
        // the hex cell from the shared sweep context is no pentagon → 7;
        // base cell 0's digit-0 descendant chain stays pentagonal → 6
        assert(one(s"z7_family_size($z)") == 7)
        assert(one("z7_family_size(z7_from_string('000'))") == 6)
        // consistency with z7_children on both families
        assert(one(s"size(z7_children($z)) = z7_family_size($z)") == true)
        assert(one("size(z7_children(z7_from_string('000'))) = " +
          "z7_family_size(z7_from_string('000'))") == true)
      }))
    // 1. run every sweep case
    sweep.foreach { case (name, check) =>
      withClue(s"sweep of $name: ")(check())
    }
    // 2. the sweep covers exactly the declared surface
    assert(sweep.keySet == GraftSql.functionNames.toSet,
      "sweep cases and GraftSql.functionNames drifted")
    // 3. the declared surface is exactly what register() installed
    //    (catches an r.register(...) added without updating the list)
    assert(registered == GraftSql.functionNames.toSet,
      s"declared-but-not-registered: ${GraftSql.functionNames.toSet -- registered}; " +
        s"registered-but-not-declared: ${registered -- GraftSql.functionNames.toSet}")
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
