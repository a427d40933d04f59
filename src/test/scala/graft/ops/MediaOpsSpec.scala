package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The REAL codec path (round-4 verdict #4): binary PNM (P5/P6) decoded
  * byte-exactly with zero external libraries, wired through
  * extractFeatures so real pixel stats flow into the feature pipeline;
  * non-PNM payloads keep the stub passthrough (driver oracle unchanged).
  */
class MediaOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", "false")
    .appName("graft-media-test")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def bytes(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  test("decodePnm: P5 grayscale with header comment, byte-exact pixels") {
    // 4×2 PGM, maxval 255, a comment between tokens, pixel bytes 0..7
    val px = Array[Byte](0, 1, 2, 3, 4, 5, 6, 7)
    val img = MediaOps.decodePnm(
      bytes("P5\n# a comment\n4 2\n255\n") ++ px).get
    assert(img.width == 4 && img.height == 2 && img.channels == 1)
    assert(img.maxVal == 255)
    assert(img.pixels.sameElements(px))
  }

  test("decodePnm: P6 RGB byte-exact; non-PNM magic falls through") {
    // 2×2 PPM: 12 raster bytes, values chosen to hit high nibbles too
    val px = Array.tabulate(12)(i => (i * 21).toByte)
    val img = MediaOps.decodePnm(bytes("P6 2 2 255\n") ++ px).get
    assert(img.width == 2 && img.height == 2 && img.channels == 3)
    assert(img.pixels.sameElements(px))
    // P3 (ASCII PPM), JPEG magic, empty: all None — stub path, no throw
    assert(MediaOps.decodePnm(bytes("P3\n1 1\n255\n0 0 0")).isEmpty)
    assert(MediaOps.decodePnm(Array[Byte](0xFF.toByte, 0xD8.toByte)).isEmpty)
    assert(MediaOps.decodePnm(Array.emptyByteArray).isEmpty)
  }

  test("decodePnm: malformed PNM raises loudly, never garbage pixels") {
    def boom(payload: Array[Byte], frag: String): Unit = {
      val e = intercept[IllegalArgumentException](MediaOps.decodePnm(payload))
      assert(e.getMessage.contains(frag), s"'${e.getMessage}' !~ '$frag'")
    }
    boom(bytes("P5\n4 2\n255\n") ++ Array[Byte](1, 2, 3), "truncated")
    boom(bytes("P5\n4 2\n65535\n") ++ new Array[Byte](16), "maxval")
    boom(bytes("P5\nx 2\n255\n"), "width")
    boom(bytes("P5\n0 2\n255\n "), "non-positive")
  }

  test("decodePnm: CRLF-terminated header decodes unshifted pixels") {
    // text-mode writers end the maxval line with \r\n; a bare single-
    // whitespace skip would leave '\n' as the first "pixel" and shift
    // the whole raster (round-5 review finding)
    val px = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80)
    val img = MediaOps.decodePnm(bytes("P5\r\n4 2\r\n255\r\n") ++ px).get
    assert(img.width == 4 && img.height == 2)
    assert(img.pixels.sameElements(px),
      s"raster shifted: ${img.pixels.mkString(",")}")
    // a legal single-'\r' separator whose first pixel IS 0x0A and whose
    // raster fits exactly is preserved (the unambiguous case)
    val px2 = Array[Byte]('\n', 2, 3, 4, 5, 6, 7, 8)
    val img2 = MediaOps.decodePnm(bytes("P5\n4 2\n255\r") ++ px2).get
    assert(img2.pixels.sameElements(px2))
    // trailing bytes REJECT (round-5 ADVICE): with them allowed, the
    // '\r' + 0x0A-first-sample case above would be ambiguous and could
    // decode a raster silently shifted by one byte
    val e = intercept[IllegalArgumentException](
      MediaOps.decodePnm(bytes("P5\n4 2\n255\n") ++ px ++ Array[Byte](9)))
    assert(e.getMessage.contains("trailing"), e.getMessage)
    // ...including the ambiguous '\r'-separator shape itself: \r then
    // 0x0A then a full raster PLUS trailing data used to shift; now loud
    val e2 = intercept[IllegalArgumentException](
      MediaOps.decodePnm(bytes("P5\n4 2\n255\r") ++ px2 ++ Array[Byte](9, 9)))
    assert(e2.getMessage.contains("trailing"), e2.getMessage)
  }

  test("extractFeatures auto path: magic-only garbage falls back to the stub") {
    import spark.implicits._
    // a payload that merely STARTS with 'P5' (arbitrary binary corpora
    // hit the 2-byte magic at ~2/65536 per row) must not throw — the
    // auto path commits to PNM only when the whole payload validates
    // (round-5 review finding); explicit decodePnm stays loud
    val garbage = bytes("P5") ++ Array[Byte](0x7F, -2, -3, 0x11)
    intercept[IllegalArgumentException](MediaOps.decodePnm(garbage))
    val df = Seq(("d1", "m1", "image", garbage, 3, 4))
      .toDF("doc_id", "media_ref", "media_type", "payload", "width", "height")
    val f = MediaOps.extractFeatures(df).collect().head
    assert(f.width == 3 && f.height == 4) // caller dims kept = stub path
    assert(f.n_bytes == garbage.length)
  }

  test("aHash: byte-exact kernel on P5 and P6; dimension contract") {
    // 16×16 P5, block 0 bright (200), everything else 10: exactly bit 0
    // set → "8" + fifteen "0"s (block sums 800 vs 40; total 3320)
    val px = Array.tabulate(256) { i =>
      val (y, x) = (i / 16, i % 16)
      if (y < 2 && x < 2) 200.toByte else 10.toByte
    }
    val img = MediaOps.decodePnm(bytes("P5 16 16 255\n") ++ px).get
    assert(MediaOps.aHash64Hex(img) == "8000000000000000")
    // 8×8 P6 (1-px blocks, 3 channels summed): make blocks 0 and 63
    // bright → bits 0 and 63 → "8000000000000001"
    val px6 = Array.tabulate(192) { i =>
      val b = i / 3
      if (b == 0 || b == 63) 250.toByte else 5.toByte
    }
    val img6 = MediaOps.decodePnm(bytes("P6 8 8 255\n") ++ px6).get
    assert(MediaOps.aHash64Hex(img6) == "8000000000000001")
    // dimensions not divisible by 8 raise loudly (ragged blocks would
    // make the hash rounding-dependent)
    val bad = MediaOps.decodePnm(
      bytes("P5 12 8 255\n") ++ new Array[Byte](96)).get
    intercept[IllegalArgumentException](MediaOps.aHash64Hex(bad))
  }

  test("aHashPairs: within-family Hamming = |variant delta|, pairs complete") {
    import spark.implicits._
    // 5 families × 5 variants (doc_ids 0..24): the synthetic generator
    // guarantees within-family aHash Hamming = |v1-v2| and cross-family
    // ~32, so the expected pair set is exactly the within-family pairs
    // with |v1-v2| <= 3 (variant 0 vs 4 = Hamming 4 must be REJECTED by
    // the refine even though bands overlap elsewhere)
    val docs = (0L until 25L).toDF("doc_id")
    val media = MediaOps.syntheticPnmImages(docs)
    val got = MediaOps.aHashPairs(media)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, h) => ((a, b), h) }.toMap
    val expected = (for {
      fam <- 0 until 5; va <- 0 until 5; vb <- va + 1 until 5
      if vb - va <= 3
    } yield ((fam * 5L + va, fam * 5L + vb), (vb - va).toLong)).toMap
    assert(got == expected,
      s"missing=${expected.keySet -- got.keySet} extra=${got.keySet -- expected.keySet}")
    spark.catalog.clearCache()
  }

  test("decodeWav: PCM16 round-trip byte-exact; unknown chunks skipped") {
    val samples = Array[Short](100, -200, 32767, -32768, 0, 7)
    val payload = MediaOps.encodeWav(8000, 2, samples)
    val wav = MediaOps.decodeWav(payload).get
    assert(wav.sampleRate == 8000 && wav.channels == 2 && wav.frames == 3)
    assert(wav.samples.sameElements(samples))
    // re-encode reproduces the exact bytes (canonical 44-byte header)
    assert(MediaOps.encodeWav(wav.sampleRate, wav.channels, wav.samples)
      .sameElements(payload))
    // a LIST metadata chunk between fmt and data is legal and skipped
    // (odd-size chunk exercises the word-alignment pad byte)
    val list = bytes("LIST") ++ Array[Byte](3, 0, 0, 0) ++
      bytes("abc") ++ Array[Byte](0)
    val withMeta = payload.take(36) ++ list ++ payload.drop(36)
    val fixed = withMeta.clone()
    val newRiff = withMeta.length - 8
    fixed(4) = (newRiff & 0xFF).toByte; fixed(5) = ((newRiff >> 8) & 0xFF).toByte
    fixed(6) = ((newRiff >> 16) & 0xFF).toByte; fixed(7) = ((newRiff >> 24) & 0xFF).toByte
    val wav2 = MediaOps.decodeWav(fixed).get
    assert(wav2.samples.sameElements(samples))
    // non-RIFF magic is not a WAV claim → None, no throw
    assert(MediaOps.decodeWav(bytes("NOTAWAVFILE!")).isEmpty)
  }

  test("decodeWav: malformed WAV raises loudly, never garbage samples") {
    val good = MediaOps.encodeWav(8000, 1, Array[Short](1, 2, 3, 4))
    def corrupt(mutate: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); mutate(b); b
    }
    // RIFF size mismatch
    val e1 = intercept[IllegalArgumentException](
      MediaOps.decodeWav(corrupt(b => b(4) = 99)))
    assert(e1.getMessage.contains("RIFF size"), e1.getMessage)
    // non-PCM format tag (offset 20 = fmt audioFormat)
    val e2 = intercept[IllegalArgumentException](
      MediaOps.decodeWav(corrupt(b => b(20) = 3)))
    assert(e2.getMessage.contains("PCM"), e2.getMessage)
    // 8-bit samples (offset 34 = bitsPerSample)
    val e3 = intercept[IllegalArgumentException](
      MediaOps.decodeWav(corrupt(b => b(34) = 8)))
    assert(e3.getMessage.contains("16-bit"), e3.getMessage)
    // data chunk overrunning the payload (offset 40 = data size)
    val e4 = intercept[IllegalArgumentException](
      MediaOps.decodeWav(corrupt(b => b(40) = 127)))
    assert(e4.getMessage.contains("overruns"), e4.getMessage)
    // trailing garbage that is not a well-formed chunk
    val e5 = intercept[IllegalArgumentException](
      MediaOps.decodeWav(good ++ bytes("junk") ++ Array[Byte](1, 2, 3, 4)))
    // (magic check passes, RIFF size now mismatches → loud)
    assert(e5.getMessage.contains("malformed WAV"), e5.getMessage)
    // duplicate fmt / data chunks (round-6 ADVICE): a second fmt would
    // re-bind channels, a second data would replace the samples — both
    // must raise, not silently win
    def withRiff(b: Array[Byte]): Array[Byte] = {
      val f = b.clone(); val n = b.length - 8
      f(4) = (n & 0xFF).toByte; f(5) = ((n >> 8) & 0xFF).toByte
      f(6) = ((n >> 16) & 0xFF).toByte; f(7) = ((n >> 24) & 0xFF).toByte
      f
    }
    val e6 = intercept[IllegalArgumentException](
      MediaOps.decodeWav(withRiff(good ++ good.slice(12, 36))))
    assert(e6.getMessage.contains("duplicate fmt"), e6.getMessage)
    val e7 = intercept[IllegalArgumentException](
      MediaOps.decodeWav(withRiff(good ++ good.drop(36))))
    assert(e7.getMessage.contains("duplicate data"), e7.getMessage)
  }

  test("audioHash64Hex: byte-exact kernel; frame-count contract") {
    // window 0 loud (10 frames of |12000|), rest quiet (|500|) → only
    // bit 0 set: 120000*64 > 435500... total = 120000 + 63*5000 =
    // 435000; quiet windows: 5000*64 = 320000 < total → 0
    val s = new Array[Short](640)
    for (i <- 0 until 640) {
      val lvl = if (i < 10) 12000 else 500
      s(i) = (if (i % 2 == 0) lvl else -lvl).toShort
    }
    val wav = MediaOps.WavAudio(8000, 1, s)
    assert(MediaOps.audioHash64Hex(wav) == "8000000000000000")
    // stereo: channel sums drive the windows (frame = L+R)
    val st = new Array[Short](1280)
    for (i <- 0 until 640) {
      val lvl = if (i < 10) 6000 else 250
      val v = (if (i % 2 == 0) lvl else -lvl).toShort
      st(2 * i) = v; st(2 * i + 1) = v
    }
    assert(MediaOps.audioHash64Hex(MediaOps.WavAudio(8000, 2, st)) ==
      "8000000000000000")
    // 100 frames is not divisible by 64 → loud contract error
    val e = intercept[IllegalArgumentException](
      MediaOps.audioHash64Hex(MediaOps.WavAudio(8000, 1, new Array[Short](100))))
    assert(e.getMessage.contains("divisible by 64"), e.getMessage)
  }

  test("audioHashPairs: within-family Hamming = |variant delta|, complete") {
    import spark.implicits._
    // same family/variant geometry as the image corpus: expected pair
    // set is exactly the within-family pairs with |v1-v2| <= 3
    val docs = (0L until 25L).toDF("doc_id")
    val media = MediaOps.syntheticWavCorpus(docs)
    val got = MediaOps.audioHashPairs(media)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, h) => ((a, b), h) }.toMap
    val expected = (for {
      fam <- 0 until 5; va <- 0 until 5; vb <- va + 1 until 5
      if vb - va <= 3
    } yield ((fam * 5L + va, fam * 5L + vb), (vb - va).toLong)).toMap
    assert(got == expected,
      s"missing=${expected.keySet -- got.keySet} extra=${got.keySet -- expected.keySet}")
    spark.catalog.clearCache()
  }

  test("audioFeatures: integer-exact descriptors from real decode") {
    import spark.implicits._
    val docs = Seq(0L, 1L).toDF("doc_id")
    val feats = MediaOps.audioFeatures(MediaOps.syntheticWavCorpus(docs))
      .collect().map(f => f.media_id -> f).toMap
    // recompute family 0's window pattern driver-side from the formula
    val md = java.security.MessageDigest.getInstance("MD5")
    def loud(f: Long, v: Long): IndexedSeq[Boolean] = (0 until 64).map { w =>
      (((md.digest(s"$f:$w".getBytes("US-ASCII"))(0) >> 4) & 0xF) >= 8) ^ (w < v)
    }
    for (id <- Seq(0L, 1L)) {
      val l = loud(id / 5, id % 5)
      val f = feats(id)
      assert(f.sample_rate == 8000L && f.channels == 1L && f.n_frames == 640L)
      assert(f.zero_crossings == 639L) // sign alternates every frame
      assert(f.peak_abs == (if (l.exists(identity)) 12000L else 500L))
      assert(f.abs_sum == l.map(b => if (b) 120000L else 5000L).sum)
    }
  }

  test("decodePnmStream: frame walk round-trips; loud mid-stream errors") {
    def p5(w: Int, h: Int, fill: Byte): MediaOps.PnmImage =
      MediaOps.PnmImage(w, h, 1, 255, Array.fill(w * h)(fill))
    // mixed-size frames round-trip through the canonical writer
    val clip = Seq(p5(8, 8, 10), p5(16, 8, 20), p5(8, 16, 30))
    val payload = MediaOps.encodePnmVideo(clip)
    val frames = MediaOps.decodePnmStream(payload).get
    assert(frames.length == 3)
    assert(frames.zip(clip).forall { case (a, b) =>
      a.width == b.width && a.height == b.height &&
        a.pixels.sameElements(b.pixels)
    })
    // not a PNM-video claim at all → None, no throw
    assert(MediaOps.decodePnmStream(bytes("RIFFnotvideo")).isEmpty)
    // garbage at a frame boundary raises (frame 1 has no magic)
    val e1 = intercept[IllegalArgumentException](
      MediaOps.decodePnmStream(payload.take(64 + 10) ++ bytes("junk")))
    assert(e1.getMessage.contains("magic") ||
      e1.getMessage.contains("truncated"), e1.getMessage)
    // truncated final raster raises
    val e2 = intercept[IllegalArgumentException](
      MediaOps.decodePnmStream(payload.dropRight(3)))
    assert(e2.getMessage.contains("truncated"), e2.getMessage)
    // '\r' separator is ambiguous MID-STREAM (no end-of-payload anchor)
    // even though the whole-payload decoder accepts it → loud raise
    val crSep = "P5 8 8 255\r".getBytes("US-ASCII") ++ Array.fill(64)(10.toByte)
    assert(MediaOps.decodePnm(crSep).isDefined) // single-frame: fine
    val e3 = intercept[IllegalArgumentException](
      MediaOps.decodePnmStream(crSep ++ crSep))
    assert(e3.getMessage.contains("ambiguous"), e3.getMessage)
  }

  test("videoHash64Hex: XOR fold of frame hashes; empty-clip contract") {
    // frame A: block 0 on → "8000000000000000"; frame B: flat → all
    // bits 0 → "0000000000000000"; XOR fold keeps A's bit
    val pxA = Array.tabulate(256) { i =>
      val (y, x) = (i / 16, i % 16)
      if (y < 2 && x < 2) 200.toByte else 10.toByte
    }
    val a = MediaOps.PnmImage(16, 16, 1, 255, pxA)
    val b = MediaOps.PnmImage(16, 16, 1, 255, Array.fill(256)(10.toByte))
    assert(MediaOps.videoHash64Hex(Seq(a, b)) == "8000000000000000")
    // an identical frame pair cancels under XOR
    assert(MediaOps.videoHash64Hex(Seq(a, a)) == "0000000000000000")
    assert(MediaOps.videoHash64Hex(Seq(a, b, a)) == "0000000000000000")
    val e = intercept[IllegalArgumentException](
      MediaOps.videoHash64Hex(Seq.empty))
    assert(e.getMessage.contains("at least one frame"), e.getMessage)
  }

  test("videoHashPairs: within-family Hamming = |variant delta|, complete") {
    import spark.implicits._
    val docs = (0L until 25L).toDF("doc_id")
    val media = MediaOps.syntheticPnmVideoCorpus(docs)
    val got = MediaOps.videoHashPairs(media)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, h) => ((a, b), h) }.toMap
    val expected = (for {
      fam <- 0 until 5; va <- 0 until 5; vb <- va + 1 until 5
      if vb - va <= 3
    } yield ((fam * 5L + va, fam * 5L + vb), (vb - va).toLong)).toMap
    assert(got == expected,
      s"missing=${expected.keySet -- got.keySet} extra=${got.keySet -- expected.keySet}")
    spark.catalog.clearCache()
  }

  test("videoFrameHashes: per-frame rows match the still-image kernel") {
    import spark.implicits._
    val docs = Seq(7L).toDF("doc_id")
    val media = MediaOps.syntheticPnmVideoCorpus(docs)
    val rows = MediaOps.videoFrameHashes(media)
      .as[(Long, Int, String)].collect().sortBy(_._2)
    assert(rows.map(_._2).toSeq == Seq(0, 1, 2, 3))
    // recompute each frame hash through decodePnmStream + the kernel
    val payload = media.select("payload").as[Array[Byte]].head()
    val frames = MediaOps.decodePnmStream(payload).get
    assert(rows.map(_._3).toSeq == frames.map(MediaOps.aHash64Hex))
    // and the clip hash is their XOR fold
    val clip = MediaOps.videoHash(media).as[(Long, String)].head()._2
    assert(clip == f"${rows.map(r =>
      java.lang.Long.parseUnsignedLong(r._3, 16)).reduce(_ ^ _)}%016x")
  }

  test("extractFeatures: real PNM pixels drive the histogram and dims") {
    import spark.implicits._
    // P6 2×2 with 12 known samples → hand-computed nibble histogram;
    // the caller-supplied width/height (999) MUST be overridden by the
    // decoded header (2×2)
    val px = Array.tabulate(12)(i => (i * 21).toByte) // 0,21,42,...,231
    val payload = bytes("P6 2 2 255\n") ++ px
    val expected = new Array[Long](16)
    px.foreach { b => expected((b >> 4) & 0xF) += 1; expected(b & 0xF) += 1 }
    val df = Seq(("d1", "m1", "image", payload, 999, 999))
      .toDF("doc_id", "media_ref", "media_type", "payload", "width", "height")
    val f = MediaOps.extractFeatures(df).collect().head
    assert(f.width == 2 && f.height == 2, "decoded dims must win over caller dims")
    assert(f.n_bytes == payload.length)
    assert(f.nibble_hist.sameElements(expected),
      s"hist ${f.nibble_hist.mkString(",")} != ${expected.mkString(",")}")
    // a non-PNM payload keeps the caller dims + stub passthrough bytes
    val stub = Seq(("d2", "m2", "image", Array[Byte](0x12, 0x34), 7, 9))
      .toDF("doc_id", "media_ref", "media_type", "payload", "width", "height")
    val g = MediaOps.extractFeatures(stub).collect().head
    assert(g.width == 7 && g.height == 9)
    assert(g.nibble_hist(1) == 1 && g.nibble_hist(2) == 1 &&
      g.nibble_hist(3) == 1 && g.nibble_hist(4) == 1)
  }
}
