package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads +
  * typed metadata, with decode / feature-extract / resize / frame-sample
  * as partition-wise typed transforms (`mapPartitions` over Datasets —
  * the JVM analogue of `mapInPandas`: per-partition batch iterators,
  * explicit schemas, no driver collect).
  *
  * REAL here: the schema, the binary payload path, the partition batch
  * shape, the typed Encoders, the join back into the relational
  * pipeline. STUBBED (clearly marked): the actual codec — no image/audio
  * libraries ship in this container, so `decodeStub` derives
  * deterministic pseudo-pixels from the payload bytes; swap
  * `decodeStub`/`resizeStub`/`frameOffsets` for real codecs (e.g.
  * javacv/ImageIO) without touching any Spark plumbing.
  */
object MediaOps {

  final case class MediaBlob(doc_id: String, media_ref: String, media_type: String,
                             payload: Array[Byte], width: Int, height: Int)
  final case class MediaFeature(doc_id: String, media_ref: String, media_type: String,
                                n_bytes: Long, width: Int, height: Int,
                                nibble_hist: Array[Long], frame_count: Int)

  /** deterministic fake payload: 64 bytes from chained md5 of media_ref
    * (reproducible in SQL for the oracle: the hex string is
    * md5(ref) || md5(ref||'1') || md5(ref||'2') || md5(ref||'3')).
    */
  def syntheticMedia(corpus: DataFrame): DataFrame = {
    val spans = CorpusOps.explodedSpans(corpus).where(col("kind") === "media")
    val hexPayload = concat(
      md5(col("media_ref").cast("binary")),
      md5(concat(col("media_ref"), lit("1")).cast("binary")),
      md5(concat(col("media_ref"), lit("2")).cast("binary")),
      md5(concat(col("media_ref"), lit("3")).cast("binary")))
    spans.select(
      col("doc_id"), col("media_ref"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("offset") % 3 + 1).cast("int")).as("media_type"),
      unhex(hexPayload).as("payload"))
      .withColumn("width", (conv(substring(hex(col("payload")), 1, 2), 16, 10)
        .cast("int") % 16 + 1) * 64)
      .withColumn("height", (conv(substring(hex(col("payload")), 3, 2), 16, 10)
        .cast("int") % 16 + 1) * 64)
  }

  /** [[syntheticMedia]]'s planted-duplicate sibling: payload bytes are
    * keyed by `(doc_id % modulus, offset)` instead of the globally
    * unique media_ref, so documents congruent mod lcm(modulus, 21)
    * carry byte-identical ordered media sequences behind distinct refs
    * (21 = lcm(3, 7) pins the span structure: kind pattern is mod 3,
    * span count mod 7). The planted groups [[CorpusOps.mediaContentDedup]]
    * must find exactly; the md5-chain payload formula is recomputable
    * in SQL like syntheticMedia's.
    */
  def syntheticSharedMedia(corpus: DataFrame, modulus: Int): DataFrame = {
    require(modulus > 0, s"syntheticSharedMedia: modulus must be positive, got $modulus")
    val spans = CorpusOps.explodedSpans(corpus).where(col("kind") === "media")
    val i = regexp_extract(col("media_ref"), "media://(\\d+)/(\\d+)", 1).cast("long")
    val key = format_string(s"shared://%d/%d", i % modulus, col("offset"))
    val hexPayload = concat(
      md5(key.cast("binary")),
      md5(concat(key, lit("1")).cast("binary")),
      md5(concat(key, lit("2")).cast("binary")),
      md5(concat(key, lit("3")).cast("binary")))
    spans.select(col("doc_id"), col("media_ref"),
      unhex(hexPayload).as("payload"))
  }

  // ---- CODEC SECTION --------------------------------------------------
  // REAL: binary PNM (P5 grayscale / P6 RGB) — fixed header + raw pixel
  // bytes, decodable with zero external libraries (round-4 verdict #4).
  // STUB (clearly marked below): every other format — JPEG/PNG/PCM need
  // codec libraries this zero-egress container doesn't ship.

  /** a decoded binary-PNM image: `pixels` is the raw sample array,
    * row-major, `channels` interleaved (1 for P5, 3 for P6).
    */
  final case class PnmImage(width: Int, height: Int, channels: Int,
                            maxVal: Int, pixels: Array[Byte])

  /** Decode a binary PNM payload (P5 = PGM grayscale, P6 = PPM RGB).
    * Returns None when the magic is not P5/P6 (callers fall back to the
    * stub path); a payload that CLAIMS to be PNM but is malformed —
    * bad/missing header tokens, 16-bit maxval (unsupported), truncated
    * pixel data — raises loudly rather than yielding garbage pixels
    * (the FAILFAST contract of the GeoSources readers).
    *
    * Header grammar per the netpbm spec: magic, then whitespace-
    * separated width, height, maxval, with `#`-to-end-of-line comments
    * allowed between tokens, then EXACTLY ONE whitespace byte before
    * the raw samples.
    */
  def decodePnm(payload: Array[Byte]): Option[PnmImage] = {
    if (payload.length < 2 || payload(0) != 'P' ||
      (payload(1) != '5' && payload(1) != '6')) return None
    val channels = if (payload(1) == '5') 1 else 3
    var pos = 2
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed PNM payload: $msg")
    def nextInt(what: String): Int = {
      // skip whitespace and comments
      var inComment = false
      while (pos < payload.length && {
        val b = payload(pos)
        if (inComment) { if (b == '\n') inComment = false; true }
        else if (b == '#') { inComment = true; true }
        else b == ' ' || b == '\t' || b == '\r' || b == '\n'
      }) pos += 1
      val start = pos
      var v = 0L
      while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
        v = v * 10 + (payload(pos) - '0')
        if (v > Int.MaxValue) fail(s"$what out of range")
        pos += 1
      }
      if (pos == start) fail(s"expected $what at byte $pos")
      v.toInt
    }
    val w = nextInt("width")
    val h = nextInt("height")
    val maxVal = nextInt("maxval")
    if (w <= 0 || h <= 0) fail(s"non-positive dimensions ${w}x$h")
    if (maxVal <= 0 || maxVal > 255)
      fail(s"maxval $maxVal unsupported (only single-byte samples)")
    // exactly one whitespace byte separates maxval from the raster
    if (pos >= payload.length || !Set(' ', '\t', '\r', '\n')(payload(pos).toChar))
      fail("missing whitespace before raster")
    val sep = payload(pos)
    pos += 1
    val n = w.toLong * h * channels
    // CRLF-terminated header (text-mode writer): the spec's separator is
    // ONE whitespace byte, so a bare '\r' skip would leave '\n' as the
    // first "pixel" and silently shift the whole raster (round-5 review
    // finding). Trailing bytes after the raster are REJECTED (round-5
    // ADVICE): requiring an exact fit makes the CRLF decision unique —
    // a '\r\n' separator leaves exactly n+1 bytes (consume the '\n'),
    // a legal single-'\r' separator whose first sample is 0x0A leaves
    // exactly n (keep it as pixel data) — so the formerly ambiguous
    // "trailing bytes + 0x0A first sample" case now raises loudly
    // instead of decoding a raster shifted by one byte.
    if (sep == '\r' && payload.length - pos == n + 1 &&
      pos < payload.length && payload(pos) == '\n') pos += 1
    if (payload.length - pos < n)
      fail(s"truncated raster: need $n bytes, have ${payload.length - pos}")
    if (payload.length - pos > n)
      fail(s"trailing bytes after raster: need $n bytes, have " +
        s"${payload.length - pos} (PNM payloads must end at the raster — " +
        "the strict decoder rejects them rather than guessing where the " +
        "samples start)")
    Some(PnmImage(w, h, channels, maxVal,
      java.util.Arrays.copyOfRange(payload, pos, pos + n.toInt)))
  }

  /** decode: REAL for binary PNM payloads (pixels + header dims), stub
    * passthrough for everything else. Returns (samples, Some((w, h))
    * when a real header was decoded).
    *
    * SNIFFING CONTRACT (round-5 review finding): a 2-byte "P5"/"P6"
    * prefix on an ARBITRARY binary corpus is not a format claim — with
    * random payloads it occurs at ~2/65536 per row, so a corpus of 10⁵+
    * binaries (raw PCM, ciphertext, the synthetic media table at
    * scale) is statistically guaranteed to contain magic collisions.
    * The auto path therefore commits to the PNM parser only when the
    * ENTIRE payload validates (header parses AND the raster fits
    * EXACTLY — trailing bytes reject, tightening the collision odds
    * further);
    * anything else falls back to the stub instead of throwing. Corpora
    * KNOWN to be PNM should call [[decodePnm]] directly — that path
    * keeps the raise-loudly contract for genuinely corrupt files.
    * Residual risk, documented: a random payload that happens to parse
    * as a complete valid PNM (magic AND header grammar AND size match)
    * silently takes the real path — p < 1e-10 per row.
    */
  private def decode(payload: Array[Byte]): (Array[Byte], Option[(Int, Int)]) =
    (try decodePnm(payload)
     catch { case _: IllegalArgumentException => None }) match {
      case Some(img) => (img.pixels, Some((img.width, img.height)))
      case None => (decodeStub(payload), None)
    }

  // ---- STUB SECTION: replace with real codecs -------------------------

  /** STUB decode for non-PNM payloads: payload bytes ARE the "pixels".
    * A real implementation would decode JPEG/PNG/PCM here.
    */
  private def decodeStub(payload: Array[Byte]): Array[Byte] = payload

  /** deterministic nearest-neighbour subsample to at most `maxPx`
    * samples (shared by the real and stub decode paths).
    */
  private def resizeStub(pixels: Array[Byte], maxPx: Int): Array[Byte] =
    if (pixels.length <= maxPx) pixels
    else Array.tabulate(maxPx)(i => pixels(i * pixels.length / maxPx))

  /** STUB frame sampling for "video": deterministic frame count from the
    * payload (a real implementation samples keyframes).
    */
  private def frameOffsets(payload: Array[Byte]): Array[Int] = {
    val n = (payload.headOption.getOrElse(0: Byte) & 0x03) + 1
    Array.tabulate(n)(i => i * math.max(1, payload.length / n))
  }

  // ---------------------------------------------------------------------

  /** decode + feature-extract, partition-wise: one pass per partition
    * over the binary payloads producing typed feature rows (nibble
    * histogram over the decoded samples; deterministic and
    * SQL-reproducible for the oracle). Binary-PNM payloads take the
    * REAL codec path — pixel samples and header dimensions; anything
    * else flows through the stub passthrough with the caller-supplied
    * dims (the driver's synthetic media is not PNM, so its oracle is
    * unchanged; MediaOpsSpec pins the real path byte-exactly).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_ref", "media_type", "payload", "width", "height")
      .as[(String, String, String, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        it.map { case (doc, ref, typ, payload, w0, h0) =>
          val (samples, dims) = decode(payload)
          val (w, h) = dims.getOrElse((w0, h0))
          val pixels = resizeStub(samples, 4096)
          val hist = new Array[Long](16)
          var i = 0
          while (i < pixels.length) {
            hist((pixels(i) >> 4) & 0xF) += 1
            hist(pixels(i) & 0xF) += 1
            i += 1
          }
          val frames = if (typ == "video") frameOffsets(payload).length else 1
          MediaFeature(doc, ref, typ, payload.length.toLong, w, h, hist, frames)
        }
      }
  }

  final case class MediaFrame(doc_id: String, media_ref: String, frame_idx: Int,
                              frame_offset: Int, frame_payload: Array[Byte])

  /** frame sampling for video payloads, partition-wise: one row per
    * sampled frame carrying the frame's byte slice (the shape a training
    * pipeline hands to a per-frame encoder). Deterministic stub offsets
    * (`frameOffsets`); swap for keyframe detection without touching the
    * Spark plumbing.
    */
  def sampleFrames(media: DataFrame): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.where(col("media_type") === "video")
      .select("doc_id", "media_ref", "payload")
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (doc, ref, payload) =>
          val offs = frameOffsets(payload)
          val flen = math.max(1, payload.length / offs.length)
          offs.zipWithIndex.map { case (off, i) =>
            MediaFrame(doc, ref, i, off,
              payload.slice(off, math.min(payload.length, off + flen)))
          }
        }
      }
  }

  /** features → dense float vector (joins the VectorOps ANN path). */
  def featureVectors(features: Dataset[MediaFeature]): DataFrame =
    features.toDF().select(col("doc_id"), col("media_ref"),
      transform(col("nibble_hist"), x => x.cast("float")).as("embedding"))

  // ---- PERCEPTUAL IMAGE NEAR-DUP (round-5 verdict #3) -----------------
  // Real pixels (decodePnm) → 8×8 average-hash → the same 4-band
  // pigeonhole + XOR-popcount machinery text simhash uses. Makes the
  // media column a first-class dedup axis: two images whose DOWNSAMPLED
  // luminance pattern differs in ≤ maxHamming of 64 blocks pair up, no
  // matter how their payload bytes differ.

  final case class PnmMedia(media_id: Long, payload: Array[Byte])
  final case class MediaHash(media_id: Long, ahash64: String)

  /** Deterministic synthetic P5 corpus for tests/benchmarks: one 16×16
    * grayscale image per input doc_id, family `doc_id / 5`, variant
    * `doc_id % 5`. Pixel blocks (2×2) are flat 200 ("on") or 10 ("off"):
    * block `b` of family `f` is on iff the first hex digit of
    * md5("f:b") ≥ '8', and variant `v` FLIPS blocks 0..v−1 — so within
    * a family aHash Hamming distance is exactly |v₁−v₂| (variants 0 vs 4
    * = 4, beyond the pairing threshold: the refine has something real to
    * reject) while cross-family distance is ~Binomial(64, ½) ≈ 32. The
    * same block formula is recomputable in SQL (the driver oracle
    * derives the hash from it independently of the byte path here).
    */
  def syntheticPnmImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val (f, v) = (id / 5, id % 5)
        val header = s"P5 16 16 255\n".getBytes("US-ASCII")
        // one digest per BLOCK (the 4 pixels of a 2×2 block share it —
        // hashing inside the pixel loops cost 4× the digests)
        val on = Array.tabulate(64) { b =>
          val d = md.digest(s"$f:$b".getBytes("US-ASCII"))
          (((d(0) >> 4) & 0xF) >= 8) ^ (b < v)
        }
        val px = new Array[Byte](256)
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            px(y * 16 + x) = if (on((y / 2) * 8 + (x / 2))) 200.toByte else 10.toByte
            x += 1
          }
          y += 1
        }
        PnmMedia(id, header ++ px)
      }
    }.toDF()
  }

  /** 64-bit average-hash (aHash) over REAL decoded PNM pixels, as a
    * 16-hex-char string (same shape as TextOps.simhash, so the banding
    * machinery is shared): the image is box-downsampled to 8×8 blocks
    * and bit `b` (row-major; hex char b/4, weight 8>>(b%4)) is set iff
    * block b's sample sum × 64 exceeds the image total — integer-exact
    * "block mean above global mean", no float thresholds. P6 payloads
    * sum all three channels per block (luminance ∝ R+G+B under equal
    * weights — exact, unlike a /3 mean). Width and height must be
    * multiples of 8 (loud error otherwise: silently ragged blocks would
    * make the hash depend on rounding direction). Strict [[decodePnm]]
    * inside — a corpus handed to the image-dedup path is CLAIMED to be
    * PNM, so malformed payloads raise rather than hash garbage.
    */
  def aHash(media: DataFrame, idCol: String = "media_id",
            payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val img = decodePnm(payload).getOrElse(throw new IllegalArgumentException(
            s"aHash: payload of media_id=$id is not binary PNM (P5/P6) — " +
              "the image near-dup path requires decodable pixels"))
          MediaHash(id, aHash64Hex(img))
        }
      }.toDF()
  }

  /** the hash kernel, exposed for byte-exact unit tests and the
    * `ahash64_pnm` SQL registration
    */
  private[graft] def aHash64Hex(img: PnmImage): String = {
    require(img.width % 8 == 0 && img.height % 8 == 0,
      s"aHash needs dimensions divisible by 8, got ${img.width}x${img.height}")
    val (bw, bh) = (img.width / 8, img.height / 8)
    val sums = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val b = (y / bh) * 8 + (x / bw)
        var c = 0
        while (c < img.channels) {
          val s = img.pixels((y * img.width + x) * img.channels + c) & 0xFF
          sums(b) += s
          total += s
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val hex = "0123456789abcdef"
    val sb = new StringBuilder(16)
    var p = 0
    while (p < 16) {
      var nib = 0
      var i = 0
      while (i < 4) {
        if (sums(p * 4 + i) * 64 > total) nib |= 8 >> i
        i += 1
      }
      sb.append(hex.charAt(nib))
      p += 1
    }
    sb.toString
  }

  /** perceptual near-dup image pairs: aHash over real pixels, then the
    * shared 4-band pigeonhole + exact XOR-popcount refine
    * (TextOps.hamming64Pairs — complete for Hamming ≤ 3). Returns
    * `(media_a, media_b, hamming)`. Scale shape: one narrow decode+hash
    * pass, then band equi-joins over 16-bit keys with the hot-band DF
    * cap as skew guard — never all-pairs over images.
    */
  def aHashPairs(media: DataFrame, maxHamming: Int = 3,
                 maxBandDf: Long = TextOps.DefaultMaxBandDf): DataFrame =
    TextOps.hamming64Pairs(aHash(media), "media_id", "ahash64",
        maxHamming, maxBandDf)
      .select(col("id_a").as("media_a"), col("id_b").as("media_b"), col("hamming"))

  // ---- audio: real RIFF/PCM16 WAV codec + features + near-dup hash ----

  final case class WavAudio(sampleRate: Int, channels: Int,
                            samples: Array[Short]) {
    def frames: Int = samples.length / channels
  }
  final case class WavMedia(media_id: Long, payload: Array[Byte])
  final case class AudioHash(media_id: Long, audio64: String)
  final case class AudioFeature(media_id: Long, sample_rate: Long,
                                channels: Long, n_frames: Long,
                                zero_crossings: Long, peak_abs: Long,
                                abs_sum: Long)

  /** Strict RIFF/WAVE decoder for 16-bit PCM (the one WAV shape a
    * training corpus normalizes to; no codec libraries in this
    * environment, and none are needed — PCM16 is a header + LE
    * samples). Returns None iff the payload does not carry the
    * RIFF/WAVE magic (not a WAV claim at all); any malformed WAV —
    * wrong RIFF size, non-PCM format tag, non-16-bit samples,
    * inconsistent block align/byte rate, odd data size, chunk
    * overrun, data before fmt, missing chunks — raises loudly, same
    * contract as [[decodePnm]]. Unknown chunks (LIST/INFO/fact…) are
    * skipped per the RIFF spec, including the odd-size pad byte; the
    * chunk walk must land EXACTLY on payload end, so trailing garbage
    * that is not a well-formed chunk raises rather than being ignored.
    */
  def decodeWav(payload: Array[Byte]): Option[WavAudio] = {
    if (payload.length < 12 || payload(0) != 'R' || payload(1) != 'I' ||
      payload(2) != 'F' || payload(3) != 'F' || payload(8) != 'W' ||
      payload(9) != 'A' || payload(10) != 'V' || payload(11) != 'E') return None
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed WAV payload: $msg")
    def u16(o: Int): Int = (payload(o) & 0xFF) | ((payload(o + 1) & 0xFF) << 8)
    def u32(o: Int): Long = (payload(o) & 0xFFL) | ((payload(o + 1) & 0xFFL) << 8) |
      ((payload(o + 2) & 0xFFL) << 16) | ((payload(o + 3) & 0xFFL) << 24)
    val riffSize = u32(4)
    if (riffSize != payload.length - 8L)
      fail(s"RIFF size $riffSize != payload length - 8 (${payload.length - 8})")
    var pos = 12
    var fmt: Option[(Int, Int)] = None // (channels, sampleRate)
    var data: Option[Array[Short]] = None
    while (pos < payload.length) {
      if (payload.length - pos < 8) fail(s"truncated chunk header at byte $pos")
      val id = new String(payload, pos, 4, "US-ASCII")
      val size = u32(pos + 4)
      pos += 8
      if (size > payload.length - pos)
        fail(s"chunk '$id' of $size bytes overruns payload at byte $pos")
      id match {
        case "fmt " =>
          // a second fmt would silently re-bind channels under an
          // already-decoded data chunk (round-6 ADVICE) — raise, per
          // the docstring's any-malformed-WAV-raises contract
          if (fmt.isDefined) fail("duplicate fmt chunk")
          if (size < 16) fail(s"fmt chunk too small ($size bytes)")
          val audioFormat = u16(pos)
          if (audioFormat != 1)
            fail(s"audio format $audioFormat unsupported (PCM=1 only)")
          val ch = u16(pos + 2)
          val sr = u32(pos + 4)
          val byteRate = u32(pos + 8)
          val blockAlign = u16(pos + 12)
          val bits = u16(pos + 14)
          if (bits != 16)
            fail(s"$bits bits/sample unsupported (16-bit PCM only)")
          if (ch <= 0 || sr <= 0 || sr > Int.MaxValue)
            fail(s"invalid channels ($ch) or sample rate ($sr)")
          if (blockAlign != ch * 2)
            fail(s"block align $blockAlign != channels*2 (${ch * 2})")
          if (byteRate != sr * blockAlign)
            fail(s"byte rate $byteRate != sampleRate*blockAlign (${sr * blockAlign})")
          fmt = Some((ch, sr.toInt))
        case "data" =>
          // a second data chunk would silently replace the first
          // (round-6 ADVICE) — same fail-loud contract as fmt
          if (data.isDefined) fail("duplicate data chunk")
          val (ch, _) = fmt.getOrElse(fail("data chunk before fmt chunk"))
          if (size % 2 != 0) fail(s"odd data chunk size $size")
          val n = (size / 2).toInt
          if (n % ch != 0)
            fail(s"data holds $n samples, not a multiple of $ch channels")
          val ss = new Array[Short](n)
          var i = 0
          while (i < n) {
            ss(i) = ((payload(pos + 2 * i) & 0xFF) |
              (payload(pos + 2 * i + 1) << 8)).toShort
            i += 1
          }
          data = Some(ss)
        case _ => () // unknown chunk: skip (RIFF metadata is legal)
      }
      pos += size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    val (ch, sr) = fmt.getOrElse(fail("missing fmt chunk"))
    val ss = data.getOrElse(fail("missing data chunk"))
    Some(WavAudio(sr, ch, ss))
  }

  /** canonical 44-byte-header PCM16 WAV writer (round-trips through
    * [[decodeWav]] bit-exactly; the synthetic corpus generator)
    */
  def encodeWav(sampleRate: Int, channels: Int,
                samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0,
      s"encodeWav: invalid sampleRate=$sampleRate channels=$channels")
    require(samples.length % channels == 0,
      s"encodeWav: ${samples.length} samples not a multiple of $channels channels")
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Deterministic WAV corpus mirroring [[syntheticPnmImages]]'
    * family/variant structure in the time domain: family f, variant
    * v = id%5; 640 mono frames at 8 kHz split into 64 ten-frame
    * windows; window w is LOUD (|sample| 12000) iff md5("f:w")'s first
    * nibble ≥ 8, XOR flipped for w < v, else QUIET (|sample| 500);
    * samples alternate sign per frame. Because a loud window's abs-sum
    * (120k) clears the 64×-mean threshold for every loud/quiet mix
    * except the all-loud degenerate family, within-family
    * [[audioHash64Hex]] Hamming distance = |variant delta| exactly —
    * the same planted geometry as the image corpus, so the two
    * modalities share verification logic.
    */
  def syntheticWavCorpus(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val (f, v) = (id / 5, id % 5)
        val loud = Array.tabulate(64) { w =>
          val d = md.digest(s"$f:$w".getBytes("US-ASCII"))
          (((d(0) >> 4) & 0xF) >= 8) ^ (w < v)
        }
        val samples = new Array[Short](640)
        var i = 0
        while (i < 640) {
          val level = if (loud(i / 10)) 12000 else 500
          samples(i) = (if (i % 2 == 0) level else -level).toShort
          i += 1
        }
        WavMedia(id, encodeWav(8000, 1, samples))
      }
    }.toDF()
  }

  /** integer-exact per-clip audio descriptors over REAL decoded PCM:
    * frame value = channel sum (mono mix without a lossy /channels),
    * `zero_crossings` counts strict sign changes between consecutive
    * frames, `peak_abs`/`abs_sum` over frame values. Everything is
    * integer arithmetic — no float RMS — so the DuckDB oracle
    * reproduces each value bit-for-bit from the generator formula
    * through a fully independent path (no WAV bytes on the oracle
    * side). One narrow decode pass, no shuffle.
    */
  def audioFeatures(media: DataFrame, idCol: String = "media_id",
                    payloadCol: String = "payload"): Dataset[AudioFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val wav = decodeWav(payload).getOrElse(
            throw new IllegalArgumentException(
              s"audioFeatures: payload of media_id=$id is not RIFF/PCM16 WAV"))
          var crossings = 0L; var peak = 0L; var absSum = 0L
          var prev = 0L
          var fi = 0
          while (fi < wav.frames) {
            var s = 0L; var c = 0
            while (c < wav.channels) {
              s += wav.samples(fi * wav.channels + c); c += 1
            }
            if (fi > 0 && ((prev > 0 && s < 0) || (prev < 0 && s > 0)))
              crossings += 1
            val a = math.abs(s)
            if (a > peak) peak = a
            absSum += a
            prev = s
            fi += 1
          }
          AudioFeature(id, wav.sampleRate.toLong, wav.channels.toLong,
            wav.frames.toLong, crossings, peak, absSum)
        }
      }
  }

  /** 64-bit windowed-energy audio hash (the aHash idea in the time
    * domain): frame value = channel sum, the clip is split into 64
    * equal windows and bit `w` is set iff window w's abs-sum × 64
    * exceeds the clip total — the same integer-exact
    * "window above global mean" rule as [[aHash64Hex]], same hex
    * shape, so [[TextOps.hamming64Pairs]] verifies audio near-dups
    * with the identical audited banding engine. Frame count must be a
    * multiple of 64 (loud error otherwise — ragged windows would make
    * the hash depend on rounding direction).
    */
  private[graft] def audioHash64Hex(wav: WavAudio): String = {
    val frames = wav.frames
    require(frames > 0 && frames % 64 == 0,
      s"audioHash needs a frame count divisible by 64, got $frames")
    val wlen = frames / 64
    val sums = new Array[Long](64)
    var total = 0L
    var fi = 0
    while (fi < frames) {
      var s = 0L; var c = 0
      while (c < wav.channels) { s += wav.samples(fi * wav.channels + c); c += 1 }
      val a = math.abs(s)
      sums(fi / wlen) += a
      total += a
      fi += 1
    }
    val hex = "0123456789abcdef"
    val sb = new StringBuilder(16)
    var p = 0
    while (p < 16) {
      var nib = 0
      var i = 0
      while (i < 4) {
        if (sums(p * 4 + i) * 64 > total) nib |= 8 >> i
        i += 1
      }
      sb.append(hex.charAt(nib))
      p += 1
    }
    sb.toString
  }

  /** [[audioHash64Hex]] over a media relation — `(media_id, audio64)` */
  def audioHash(media: DataFrame, idCol: String = "media_id",
                payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val wav = decodeWav(payload).getOrElse(
            throw new IllegalArgumentException(
              s"audioHash: payload of media_id=$id is not RIFF/PCM16 WAV — " +
                "the audio near-dup path requires decodable samples"))
          AudioHash(id, audioHash64Hex(wav))
        }
      }.toDF()
  }

  /** perceptual near-dup audio pairs — decode + hash, then the shared
    * 4-band pigeonhole + XOR-popcount refine (complete for Hamming ≤ 3)
    */
  def audioHashPairs(media: DataFrame, maxHamming: Int = 3,
                     maxBandDf: Long = TextOps.DefaultMaxBandDf): DataFrame =
    TextOps.hamming64Pairs(audioHash(media), "media_id", "audio64",
        maxHamming, maxBandDf)
      .select(col("id_a").as("media_a"), col("id_b").as("media_b"), col("hamming"))

  // ---- video: concatenated-PNM stream codec + clip signature ----------
  // The raw-video shape MJPEG has for JPEG: a clip is back-to-back
  // strict PNM frames (netpbm's own multi-image convention — ppmtoy4m
  // and friends consume exactly this). Real end-to-end: stream walk,
  // per-frame strict decode, per-frame aHash, XOR-fold clip signature,
  // then the SAME shared banding engine as text/image/audio near-dup.

  final case class VideoMedia(media_id: Long, payload: Array[Byte])
  final case class VideoHash(media_id: Long, vhash64: String)
  final case class FrameHash(media_id: Long, frame_idx: Int, ahash64: String)

  /** Split a concatenated-PNM stream into strict frames. Returns None
    * iff the payload does not open with a P5/P6 magic (not a PNM-video
    * claim at all); any malformed stream — a frame boundary that is not
    * a P5/P6 magic, truncated raster, bad header — raises loudly via
    * the same strict [[decodePnm]] every sliced frame passes through.
    *
    * Stream-specific contract: the one-whitespace separator before each
    * raster must NOT be '\r'. In a whole-payload decode the exact-fit
    * rule disambiguates "CRLF separator" from "'\r' separator + 0x0A
    * first sample"; mid-stream there is no end-of-payload anchor, so
    * the two parses are genuinely indistinguishable and a guess could
    * silently shift every later frame. Canonical writers (this file's
    * [[encodePnmVideo]], netpbm tools) emit '\n'; a '\r' separator
    * raises with a re-encode hint instead of guessing.
    */
  def decodePnmStream(payload: Array[Byte]): Option[Vector[PnmImage]] = {
    if (payload.length < 2 || payload(0) != 'P' ||
      (payload(1) != '5' && payload(1) != '6')) return None
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed PNM stream: $msg")
    val out = Vector.newBuilder[PnmImage]
    var off = 0
    var idx = 0
    while (off < payload.length) {
      if (payload.length - off < 2 || payload(off) != 'P' ||
        (payload(off + 1) != '5' && payload(off + 1) != '6'))
        fail(s"frame $idx at byte $off does not start with a P5/P6 magic")
      val channels = if (payload(off + 1) == '5') 1 else 3
      var pos = off + 2
      // the boundary scan mirrors decodePnm's header grammar only far
      // enough to FIND the frame end; the slice then goes through the
      // full strict decoder, so any disagreement raises loudly there
      def nextInt(what: String): Long = {
        var inComment = false
        while (pos < payload.length && {
          val b = payload(pos)
          if (inComment) { if (b == '\n') inComment = false; true }
          else if (b == '#') { inComment = true; true }
          else b == ' ' || b == '\t' || b == '\r' || b == '\n'
        }) pos += 1
        val start = pos
        var v = 0L
        while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
          v = v * 10 + (payload(pos) - '0')
          if (v > Int.MaxValue) fail(s"frame $idx: $what out of range")
          pos += 1
        }
        if (pos == start) fail(s"frame $idx: expected $what at byte $pos")
        v
      }
      val w = nextInt("width"); val h = nextInt("height"); nextInt("maxval")
      if (pos >= payload.length) fail(s"frame $idx: missing raster")
      val sep = payload(pos)
      if (sep == '\r')
        fail(s"frame $idx: '\\r' separator is ambiguous mid-stream " +
          "(CRLF vs '\\r' + 0x0A first sample has no end-of-payload " +
          "anchor) — re-encode frames with a canonical '\\n' separator")
      if (sep != ' ' && sep != '\t' && sep != '\n')
        fail(s"frame $idx: missing whitespace before raster")
      pos += 1
      val n = w * h * channels
      if (payload.length - pos < n)
        fail(s"frame $idx: truncated raster: need $n bytes, have " +
          s"${payload.length - pos}")
      val end = pos + n.toInt
      out += decodePnm(java.util.Arrays.copyOfRange(payload, off, end))
        .getOrElse(fail(s"frame $idx lost its magic during slicing")) // unreachable
      off = end
      idx += 1
    }
    Some(out.result())
  }

  /** canonical stream writer: each frame a strict single-'\n' PNM
    * payload, concatenated (round-trips through [[decodePnmStream]])
    */
  def encodePnmVideo(frames: Seq[PnmImage]): Array[Byte] = {
    require(frames.nonEmpty, "encodePnmVideo: empty clip")
    frames.toArray.flatMap { f =>
      val magic = if (f.channels == 1) "P5" else "P6"
      s"$magic ${f.width} ${f.height} ${f.maxVal}\n".getBytes("US-ASCII") ++
        f.pixels
    }
  }

  /** 64-bit clip signature: XOR of the per-frame [[aHash64Hex]] values.
    * XOR-fold keeps the planted-geometry property the pairing engine
    * needs — editing one frame's blocks flips exactly those clip bits —
    * while staying order-insensitive the way a content signature should
    * be for re-muxed clips. Same 16-hex shape as every other signature,
    * so [[TextOps.hamming64Pairs]] is the (fourth-modality) verifier.
    */
  def videoHash64Hex(frames: Seq[PnmImage]): String = {
    require(frames.nonEmpty, "videoHash needs at least one frame")
    var acc = 0L
    frames.foreach { f =>
      acc ^= java.lang.Long.parseUnsignedLong(aHash64Hex(f), 16)
    }
    f"$acc%016x"
  }

  /** Deterministic PNM-video corpus completing the modality triple:
    * clip = 4 concatenated 16×16 P5 frames; frame t of family f
    * (= id/5) uses [[syntheticPnmImages]]' block formula with family
    * key f×4+t, and variant v (= id%5) flips blocks 0..v−1 of frame 0
    * ONLY — under the XOR fold the unedited frames cancel, so
    * within-family clip-signature Hamming = |variant delta| exactly,
    * the same planted geometry as the image and audio corpora.
    */
  def syntheticPnmVideoCorpus(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val (f, v) = (id / 5, id % 5)
        val frames = (0 until 4).map { t =>
          val on = Array.tabulate(64) { b =>
            val d = md.digest(s"${f * 4 + t}:$b".getBytes("US-ASCII"))
            (((d(0) >> 4) & 0xF) >= 8) ^ (t == 0 && b < v)
          }
          val px = new Array[Byte](256)
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              px(y * 16 + x) =
                if (on((y / 2) * 8 + (x / 2))) 200.toByte else 10.toByte
              x += 1
            }
            y += 1
          }
          PnmImage(16, 16, 1, 255, px)
        }
        VideoMedia(id, encodePnmVideo(frames))
      }
    }.toDF()
  }

  /** clip signatures over a video relation — `(media_id, vhash64)` */
  def videoHash(media: DataFrame, idCol: String = "media_id",
                payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val frames = decodePnmStream(payload).getOrElse(
            throw new IllegalArgumentException(
              s"videoHash: payload of media_id=$id is not a PNM stream — " +
                "the video near-dup path requires decodable frames"))
          VideoHash(id, videoHash64Hex(frames))
        }
      }.toDF()
  }

  /** per-frame hashes — `(media_id, frame_idx, ahash64)`. The frame-
    * level dedup axis: an exact groupBy on `ahash64` finds clips
    * sharing content frames; the rows also join [[aHash]]-hashed still
    * images directly (same kernel, same hex shape).
    */
  def videoFrameHashes(media: DataFrame, idCol: String = "media_id",
                       payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val frames = decodePnmStream(payload).getOrElse(
            throw new IllegalArgumentException(
              s"videoFrameHashes: payload of media_id=$id is not a PNM stream"))
          frames.iterator.zipWithIndex.map { case (fr, t) =>
            FrameHash(id, t, aHash64Hex(fr))
          }
        }
      }.toDF()
  }

  /** perceptual near-dup video pairs — stream decode + XOR-fold clip
    * hash, then the shared banding engine (complete for Hamming ≤ 3)
    */
  def videoHashPairs(media: DataFrame, maxHamming: Int = 3,
                     maxBandDf: Long = TextOps.DefaultMaxBandDf): DataFrame =
    TextOps.hamming64Pairs(videoHash(media), "media_id", "vhash64",
        maxHamming, maxBandDf)
      .select(col("id_a").as("media_a"), col("id_b").as("media_b"), col("hamming"))
}
