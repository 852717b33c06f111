package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal columns: REAL BMP/WAV header decode (golden byte-literal
  * fixtures written by hand, not by the library's own builders),
  * writer/parser round-trip, opaque fallback, pluggable features. */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  /** Hand-assembled 54-byte BMP header: width=2, height=3, 24 bpp.
    * Little-endian fields written out byte-by-byte — if the parser had
    * the wrong offset or endianness this fixture would catch it. */
  private val goldenBmp: Array[Byte] = b(
    0x42, 0x4D, // "BM"
    0x36, 0x00, 0x00, 0x00, // file size 54
    0x00, 0x00, 0x00, 0x00, // reserved
    0x36, 0x00, 0x00, 0x00, // pixel offset 54
    0x28, 0x00, 0x00, 0x00, // DIB header size 40
    0x02, 0x00, 0x00, 0x00, // width 2  (offset 18)
    0x03, 0x00, 0x00, 0x00, // height 3 (offset 22)
    0x01, 0x00, // planes 1
    0x18, 0x00, // 24 bpp
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00)

  /** Hand-assembled canonical PCM WAV header: 44100 Hz mono 16-bit,
    * data chunk declares 88200 bytes (= exactly 1 s) + 4 sample bytes. */
  private val goldenWav: Array[Byte] = b(
    0x52, 0x49, 0x46, 0x46, // "RIFF"
    0xAC, 0x58, 0x01, 0x00, // riff size 88200+36 (unused by parser)
    0x57, 0x41, 0x56, 0x45, // "WAVE"
    0x66, 0x6D, 0x74, 0x20, // "fmt "
    0x10, 0x00, 0x00, 0x00, // fmt chunk size 16
    0x01, 0x00, // PCM
    0x01, 0x00, // 1 channel (offset 22)
    0x44, 0xAC, 0x00, 0x00, // 44100 Hz (offset 24)
    0x88, 0x58, 0x01, 0x00, // byte rate 88200 (offset 28)
    0x02, 0x00, // block align
    0x10, 0x00, // 16 bits/sample
    0x64, 0x61, 0x74, 0x61, // "data"
    0x88, 0x58, 0x01, 0x00, // data size 88200 (offset 40)
    0x00, 0x01, 0x02, 0x03) // (first sample bytes)

  /** Hand-assembled complete PNG: signature + IHDR (width=2, height=3,
    * 8-bit truecolor) with its REAL CRC-32 trailer + a 4-byte IDAT +
    * IEND. Big-endian fields written out byte-by-byte. */
  private val goldenPng: Array[Byte] = b(
    0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // signature
    0x00, 0x00, 0x00, 0x0D, // IHDR length 13
    0x49, 0x48, 0x44, 0x52, // "IHDR"
    0x00, 0x00, 0x00, 0x02, // width 2  (offset 16, BE)
    0x00, 0x00, 0x00, 0x03, // height 3 (offset 20, BE)
    0x08, 0x02, 0x00, 0x00, 0x00, // 8-bit, truecolor, no interlace
    0x36, 0x88, 0x49, 0xD6, // CRC-32("IHDR"+data) — real
    0x00, 0x00, 0x00, 0x04, // IDAT length 4
    0x49, 0x44, 0x41, 0x54, 0x00, 0x01, 0x02, 0x03, // "IDAT" + bytes
    0x40, 0xDE, 0xBE, 0x08, // CRC-32 — real
    0x00, 0x00, 0x00, 0x00, // IEND length 0
    0x49, 0x45, 0x4E, 0x44, // "IEND"
    0xAE, 0x42, 0x60, 0x82) // CRC-32 — real

  // JPEG marker-chain segments, assembled per fixture below
  private val jpegSoi = b(0xFF, 0xD8)
  private val jpegApp0 = b( // 16-byte JFIF 1.1 APP0
    0xFF, 0xE0, 0x00, 0x10, 0x4A, 0x46, 0x49, 0x46, 0x00, 0x01,
    0x01, 0x00, 0x00, 0x48, 0x00, 0x48, 0x00, 0x00)
  private val jpegApp1Exif = b( // APP1 "Exif\0\0" + minimal TIFF header
    0xFF, 0xE1, 0x00, 0x10, 0x45, 0x78, 0x69, 0x66, 0x00, 0x00,
    0x49, 0x49, 0x2A, 0x00, 0x08, 0x00, 0x00, 0x00)
  /** SOF frame header: height=3, width=2, 3 components. */
  private def jpegSof(marker: Int) = b(
    0xFF, marker, 0x00, 0x11, 0x08, 0x00, 0x03, 0x00, 0x02, 0x03,
    0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
  private val jpegSos = b(
    0xFF, 0xDA, 0x00, 0x0C, 0x03, 0x01, 0x00, 0x02, 0x11, 0x03,
    0x11, 0x00, 0x3F, 0x00)
  private val jpegTail = b(0x12, 0x34, 0xFF, 0xD9) // entropy bytes + EOI

  private def meta(payload: Array[Byte]) = {
    val df = Seq(Tuple1(payload)).toDF("media")
    Multimodal.withMediaMeta(df, $"media", "image/*")
      .select($"fmt", $"width", $"height", $"jpeg_progressive").collect()(0)
  }

  test("withMediaMeta parses a hand-written PNG (IHDR big-endian)") {
    val r = meta(goldenPng)
    assert(r.getString(0) == "png")
    assert(r.getLong(1) == 2L && r.getLong(2) == 3L)
    assert(r.isNullAt(3)) // progressive is a JPEG-only field
  }

  test("PNG shorter than signature+IHDR, or without IHDR first, is opaque") {
    val short = goldenPng.take(32) // one byte under the 33-byte minimum
    assert(meta(short).getString(0) == "opaque")
    val wrongChunk = goldenPng.clone()
    wrongChunk(12) = 'i'.toByte // "iHDR" — not the mandatory first chunk
    val r = meta(wrongChunk)
    assert(r.getString(0) == "opaque" && r.isNullAt(1))
  }

  test("baseline JPEG: marker walk skips APP0 and finds SOF0 dims") {
    val r = meta(jpegSoi ++ jpegApp0 ++ jpegSof(0xC0) ++ jpegSos ++ jpegTail)
    assert(r.getString(0) == "jpeg")
    assert(r.getLong(1) == 2L && r.getLong(2) == 3L)
    assert(!r.getBoolean(3))
  }

  test("progressive JPEG: SOF2 marker sets jpeg_progressive") {
    val r = meta(jpegSoi ++ jpegApp0 ++ jpegSof(0xC2) ++ jpegSos ++ jpegTail)
    assert(r.getString(0) == "jpeg")
    assert(r.getLong(1) == 2L && r.getLong(2) == 3L)
    assert(r.getBoolean(3))
  }

  test("EXIF-prefixed JPEG: APP1 segment is skipped by length, not magic") {
    val r = meta(jpegSoi ++ jpegApp1Exif ++ jpegApp0 ++ jpegSof(0xC0) ++
      jpegSos ++ jpegTail)
    assert(r.getString(0) == "jpeg")
    assert(r.getLong(1) == 2L && r.getLong(2) == 3L)
  }

  test("fill bytes and standalone markers before the SOF are stepped over") {
    // 0xFF fill padding then a TEM (standalone, no length field)
    val filled = jpegSoi ++ b(0xFF, 0xFF, 0xFF, 0x01) ++ jpegSof(0xC0) ++
      jpegSos ++ jpegTail
    val r = meta(filled)
    assert(r.getString(0) == "jpeg")
    assert(r.getLong(1) == 2L && r.getLong(2) == 3L)
  }

  test("DHT (0xC4) is NOT a start-of-frame marker") {
    // a DHT segment whose payload would fake h=1,w=1 if misread as SOF
    val dht = b(0xFF, 0xC4, 0x00, 0x08, 0x08, 0x00, 0x01, 0x00, 0x01, 0x00)
    val r = meta(jpegSoi ++ jpegApp0 ++ dht ++ jpegSof(0xC0) ++ jpegSos ++
      jpegTail)
    assert(r.getLong(1) == 2L && r.getLong(2) == 3L) // from the real SOF
  }

  test("truncated / desynced / SOS-first JPEGs keep fmt with null dims") {
    val truncated = jpegSoi ++ jpegApp0 ++ jpegSof(0xC0).take(7)
    val desync = jpegSoi ++ b(0x00, 0xC0, 0x00, 0x11) // no FF where a marker must be
    val sosFirst = jpegSoi ++ jpegSos ++ jpegTail // scan data before any SOF
    for (p <- Seq(truncated, desync, sosFirst)) {
      val r = meta(p)
      assert(r.getString(0) == "jpeg")
      assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
    }
  }

  test("withMediaMeta parses a hand-written BMP header") {
    val df = Seq(Tuple1(goldenBmp)).toDF("media")
    val r = Multimodal.withMediaMeta(df, $"media", "image/bmp")
      .select($"fmt", $"media_len", $"width", $"height").collect()(0)
    assert(r.getString(0) == "bmp")
    assert(r.getLong(1) == 54L)
    assert(r.getLong(2) == 2L)
    assert(r.getLong(3) == 3L)
  }

  test("withMediaMeta parses a hand-written WAV header") {
    val df = Seq(Tuple1(goldenWav)).toDF("media")
    val r = Multimodal.withMediaMeta(df, $"media", "audio/wav")
      .select($"fmt", $"sample_rate", $"n_channels", $"duration_ms")
      .collect()(0)
    assert(r.getString(0) == "wav")
    assert(r.getLong(1) == 44100L)
    assert(r.getLong(2) == 1L)
    assert(r.getLong(3) == 1000L) // 88200 bytes / 88200 B/s = 1.000 s
  }

  test("top-down BMP (negative signed height) reports the absolute dimension") {
    val topDown = goldenBmp.clone()
    // height = -3 little-endian at offset 22
    topDown(22) = 0xFD.toByte; topDown(23) = 0xFF.toByte
    topDown(24) = 0xFF.toByte; topDown(25) = 0xFF.toByte
    val r = Multimodal.withMediaMeta(
        Seq(Tuple1(topDown)).toDF("media"), $"media", "image/bmp")
      .select($"fmt", $"width", $"height").collect()(0)
    assert(r.getString(0) == "bmp")
    assert(r.getLong(1) == 2L && r.getLong(2) == 3L)
  }

  test("non-canonical WAV (no data chunk at 36) falls to opaque") {
    val listChunk = goldenWav.clone()
    // "LIST" instead of "data" at offset 36 — extensible/extra-chunk
    // layouts must not be parsed as canonical PCM
    listChunk(36) = 'L'.toByte; listChunk(37) = 'I'.toByte
    listChunk(38) = 'S'.toByte; listChunk(39) = 'T'.toByte
    val r = Multimodal.withMediaMeta(
        Seq(Tuple1(listChunk)).toDF("media"), $"media", "audio/wav")
      .select($"fmt", $"sample_rate", $"duration_ms").collect()(0)
    assert(r.getString(0) == "opaque")
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("builder → parser round-trip recovers BMP and WAV fields") {
    val df = Seq((1L, "pixelbytespixelbytes"), (2L, "abcdef"))
      .toDF("id", "payload")
    val bmp = Multimodal.withMediaMeta(
      df.select($"id", Multimodal.bmpPayload(
        $"id" + 10, $"id" * 3, encode($"payload", "UTF-8")).as("media")),
      $"media", "image/bmp")
      .select($"id", $"fmt", $"width", $"height", $"media_len")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(bmp == Seq((1L, "bmp", 11L, 3L, 74L), (2L, "bmp", 12L, 6L, 60L)))
    val wav = Multimodal.withMediaMeta(
      df.select($"id", Multimodal.wavPayload(
        lit(8000), lit(2), encode($"payload", "UTF-8")).as("media")),
      $"media", "audio/wav")
      .select($"id", $"fmt", $"sample_rate", $"n_channels", $"duration_ms")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // byte rate 8000*2*2 = 32000 B/s → 20 bytes = 0 ms, 6 bytes = 0 ms
    assert(wav == Seq((1L, "wav", 8000L, 2L, 0L), (2L, "wav", 8000L, 2L, 0L)))
  }

  test("builder → parser round-trip recovers PNG and JPEG fields") {
    val df = Seq((1L, "somepixeldata"), (2L, "x")).toDF("id", "payload")
    val png = Multimodal.withMediaMeta(
      df.select($"id", Multimodal.pngPayload(
        $"id" + 10, $"id" * 3, encode($"payload", "UTF-8")).as("media")),
      $"media", "image/png")
      .select($"id", $"fmt", $"width", $"height", $"media_len")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // media_len = 57 container-structure bytes + payload
    assert(png == Seq((1L, "png", 11L, 3L, 70L), (2L, "png", 12L, 6L, 58L)))
    val jpeg = Multimodal.withMediaMeta(
      df.select($"id", Multimodal.jpegPayload(
        $"id" + 10, $"id" * 3, $"id" % 2 === 0, ($"id" * 5).cast("int"),
        encode($"payload", "UTF-8")).as("media")),
      $"media", "image/jpeg")
      .select($"id", $"fmt", $"width", $"height", $"jpeg_progressive",
        $"media_len")
      .as[(Long, String, Long, Long, Boolean, Long)].collect()
      .sortBy(_._1).toSeq
    // media_len = 59 marker-chain bytes + comPad + payload
    assert(jpeg == Seq((1L, "jpeg", 11L, 3L, false, 77L),
      (2L, "jpeg", 12L, 6L, true, 70L)))
  }

  test("pngPayload writes real CRC-32 chunk trailers") {
    val bytes = Seq(Tuple1("data")).toDF("t")
      .select(Multimodal.pngPayload(lit(640L), lit(480L),
        encode($"t", "UTF-8")).as("media"))
      .as[Array[Byte]].head()
    // IHDR chunk: type+data at offsets 12..28, CRC trailer at 29..32
    val crc = new java.util.zip.CRC32
    crc.update(bytes, 12, 17)
    val stored = (16 to 19).map(i => (bytes(13 + i) & 0xFFL) << (8 * (19 - i))).sum
    assert(stored == crc.getValue)
  }

  test("withMediaMeta accepts a string media column (cast to UTF-8 bytes)") {
    val r = Multimodal.withMediaMeta(
        Seq("plain text").toDF("media"), $"media", "text/plain")
      .select($"fmt", $"media_len", $"content_id").collect()(0)
    assert(r.getString(0) == "opaque")
    assert(r.getLong(1) == 10L)
    assert(r.getString(2).length == 16)
  }

  test("unrecognized payloads fall back to opaque with null header fields") {
    val df = Seq("just some text", "BM but too short").toDF("t")
      .select(encode($"t", "UTF-8").as("media"))
    val rows = Multimodal.withMediaMeta(df, $"media", "text/plain")
      .select($"fmt", $"width", $"sample_rate", $"content_id").collect()
    rows.foreach { r =>
      assert(r.getString(0) == "opaque")
      assert(r.isNullAt(1) && r.isNullAt(2))
      assert(r.getString(3).length == 16)
    }
  }

  test("withFeatures: real histogram default; extractor is pluggable") {
    // "aab" = 0x61 0x61 0x62 — all high-nibble 6 → bin 6 holds all mass
    val df = Seq("aab", "a0").toDF("t")
      .select(encode($"t", "UTF-8").as("media"))
    val f = Multimodal.withFeatures(df, $"media", 16)
      .select($"features").as[Seq[Float]].collect().toSeq
    assert(f.forall(_.size == 16))
    assert(f(0)(6) == 1.0f && f(0).sum == 1.0f)
    // "a0" = 0x61 (bin 6) + 0x30 (bin 3) → half each
    assert(f(1)(3) == 0.5f && f(1)(6) == 0.5f)
    // a custom extractor (here: the former stub) slots in unchanged
    val custom = Multimodal.withFeatures(df, $"media", 3,
        Multimodal.fakeFeatures)
      .select($"features").as[Seq[Float]].collect().toSeq
    assert(custom.forall(v => v.size == 3 && v.forall(x => x >= -0.5f && x <= 0.5f)))
  }

  test("histogramFeatures skips the parsed header region") {
    // identical pixel payloads inside a BMP container and raw → same
    // histogram (the 54 header bytes don't pollute the feature)
    val df = Seq("zzzz").toDF("t").select(
      Multimodal.bmpPayload(lit(2L), lit(2L), encode($"t", "UTF-8")).as("bmp"),
      encode($"t", "UTF-8").as("raw"))
    val (b, r) = df.select(
        Multimodal.histogramFeatures($"bmp", 16).as("b"),
        Multimodal.histogramFeatures($"raw", 16).as("r"))
      .as[(Seq[Float], Seq[Float])].head()
    assert(b == r)
    assert(b(7) == 1.0f) // 'z' = 0x7A
  }

  test("frameOffsets: one offset per stride step") {
    val media = Seq("hello world", "x").toDF("t")
      .select($"t", encode($"t", "UTF-8").as("media"))
    val out = media.select(Multimodal.frameOffsets($"media", 4).as("o"))
      .orderBy(size($"o"))
      .as[Seq[Long]].collect().toSeq
    assert(out(0) == Seq(0L)) // 1-byte payload
    assert(out(1) == Seq(0L, 4L, 8L)) // 11 bytes, stride 4
  }

  // ---- media near-dup (r19 verdict #3) ----------------------------

  /** 1024-byte 64-cell grid payload: cell c is 16 bytes of 0xC0 when
    * bit c ∈ `bits` else 0x40 — so ByteGridFp reconstructs exactly
    * `bits` as long as both values occur (global mean strictly
    * between). */
  private def gridBytes(bits: Set[Int]): Array[Byte] =
    (0 until 64).flatMap(c =>
      Array.fill(16)(if (bits(c)) 0xC0.toByte else 0x40.toByte)).toArray

  private def fpOf(bits: Set[Int]): Long =
    bits.foldLeft(0L)((a, c) => a | (1L << c))

  test("graft_media_fp reconstructs the planted cell pattern exactly") {
    graft.plans.GraftExtensions.register(spark)
    val bits = Set(0, 3, 17, 22, 38, 45, 59, 63) // includes the sign bit
    val df = Seq(Tuple1(gridBytes(bits))).toDF("media")
    val fp = df.select(Multimodal.mediaFingerprint($"media").as("fp"))
      .head().getLong(0)
    assert(fp == fpOf(bits), s"fp=$fp expected=${fpOf(bits)}")
    // reference impl agrees (the codegen and interpreted paths share it)
    assert(graft.functions.ByteGridFp.fingerprint(gridBytes(bits), 0)
      == fpOf(bits))
    // header-aware: the same grid inside a BMP container fingerprints
    // identically (the 54 header bytes are skipped, not hashed)
    val wrapped = df.select(Multimodal.bmpPayload(lit(4L), lit(4L),
      $"media").as("media"))
    assert(wrapped.select(Multimodal.mediaFingerprint($"media"))
      .head().getLong(0) == fpOf(bits))
    // empty region → 0, null → null
    assert(graft.functions.ByteGridFp.fingerprint(Array.empty[Byte], 0) == 0L)
    assert(graft.functions.ByteGridFp.fingerprint(gridBytes(bits), 2048) == 0L)
    val n = Seq(Tuple1(null: Array[Byte])).toDF("media")
      .select(Multimodal.mediaFingerprint($"media")).head()
    assert(n.isNullAt(0))
  }

  test("mediaNearDup: pigeonhole recall at d<=3, verify rejects d=4") {
    graft.plans.GraftExtensions.register(spark)
    val base = Set(3, 17, 22, 38, 45, 59)
    val docs = Seq(
      0L -> base,                       // anchor
      1L -> (base ++ Set(5, 20, 40)),   // d=3, diffs span bands 0/1/2
      2L -> (base ++ Set(8, 9, 10, 11)) // d=4, ALL diffs inside band 0
    ).map { case (id, bits) => (id, gridBytes(bits)) }
      .toDF("doc_id", "media")
    val pairs = Multimodal.mediaNearDup(docs, $"doc_id", $"media")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    Caching.release()
    // (0,1) d=3: three bands touched, band 3 identical → pigeonhole
    // guarantees candidacy; verify keeps it at hamming 3
    // (0,2) d=4: bands 1/2/3 identical → CANDIDATE generated, but the
    // exact bit_count verify must reject it (threshold 3)
    // (1,2) d=7: rejected
    assert(pairs == Set((0L, 1L, 3L)), pairs)
  }

  test("mediaNearDup recall boundary: maxHamming >= bands is refused, and why") {
    graft.plans.GraftExtensions.register(spark)
    // the shape the require exists for: a d=4 pair with ONE differing
    // bit per band shares NO band key — banding at 4 bands would
    // silently lose it if d=4 were allowed
    val base = Set(3, 17, 22, 38, 45, 59)
    val spread = base ++ Set(2, 18, 34, 50) // one flip in each band
    val fa = fpOf(base); val fb = fpOf(spread)
    assert(java.lang.Long.bitCount(fa ^ fb) == 4)
    (0 until 4).foreach { b =>
      assert(((fa >>> (16 * b)) & 0xFFFF) != ((fb >>> (16 * b)) & 0xFFFF),
        s"band $b unexpectedly shared — the boundary fixture is broken")
    }
    val docs = Seq(0L -> gridBytes(base), 1L -> gridBytes(spread))
      .toDF("doc_id", "media")
    // at the supported threshold the pair is (correctly) out of scope
    val got = Multimodal.mediaNearDup(docs, $"doc_id", $"media").count()
    Caching.release()
    assert(got == 0L)
    // and the misuse that WOULD lose it is loud, not silent
    val e = intercept[IllegalArgumentException] {
      Multimodal.mediaNearDup(docs, $"doc_id", $"media", maxHamming = 4)
    }
    assert(e.getMessage.contains("loses pairs"))
    // exact duplicates (d=0) are found at any legal threshold
    val dup = Seq(0L -> gridBytes(base), 1L -> gridBytes(base))
      .toDF("doc_id", "media")
    val d0 = Multimodal.mediaNearDup(dup, $"doc_id", $"media",
        maxHamming = 0).collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2))).toSet
    Caching.release()
    assert(d0 == Set((0L, 1L, 0L)))
  }

  // ---- r21 optimization pins -------------------------------------

  test("q195 synthesis: family-factored form is byte-identical to the per-row form") {
    // the r21 rewrite moved the 64 md5 calls from per-ROW to per-FAMILY
    // (queries.DocumentQueries.q195Media); this pin rebuilds the
    // ORIGINAL per-row expression and asserts payload equality over
    // doc_ids covering every family (0..199), members m = 0..33 (incl.
    // the (m-1) % 31 flip wraparound at m = 32) — any drift in the md5
    // bit, flip splice, 16-byte expansion or header wrap fails here
    val docs = spark.range(0L, 6800L).select($"id".as("doc_id"))
    val fam = ($"doc_id" % 200).cast("long")
    val m = expr("doc_id DIV 200")
    val fc = (m - 1) % 31 * 2
    val cellHexes = (0 until 64).map { c =>
      val md5bit = conv(substring(md5(concat(lit("fam_"),
        fam.cast("string"), lit("_"), lit(c.toString))), 1, 1),
        16, 10).cast("long") % 2 === 1
      val flipped = m >= 1 && (fc === c || fc + 1 === c)
      call_function("repeat",
        when(md5bit =!= flipped, lit("C0")).otherwise(lit("40")), lit(16))
    }
    val oldMedia = Multimodal.bmpPayload(lit(16L), lit(16L),
      unhex(concat(cellHexes: _*)))
    val oldDf = docs.select($"doc_id", md5(oldMedia).as("old_h"))
    val newDf = graft.queries.DocumentQueries.q195Media(docs)
      .select($"doc_id", md5($"media").as("new_h"))
    val joined = oldDf.join(newDf, "doc_id")
    assert(joined.count() == 6800L) // every doc synthesized in both forms
    val drift = joined.filter($"old_h" =!= $"new_h").count()
    assert(drift == 0L, s"$drift docs drifted between synthesis forms")
  }

  test("ByteGridFp.gtExact: exact past the long-overflow boundary") {
    import graft.functions.ByteGridFp.gtExact
    // overflow regime: n = 2e9 payload bytes (inside the 2^31 array
    // cap), one all-0xFF cell — cellSum·n = 7.97e9 · 2e9 ≈ 1.59e19
    // wraps a signed long NEGATIVE, so the old naive compare would
    // clear a bit that belongs set
    val n = 2000000000L
    val cellSum = 255L * (n / 64) // all-0xFF cell
    val total = cellSum + 63L * 64L * (n / 64) // rest mid-gray 0x40
    assert(cellSum * n < 0L, "fixture must actually overflow a long")
    assert(gtExact(cellSum, n, total, n / 64)) // bright cell above mean
    assert(!gtExact(64L * (n / 64), n, total, n / 64)) // dim cell below
    // parity with BigInt on a deterministic sweep incl. mixed regimes
    val vals = Seq(0L, 1L, 255L, 1L << 31, (1L << 62) + 12345L,
      Long.MaxValue / 255, 600000000L, 255L * 600000000L)
    for (a <- vals; b <- vals; c <- vals; d <- vals)
      assert(gtExact(a, b, c, d) ==
        (BigInt(a) * BigInt(b) > BigInt(c) * BigInt(d)),
        s"gtExact($a,$b,$c,$d) disagrees with BigInt")
  }
}
