package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column support (builder brief): image/audio/video as
  * opaque `binary` columns with typed metadata, plus
  * decode / feature-extract / frame-sample stages.
  *
  * Header DECODE is real for the container formats whose dimension /
  * rate fields are plain public byte layouts — BMP (width/height from
  * the BITMAPINFOHEADER), canonical PCM WAV (sample rate / channel
  * count / duration from the fmt+data chunks), PNG (width/height from
  * the spec-pinned IHDR chunk) and JPEG (width/height/progressive from
  * the first SOFn frame header, found by walking the ITU-T T.81 marker
  * chain). BMP/WAV/PNG fields sit at fixed offsets and are parsed as
  * codegen'd expressions over a hex dump of a bounded 64-byte header
  * slice; JPEG needs the native marker scan
  * [[graft.functions.JpegSofDims]] because APP/EXIF/COM segments before
  * the SOF have arbitrary length — that scan is per-row
  * O(#marker segments) with early exit at the first SOF (and it stops
  * at SOS, where entropy-coded data starts, so the payload body is
  * never walked; the worst case — a payload that is ALL marker
  * segments, e.g. fill-byte padding after SOI — is O(payload)). No UDF,
  * no shuffle, no driver involvement anywhere. Full ENTROPY decode
  * (JPEG DCT, MP3 frames, video) needs codec libraries this container
  * does not ship; for those the FEATURE-extraction stage below stays a
  * clearly-marked deterministic STUB behind a pluggable
  * `binary → array<float>` slot, so a real embedding/decoder UDF drops
  * in without touching any plumbing.
  *
  * Scale design: per-row map work only; binary payloads stay columnar
  * in parquet and are never collected. Feature vectors are
  * `array<float>` compatible with the similarity-search operators in
  * [[TextOps]] / `DocumentQueries`.
  */
object Multimodal {

  /** Bytes of header hexed for parsing — covers the 54-byte BMP header
    * and the 44-byte canonical WAV header. */
  private val HeaderBytes = 64

  /** Little-endian unsigned integer of `n` bytes at 0-based byte offset
    * `off` within the hex dump `h` (two hex chars per byte, uppercase —
    * identical in Spark and DuckDB). */
  private def leUint(h: Column, off: Int, n: Int): Column =
    conv(concat(((n - 1) to 0 by -1).map(k =>
      substring(h, 2 * (off + k) + 1, 2)): _*), 16, 10).cast("long")

  /** Hex chars for byte range [off, off+n) of the header dump. */
  private def hexAt(h: Column, off: Int, n: Int): Column =
    substring(h, 2 * off + 1, 2 * n)

  /** Little-endian hex encoding of numeric column `v` in `n` bytes —
    * the writer-side inverse of [[leUint]] (used by the payload
    * builders below and by tests that synthesize fixtures). */
  def leHex(v: Column, n: Int): Column = {
    val h = lpad(hex(fitsIn(v, n, "leHex")), 2 * n, "0")
    concat(((n - 1) to 0 by -1).map(k => substring(h, 2 * k + 1, 2)): _*)
  }

  /** `v` as a long, or `raise_error` if it does not fit in `n` bytes
    * unsigned. `lpad` silently TRUNCATES a too-long hex string, which
    * would turn an out-of-range field (width >= 2^32, JPEG dims or
    * COM length >= 2^16) into a structurally corrupt container — fail
    * loudly instead. */
  private def fitsIn(v: Column, n: Int, who: String): Column = {
    val lv = v.cast("long")
    if (n >= 8) lv
    else when(lv < 0 || lv >= (1L << (8 * n)),
      raise_error(concat(lit(s"$who: value "), lv.cast("string"),
        lit(s" does not fit in $n byte(s)")))).otherwise(lv)
  }

  /** Typed metadata for an opaque media payload. Detects the container
    * format from its magic bytes and parses the REAL header fields:
    *
    *   - `fmt`: "bmp" | "wav" | "png" | "jpeg" | "opaque"
    *   - BMP (magic "BM", ≥ 54 bytes): `width`, `height` from the
    *     BITMAPINFOHEADER int32s at byte offsets 18 / 22 (little-endian;
    *     height is signed — top-down bitmaps store it negative — and is
    *     reported as the absolute pixel dimension)
    *   - canonical PCM WAV ("RIFF"+"WAVE"+"fmt "+"data" magics, ≥ 44
    *     bytes, fmt chunk at offset 12, data chunk at 36; extensible /
    *     extra-chunk layouts fall to opaque): `sample_rate` (offset 24),
    *     `n_channels` (offset 22), `duration_ms` = floor(data_size *
    *     1000 / byte_rate) from offsets 40 / 28
    *   - PNG (8-byte signature + IHDR as first chunk, ≥ 33 bytes):
    *     `width`, `height` from the IHDR big-endian uint32s at byte
    *     offsets 16 / 20 (the PNG spec pins IHDR first, so the offsets
    *     are fixed)
    *   - JPEG (SOI magic): `width`, `height` and `jpeg_progressive`
    *     (SOF2 frame) from the first SOFn segment found by the native
    *     marker scan [[graft.functions.JpegSofDims]]; a JPEG-by-magic
    *     payload whose scan fails (truncated, marker desync, SOS before
    *     any SOF) keeps fmt "jpeg" with null dimensions
    *   - non-matching fields are null; every payload gets `mime`,
    *     `media_len` (bytes) and a 64-bit `content_id` (md5 prefix).
    *
    * All pure codegen'd expressions — fixed-offset fields over a
    * 64-byte header slice, plus the early-exit JPEG marker scan. */
  /** BMP detection over the hex header dump (magic "BM", full
    * BITMAPINFOHEADER present) — the ONE detector shared by header
    * parsing and feature extraction, so they can never disagree about
    * a payload's format. */
  private def isBmpHdr(h: Column, len: Column): Column =
    hexAt(h, 0, 2) === "424D" && len >= 54 // "BM"

  /** Canonical PCM WAV layout only: fmt chunk at 12 AND data chunk at
    * 36 — without the "data" magic check, WAVE_FORMAT_EXTENSIBLE / LIST
    * files (and every other RIFF container: WebP, AVI) would pass and
    * offset 40/44 would land inside the wrong chunk; non-canonical
    * files fall to opaque instead. */
  private def isWavHdr(h: Column, len: Column): Column =
    hexAt(h, 0, 4) === "52494646" && // "RIFF"
      hexAt(h, 8, 4) === "57415645" && // "WAVE"
      hexAt(h, 12, 4) === "666D7420" && // "fmt "
      hexAt(h, 36, 4) === "64617461" && len >= 44 // "data"

  /** Big-endian unsigned integer of `n` bytes at byte offset `off` —
    * the network-order twin of [[leUint]] (PNG fields are BE). */
  private def beUint(h: Column, off: Int, n: Int): Column =
    conv(hexAt(h, off, n), 16, 10).cast("long")

  /** PNG: 8-byte signature and the mandatory FIRST chunk being IHDR
    * (13-byte payload at a FIXED offset — the PNG spec pins it), so
    * width/height live at bytes 16/20 big-endian; anything shorter
    * than signature+IHDR (33 bytes) falls to opaque. */
  private def isPngHdr(h: Column, len: Column): Column =
    hexAt(h, 0, 8) === "89504E470D0A1A0A" &&
      hexAt(h, 12, 4) === "49484452" && len >= 33 // "IHDR"

  /** JPEG: SOI magic only — frame dimensions need the marker-segment
    * scan ([[graft.functions.JpegSofDims]]) because APP/EXIF/COM
    * segments before the SOF have arbitrary length. A JPEG whose scan
    * fails (truncated, desynced) keeps fmt "jpeg" with null dims: the
    * payload IS a JPEG by magic, it is just not parseable. */
  private def isJpegHdr(h: Column, len: Column): Column =
    hexAt(h, 0, 2) === "FFD8" && len >= 4

  /** `media` may be any binary-castable column (string columns are
    * read as their UTF-8 bytes — the cast below pins that contract;
    * `graft_jpeg_sof` itself accepts only BinaryType). */
  def withMediaMeta(df: DataFrame, mediaIn: Column, mime: String): DataFrame = {
    // the JPEG scan is a native expression — make sure it resolves even
    // when the caller built the session without graft extensions
    graft.plans.GraftExtensions.register(df.sparkSession)
    val media = mediaIn.cast("binary")
    val h = hex(substring(media, 1, HeaderBytes))
    val len = length(media).cast("long")
    val isBmp = isBmpHdr(h, len)
    val isWav = isWavHdr(h, len)
    val isPng = isPngHdr(h, len)
    val isJpeg = isJpegHdr(h, len)
    val sof = call_function("graft_jpeg_sof", media)
    val byteRate = leUint(h, 28, 4)
    val dataSize = leUint(h, 40, 4)
    // BITMAPINFOHEADER height is SIGNED int32 (negative = top-down row
    // order); the pixel dimension is its absolute value
    val rawHeight = leUint(h, 22, 4)
    val signedHeight =
      when(rawHeight >= 2147483648L, rawHeight - 4294967296L)
        .otherwise(rawHeight)
    df.withColumn("mime", lit(mime))
      .withColumn("media_len", len)
      .withColumn("fmt",
        when(isBmp, "bmp").when(isWav, "wav")
          .when(isPng, "png").when(isJpeg, "jpeg").otherwise("opaque"))
      .withColumn("width",
        when(isBmp, leUint(h, 18, 4))
          .when(isPng, beUint(h, 16, 4))
          .when(isJpeg, element_at(sof, 3)))
      .withColumn("height",
        when(isBmp, abs(signedHeight))
          .when(isPng, beUint(h, 20, 4))
          .when(isJpeg, element_at(sof, 2)))
      .withColumn("sample_rate", when(isWav, leUint(h, 24, 4)))
      .withColumn("n_channels", when(isWav, leUint(h, 22, 2)))
      .withColumn("duration_ms",
        when(isWav && byteRate > 0,
          floor(dataSize * lit(1000.0) / byteRate).cast("long")))
      // SOF2 (0xC2) is the progressive-DCT frame; null for non-JPEGs
      // and for JPEGs whose scan found no frame header
      .withColumn("jpeg_progressive",
        when(isJpeg, element_at(sof, 1) === 194L))
      .withColumn("content_id", substring(md5(media), 1, 16))
  }

  /** A feature extractor maps an opaque payload column to a fixed-dim
    * `array<float>` vector. [[histogramFeatures]] (real, content-based)
    * is the default; [[fakeFeatures]] remains the embedding stand-in. */
  type FeatureExtractor = (Column, Int) => Column

  /** Attach a feature vector column. The default extractor is the REAL
    * byte-histogram below (computed from the decoded payload bytes); a
    * production pipeline passes a richer decoder (Pandas-UDF embedding,
    * JNI codec) with the same signature — nothing else changes. */
  def withFeatures(df: DataFrame, media: Column, dim: Int,
                   extractor: FeatureExtractor = histogramFeatures): DataFrame =
    df.withColumn("features", extractor(media, dim))

  /** REAL content features for codec-free media: the normalized 16-bin
    * high-nibble byte histogram of the PAYLOAD region (the intensity-
    * histogram baseline of image retrieval), skipping the parsed header
    * — 54 bytes for BMP, 44 for canonical WAV, 0 for opaque blobs. The
    * per-byte loop is the native codegen'd `graft_byte_hist` expression
    * ([[graft.functions.ByteHistogram]]); requires
    * [[graft.plans.GraftExtensions.register]] on the session. `dim` <=
    * 16 slices the leading bins (16 is the natural size). */
  def histogramFeatures(media: Column, dim: Int): Column = {
    require(dim > 0 && dim <= 16, s"histogram dim $dim not in 1..16")
    val hist = call_function("graft_byte_hist", media, payloadOffset(media))
    val total = greatest(aggregate(hist, lit(0L), (a, x) => a + x), lit(1L))
    slice(transform(hist, c => (c.cast("double") / total).cast("float")), 1, dim)
  }

  /** Byte offset where the payload region starts — the SAME detectors
    * as withMediaMeta (a bare magic-prefix check would skip 44 bytes of
    * any RIFF container — WebP, AVI, extensible WAV — that the header
    * parser itself classifies as opaque). Shared by
    * [[histogramFeatures]] and [[mediaFingerprint]]. */
  private def payloadOffset(media: Column): Column = {
    val h = hex(substring(media, 1, HeaderBytes))
    val len = length(media).cast("long")
    when(isBmpHdr(h, len), lit(54))
      .when(isWavHdr(h, len), lit(44))
      .otherwise(lit(0)).cast("int")
  }

  /** 64-bit perceptual fingerprint of a media payload: the native
    * byte-grid expression [[graft.functions.ByteGridFp]] over the
    * decoded payload region (header-aware via [[payloadOffset]]) —
    * bit c = cell c's mean byte exceeds the payload's global mean,
    * compared as exact cross-multiplied integers. The DCT-free
    * pHash stand-in: localized byte edits flip few bits, so Hamming
    * distance tracks payload similarity. Requires
    * [[graft.plans.GraftExtensions.register]]. */
  def mediaFingerprint(media: Column): Column =
    call_function("graft_media_fp", media, payloadOffset(media))

  /** Banded-Hamming media near-dup (r19 verdict #3): all id pairs
    * whose [[mediaFingerprint]]s differ in at most `maxHamming` bits,
    * found WITHOUT an all-pairs join.
    *
    * Shape: one map pass computes fingerprints (persisted — the
    * [[graft.Caching]] contract, caller releases); each doc explodes
    * into `bands` (band_idx, band_key) rows (the [[TextOps]] LSH
    * banding pattern applied to 64/bands-bit fingerprint slices); an
    * equality self-join per (band_idx, band_key) emits candidates
    * bucket-locally; each candidate pays its O(1) `bit_count(xor)`
    * verify BEFORE the dedup (the q25/q68 documented ordering — most
    * band collisions are far pairs, so the verify runs bucket-locally
    * in the join stage and the distinct's exchange carries only the
    * tiny surviving (a_id, b_id, hamming) rows, fingerprints dropped).
    * Neither side is broadcast-forced — pair volume is quadratic in
    * duplicate-cluster size, so a dup-heavy corpus must be able to
    * degrade to a shuffle join (the q169 lesson).
    *
    * Recall is LOSSLESS, not probabilistic: `maxHamming < bands` is
    * required, so a qualifying pair's differing bits (≤ maxHamming)
    * touch at most maxHamming < bands of the fingerprint's bands,
    * leaving at least one band bit-identical — pigeonhole, every
    * qualifying pair surfaces as a candidate. At maxHamming >= bands a
    * pair with one differing bit per band shares NO band and would be
    * silently lost — the require makes that misuse loud
    * (MultimodalSpec red-tests the exact boundary shape).
    *
    * Output: (a_id, b_id, hamming), a_id < b_id.
    */
  def mediaNearDup(df: DataFrame, id: Column, media: Column,
                   maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(bands >= 2 && 64 % bands == 0,
      s"bands=$bands must be >= 2 and divide 64")
    require(maxHamming >= 0 && maxHamming < bands,
      s"maxHamming=$maxHamming >= bands=$bands loses pairs whose diff " +
        "bits spread one-per-band: raise bands so maxHamming < bands")
    val bits = 64 / bands
    val mask = (1L << bits) - 1
    val fps = graft.Caching.persisted(
      df.select(id.cast("long").as("doc_id"),
        mediaFingerprint(media).as("fp")))
    val banded = fps.select(col("doc_id"), col("fp"),
      explode(array((0 until bands).map(b => struct(lit(b).as("bi"),
        call_function("shiftright", col("fp"), lit(b * bits))
          .bitwiseAND(lit(mask)).as("bk"))): _*)).as("band"))
      .select(col("doc_id"), col("fp"),
        col("band.bi").as("bi"), col("band.bk").as("bk"))
    banded.select(col("doc_id").as("a_id"), col("fp").as("a_fp"),
        col("bi"), col("bk"))
      .join(banded.select(col("doc_id").as("b_id"), col("fp").as("b_fp"),
        col("bi"), col("bk")), Seq("bi", "bk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("hamming",
        bit_count(col("a_fp").bitwiseXOR(col("b_fp"))).cast("long"))
      // verify BEFORE the dedup (r20 verdict finding #1): the filter
      // runs in the join stage, so only qualifying pairs reach the
      // distinct's exchange — and the distinct key needs no
      // fingerprints once hamming is computed
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .distinct()
  }

  /** STUB decode → fixed-dim feature vector. Deterministic fake:
    * feature i = (md5(hex(payload) ++ "_" ++ i) first 4 hex digits)
    * / 65535 - 0.5. Signature and batch shape match a real embedding
    * UDF (`binary → array<float>`); only the body is fake. */
  def fakeFeatures(media: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (conv(substring(md5(concat(hex(media), lit("_"), i.cast("string"))), 1, 4),
        16, 10).cast("double") / 65535.0 - 0.5).cast("float"))

  /** STUB frame sampling: every `stride`-th byte offset stands in for a
    * frame timestamp; a real implementation emits one row per decoded
    * frame with the same (media row → many frame rows) generator shape. */
  def frameOffsets(media: Column, stride: Int): Column =
    sequence(lit(0L), greatest(length(media).cast("long") - 1, lit(0L)),
      lit(stride.toLong))

  // -------------------------------------------------------------------
  // Writer-side payload builders (fixture synthesis + round-trip tests):
  // canonical headers assembled as hex and `unhex`ed back to binary.
  // -------------------------------------------------------------------

  /** A minimal canonical BMP file: 14-byte file header + 40-byte
    * BITMAPINFOHEADER (24 bpp, no compression) + `pixelData` appended
    * raw. The parser above recovers `width`/`height` exactly. */
  def bmpPayload(width: Column, height: Column, pixelData: Column): Column = {
    val dataLen = length(pixelData).cast("long")
    unhex(concat(
      lit("424D"), leHex(dataLen + 54, 4), lit("00000000"), leHex(lit(54), 4),
      leHex(lit(40), 4), leHex(width, 4), leHex(height, 4),
      leHex(lit(1), 2), leHex(lit(24), 2), lit("00" * 24),
      hex(pixelData)))
  }

  /** Big-endian hex encoding of numeric column `v` in `n` bytes — the
    * network-order twin of [[leHex]] (PNG/JPEG fields are BE). */
  def beHex(v: Column, n: Int): Column =
    lpad(hex(fitsIn(v, n, "beHex")), 2 * n, "0")

  /** CRC-32 chunk trailer: PNG uses the standard ISO-3309 CRC-32 over
    * chunk type + chunk data — exactly Spark's `crc32` — so builder
    * output is structurally valid PNG, not just magic-compatible. */
  private def pngChunk(chunkType: String, dataHex: Column): Column = {
    val body = concat(lit(chunkType), dataHex)
    concat(beHex(length(dataHex) / 2, 4), body, beHex(crc32(unhex(body)), 4))
  }

  /** A structurally valid PNG file: signature, IHDR (8-bit truecolor,
    * no interlace) with real CRC-32 trailers, one IDAT-shaped chunk
    * wrapping `data` raw (NOT zlib-compressed — the scanline stream is
    * fake, the container structure is real), IEND. The parser above
    * recovers `width`/`height` exactly. Total size = 57 + len(data). */
  def pngPayload(width: Column, height: Column, data: Column): Column =
    unhex(concat(
      lit("89504E470D0A1A0A"),
      pngChunk("49484452", concat(beHex(width, 4), beHex(height, 4),
        lit("0802000000"))), // bit depth 8, color 2 (RGB), no interlace
      pngChunk("49444154", hex(data)),
      pngChunk("49454E44", lit(""))))

  /** A JPEG interchange stream with a real marker chain: SOI, APP0/JFIF
    * (fixed 16-byte segment), a COM segment carrying `comPad` filler
    * bytes (it moves the SOF to a per-row VARIABLE offset, so a parser
    * that assumed fixed offsets — instead of walking the chain — cannot
    * pass), SOF0 (or SOF2 when `progressive`) declaring a 3-component
    * `width`×`height` frame, SOS, `data` raw as stand-in entropy bytes,
    * EOI. The parser above recovers `width`/`height`/`jpeg_progressive`
    * exactly (it stops at SOS, so the fake entropy stream is never
    * walked). Total size = 59 + comPad + len(data); dimensions must fit
    * the SOF's 2-byte fields (< 65536). */
  def jpegPayload(width: Column, height: Column, progressive: Column,
                  comPad: Column, data: Column): Column = {
    val sof = when(progressive, "FFC2").otherwise(lit("FFC0"))
    unhex(concat(
      lit("FFD8"), // SOI
      lit("FFE000104A46494600010100004800480000"), // APP0: JFIF 1.1
      lit("FFFE"), beHex(comPad + 2, 2), // COM, length includes itself
      call_function("repeat", lit("20"), comPad.cast("int")),
      sof, lit("001108"), // SOF len 17, precision 8
      beHex(height, 2), beHex(width, 2),
      lit("03012200021101031101"), // 3 components
      lit("FFDA000C03010002110311003F00"), // SOS
      hex(data), lit("FFD9"))) // EOI
  }

  /** A canonical 44-byte-header PCM WAV file (16-bit samples) around
    * raw `samples` bytes. The parser above recovers `sample_rate`,
    * `n_channels` and `duration_ms` exactly. */
  def wavPayload(sampleRate: Column, nChannels: Column,
                 samples: Column): Column = {
    val dataLen = length(samples).cast("long")
    val blockAlign = nChannels * 2
    val byteRate = sampleRate * blockAlign
    unhex(concat(
      lit("52494646"), leHex(dataLen + 36, 4), lit("57415645"),
      lit("666D7420"), leHex(lit(16), 4), leHex(lit(1), 2),
      leHex(nChannels, 2), leHex(sampleRate, 4), leHex(byteRate, 4),
      leHex(blockAlign, 2), leHex(lit(16), 2),
      lit("64617461"), leHex(dataLen, 4), hex(samples)))
  }
}
