package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / resize / frame-sample are batch transforms over
  * those columns.
  *
  * The *decode* step is STUBBED (this container ships no image/audio
  * codecs): `decodeImageStub` derives deterministic fake dimensions and
  * features from the payload's md5 — clearly marked, swappable for a real
  * codec behind the same column signature. Everything around the stub —
  * schema, partitioning, batch shape, column pruning — is real Spark.
  *
  * == 100 TB design ==
  *
  * Binary payloads dominate row size, so the transforms are map-only
  * (no shuffle touches the payload), metadata is a separate small struct
  * column so metadata-only queries prune the payload entirely from the
  * parquet scan, and `maxRecordsPerFile`/`maxPartitionBytes` sizing is
  * the knob for payload-heavy files (see Scaladoc on `sizedForPayloads`).
  */
object MultimodalOps {

  /** Metadata struct carried beside every payload: media kind, byte
    * length, md5 content address — the columns every downstream filter
    * uses without touching bytes.
    */
  def mediaMeta(payload: Column, kind: String): Column =
    struct(
      lit(kind).as("kind"),
      length(payload).as("n_bytes"),
      md5(payload).as("content_md5"))

  /** Attach a payload + metadata pair from a binary column. */
  def withMedia(df: DataFrame, binCol: String, kind: String): DataFrame =
    df.withColumn("media_meta", mediaMeta(col(binCol), kind))

  /** STUB decode — deterministic fake image header derived from the
    * payload hash: `{width, height, channels}`. Replace with a real
    * codec UDF (same signature) when codecs are available; marked
    * explicitly per the build brief.
    */
  def decodeImageStub(payload: Column): Column = {
    val h = md5(payload)
    struct(
      (conv(substring(h, 1, 4), 16, 10).cast("int") % 1920 + 64).as("width"),
      (conv(substring(h, 5, 4), 16, 10).cast("int") % 1080 + 64).as("height"),
      lit(3).as("channels"))
  }

  /** STUB feature extraction: a deterministic `dim`-float vector from
    * md5 chunks of the payload — the column/batch shape of a real
    * embedding model output (swap in an ONNX/codec UDF later).
    */
  def extractFeaturesStub(payload: Column, dim: Int = 8): Column =
    transform(sequence(lit(0), lit(dim - 1)), d =>
      (conv(substring(md5(concat(payload, d.cast("string").cast("binary"))), 1, 6), 16, 10)
        .cast("double") / 8388607.5 - 1.0).cast("float"))

  /** Resize transform (stub: rescales the decoded header proportionally
    * to fit `maxSide`; the real version maps pixels). Payload untouched.
    */
  def resizeStub(decoded: Column, maxSide: Int): Column = {
    val w = decoded.getField("width")
    val h = decoded.getField("height")
    val s = least(lit(maxSide.toDouble) / greatest(w, h), lit(1.0))
    struct(
      (w * s).cast("int").as("width"),
      (h * s).cast("int").as("height"),
      decoded.getField("channels").as("channels"))
  }

  /** Frame sampling for video payloads: `n` byte-range slices at evenly
    * spaced offsets (a real demuxer would seek keyframes; the slicing,
    * schema, and fan-out are the real plumbing).
    */
  def sampleFrames(payload: Column, n: Int, frameBytes: Int = 256): Column = {
    val stride = greatest((length(payload) - frameBytes) / math.max(n - 1, 1), lit(0))
    transform(sequence(lit(0), lit(n - 1)), i =>
      struct(
        i.as("frame_no"),
        (i * stride + 1).as("offset"), // 1-based
        payload.substr((i * stride + 1).cast("int"), lit(frameBytes)).as("bytes")))
  }

  // ---- real container-format headers (no codec needed: the dimension
  // fields of PNG/GIF/BMP live at fixed offsets in the first bytes) ----

  private def be32hex(v: Column): Column = lpad(hex(v), 8, "0")
  private def le16hex(v: Column): Column =
    concat(lpad(hex(pmod(v, lit(256))), 2, "0"),
      lpad(hex(pmod(floor(v / 256).cast("long"), lit(256))), 2, "0"))
  private def le32hex(v: Column): Column =
    concat(
      lpad(hex(pmod(v, lit(256))), 2, "0"),
      lpad(hex(pmod(floor(v / 256).cast("long"), lit(256))), 2, "0"),
      lpad(hex(pmod(floor(v / 65536).cast("long"), lit(256))), 2, "0"),
      lpad(hex(pmod(floor(v / 16777216).cast("long"), lit(256))), 2, "0"))

  /** A syntactically REAL PNG header for the given dimensions: 8-byte
    * signature + IHDR chunk (length, tag, width/height as big-endian
    * u32, bit-depth/color-type byte tail). Any PNG-aware tool reads the
    * dimensions back from these bytes.
    */
  def encodePngHeader(w: Column, h: Column): Column =
    to_binary(concat(lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
      be32hex(w), be32hex(h), lit("0806000000")), lit("hex"))

  /** A real GIF89a header: magic + logical-screen width/height as
    * little-endian u16.
    */
  def encodeGifHeader(w: Column, h: Column): Column =
    to_binary(concat(lit("474946383961"), le16hex(w), le16hex(h), lit("F70000")),
      lit("hex"))

  /** A real BMP header: "BM" file header + BITMAPINFOHEADER with
    * width/height as little-endian i32 at offsets 18/22.
    */
  def encodeBmpHeader(w: Column, h: Column): Column =
    to_binary(concat(lit("424D" + "00000000" + "00000000" + "36000000" + "28000000"),
      le32hex(w), le32hex(h)), lit("hex"))

  private def be32(p: Column, off: Int): Column =
    conv(hex(substring(p, off, 4)), 16, 10).cast("int")
  private def byteAt(p: Column, off: Int): Column =
    conv(hex(substring(p, off, 1)), 16, 10).cast("int")
  private def le16(p: Column, off: Int): Column =
    byteAt(p, off) + byteAt(p, off + 1) * 256
  private def le32(p: Column, off: Int): Column =
    byteAt(p, off) + byteAt(p, off + 1) * 256 +
      byteAt(p, off + 2) * 65536 + byteAt(p, off + 3) * 16777216

  /** REAL image-header parser (not a stub): sniffs the payload's magic
    * bytes and decodes `{format, width, height}` from the actual
    * container layout — PNG (IHDR big-endian u32 at offset 17/21, 1-based),
    * GIF (LE u16 at 7/9), BMP (LE i32 at 19/23). Unknown magic → nulls.
    * Pure codegen'd column arithmetic over the first ~30 bytes: map-only,
    * payload never shuffles, and with parquet column pruning a
    * dimensions-only query reads just the payload column's first pages.
    */
  def imageDims(payload: Column): Column =
    when(hex(substring(payload, 1, 8)) === "89504E470D0A1A0A",
      struct(lit("png").as("format"),
        be32(payload, 17).as("width"), be32(payload, 21).as("height")))
      .when(hex(substring(payload, 1, 4)) === "47494638",
        struct(lit("gif").as("format"),
          le16(payload, 7).as("width"), le16(payload, 9).as("height")))
      .when(hex(substring(payload, 1, 2)) === "424D",
        struct(lit("bmp").as("format"),
          le32(payload, 19).as("width"), le32(payload, 23).as("height")))
      .otherwise(struct(lit("unknown").as("format"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height")))

  private def le24hex(v: Column): Column =
    concat(
      lpad(hex(pmod(v, lit(256))), 2, "0"),
      lpad(hex(pmod(floor(v / 256).cast("long"), lit(256))), 2, "0"),
      lpad(hex(pmod(floor(v / 65536).cast("long"), lit(256))), 2, "0"))
  private def le24(p: Column, off: Int): Column =
    byteAt(p, off) + byteAt(p, off + 1) * 256 + byteAt(p, off + 2) * 65536

  /** A syntactically REAL WebP header in any of the container's three
    * variants — the dimension encodings genuinely differ per variant,
    * which is what makes WebP a real parser exercise:
    *  - `lossy` (VP8): 3-byte frame tag, the 9D 01 2A sync code, then
    *    width/height as LE u16 whose top 2 bits are scale factors
    *    (dims are the low 14 bits);
    *  - `lossless` (VP8L): the 2F signature byte, then width-1 and
    *    height-1 as adjacent 14-bit fields of one LE u32;
    *  - `extended` (VP8X): flag byte + 3 reserved, then canvas
    *    width-1 / height-1 as LE u24.
    * Dims must be in [1, 16384] (14-bit fields). RIFF sizes are exact,
    * so any RIFF walker accepts the bytes.
    */
  def encodeWebpHeader(w: Column, h: Column, variant: Column): Column = {
    val lossy = concat(lit("52494646"), le32hex(lit(22)), lit("57454250"),
      lit("56503820"), le32hex(lit(10)),
      lit("000000" + "9D012A"), le16hex(w), le16hex(h))
    val lossless = concat(lit("52494646"), le32hex(lit(17)), lit("57454250"),
      lit("5650384C"), le32hex(lit(5)), lit("2F"),
      le32hex((w - 1) + (h - 1) * 16384))
    val extended = concat(lit("52494646"), le32hex(lit(22)), lit("57454250"),
      lit("56503858"), le32hex(lit(10)), lit("00" + "000000"),
      le24hex(w - 1), le24hex(h - 1))
    to_binary(
      when(variant === "lossless", lossless)
        .when(variant === "extended", extended)
        .otherwise(lossy), lit("hex"))
  }

  /** REAL WebP parser: validates RIFF + WEBP magic, dispatches on the
    * first chunk's fourcc, and decodes each variant's own dimension
    * layout — VP8 checks the sync code and masks the 14-bit dims out
    * of the scale-carrying LE u16s, VP8L checks the 2F signature and
    * splits the packed LE u32 bitfield, VP8X reads the LE u24 canvas
    * fields. Malformed variants (bad sync/signature) and non-WebP
    * payloads → nulls. Returns `{format, variant, width, height}`.
    * Pure codegen'd arithmetic over the first 30 bytes, map-only.
    */
  def webpMeta(payload: Column): Column = {
    val isWebp = hex(substring(payload, 1, 4)) === "52494646" &&
      hex(substring(payload, 9, 4)) === "57454250"
    val fourcc = hex(substring(payload, 13, 4))
    val nullDims = struct(lit("webp").as("format"),
      lit(null).cast("string").as("variant"),
      lit(null).cast("int").as("width"), lit(null).cast("int").as("height"))
    val lossy = when(hex(substring(payload, 24, 3)) === "9D012A",
      struct(lit("webp").as("format"), lit("lossy").as("variant"),
        pmod(le16(payload, 27), lit(16384)).cast("int").as("width"),
        pmod(le16(payload, 29), lit(16384)).cast("int").as("height")))
      .otherwise(nullDims)
    val vp8lBits = le32(payload, 22)
    val lossless = when(hex(substring(payload, 21, 1)) === "2F",
      struct(lit("webp").as("format"), lit("lossless").as("variant"),
        (pmod(vp8lBits, lit(16384)) + 1).cast("int").as("width"),
        (pmod(floor(vp8lBits / 16384).cast("long"), lit(16384)) + 1)
          .cast("int").as("height")))
      .otherwise(nullDims)
    val extended = struct(lit("webp").as("format"),
      lit("extended").as("variant"),
      (le24(payload, 25) + 1).cast("int").as("width"),
      (le24(payload, 28) + 1).cast("int").as("height"))
    when(isWebp && fourcc === "56503820", lossy)
      .when(isWebp && fourcc === "5650384C", lossless)
      .when(isWebp && fourcc === "56503858", extended)
      .otherwise(struct(lit("unknown").as("format"),
        lit(null).cast("string").as("variant"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height")))
  }

  /** MPEG-1 Layer III bitrate table (kbps), indices 1-14; 0 is "free"
    * and 15 forbidden. Samplerate table indices 0-2; 3 reserved.
    */
  private val Mp3Bitrates =
    Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Samplerates = Seq(44100, 48000, 32000)

  /** A REAL MPEG-1 Layer III frame header: 11-bit sync, version 11
    * (MPEG-1), layer 01 (III), no CRC → bytes FF FB; byte 3 packs
    * `bitrateIdx«4 | samplerateIdx«2 | padding«1`; byte 4 zero
    * (stereo). `bitrateIdx` in [1,14], `samplerateIdx` in [0,2].
    */
  def encodeMp3Header(bitrateIdx: Column, samplerateIdx: Column,
      padding: Column): Column =
    to_binary(concat(lit("FFFB"),
      lpad(hex(shiftleft(bitrateIdx, 4)
        .bitwiseOR(shiftleft(samplerateIdx, 2))
        .bitwiseOR(shiftleft(padding, 1)).cast("int")), 2, "0"),
      lit("00")), lit("hex"))

  /** REAL MP3 frame-header parser: checks the sync + MPEG-1/Layer-III
    * bits, splits byte 3 into its bit fields, resolves bitrate and
    * samplerate through the STANDARD's lookup tables (literal arrays —
    * the table lookup is the point of the format), and derives the
    * frame length by the spec's integer formula
    * `144·bitrate·1000 ÷ samplerate + padding`. Free/forbidden bitrate
    * indices and the reserved samplerate index → nulls. Returns
    * `{format, bitrate_kbps, samplerate_hz, frame_bytes}`. Map-only
    * over 4 bytes.
    */
  def mp3Meta(payload: Column): Column = {
    val b3 = byteAt(payload, 3)
    val brIdx = floor(b3 / 16).cast("int")
    val srIdx = pmod(floor(b3 / 4).cast("int"), lit(4))
    val pad = pmod(floor(b3 / 2).cast("int"), lit(2))
    val brTable = array(Mp3Bitrates.map(lit): _*)
    val srTable = array(Mp3Samplerates.map(lit): _*)
    val ok = hex(substring(payload, 1, 2)) === "FFFB" &&
      brIdx.between(1, 14) && srIdx.between(0, 2)
    val br = element_at(brTable, brIdx)
    val sr = element_at(srTable, srIdx + 1)
    when(ok, struct(lit("mp3").as("format"),
      br.as("bitrate_kbps"), sr.as("samplerate_hz"),
      (floor((lit(144000L) * br) / sr).cast("int") + pad)
        .as("frame_bytes")))
      .otherwise(struct(lit("unknown").as("format"),
        lit(null).cast("int").as("bitrate_kbps"),
        lit(null).cast("int").as("samplerate_hz"),
        lit(null).cast("int").as("frame_bytes")))
  }

  private def be16hex(v: Column): Column = lpad(hex(v.cast("int")), 4, "0")

  /** A syntactically REAL JPEG/JFIF header: SOI, APP0 (JFIF 1.1), an
    * optional COM segment carrying `comment` (omitted when empty — so
    * the segment COUNT varies, not just segment lengths), a DQT, and a
    * baseline SOF0 with the given dimensions. Any JPEG tool that walks
    * marker segments reads the dimensions back from these bytes.
    */
  def encodeJpegHeader(w: Column, h: Column, comment: Column): Column = {
    val app0 = "FFE0" + "0010" + "4A46494600" + "0101" + "00" +
      "0001" + "0001" + "00" + "00"
    val dqt = "FFDB" + "0043" + "00" + ("00" * 64)
    val com = when(length(comment) > 0,
      concat(lit("FFFE"), be16hex(length(comment) + 2), upper(hex(comment))))
      .otherwise(lit(""))
    val sof0 = concat(lit("FFC0" + "0011" + "08"), be16hex(h), be16hex(w),
      lit("03" + "012200" + "021101" + "031101"))
    to_binary(concat(lit("FFD8" + app0), com, lit(dqt), sof0), lit("hex"))
  }

  /** REAL JPEG header parser — and unlike [[videoMeta]]'s bounded tag
    * scan, a genuine MARKER-SIZE WALK: starting after SOI, each step
    * reads the current marker's big-endian length and hops over the
    * segment, stopping at SOF0/SOF2 (where the frame height/width live
    * at fixed offsets) or freezing on anything malformed (a non-0xFF
    * byte where a marker belongs → `unknown`, never garbage fields).
    * The walk is unrolled to `maxSegments` STAGED projections — each
    * step references the previous position as a bound attribute, not an
    * inlined expression, so the plan stays linear in the unroll depth
    * (the staged-projection discipline; an inline fold here would grow
    * 6^depth sub-expressions). Appends `format`, `width`, `height` (nulls
    * for non-JPEG). Map-only over the payload's first bytes; the payload
    * never shuffles.
    */
  def withJpegMeta(df: DataFrame, binCol: String,
      maxSegments: Int = 6): DataFrame = {
    require(maxSegments > 0, s"maxSegments must be positive: $maxSegments")
    val p = col(binCol)
    def u8(off: Column): Column =
      conv(hex(substring(p, off, lit(1))), 16, 10).cast("int")
    def u16(off: Column): Column =
      conv(hex(substring(p, off, lit(2))), 16, 10).cast("int")
    def isSofAt(pos: Column): Column =
      u8(pos) === 255 && u8(pos + 1).isin(192, 194)
    val isJpeg = hex(substring(p, 1, 2)) === "FFD8"
    var cur = df.withColumn("__jpos", lit(3))
    (1 to maxSegments).foreach { _ =>
      val pos = col("__jpos")
      cur = cur.withColumn("__jpos",
        when(u8(pos) === 255 && !isSofAt(pos), pos + 2 + u16(pos + 2))
          .otherwise(pos))
    }
    val pos = col("__jpos")
    cur
      .withColumn("format",
        when(isJpeg && isSofAt(pos), lit("jpeg")).otherwise(lit("unknown")))
      .withColumn("width",
        when(isJpeg && isSofAt(pos), u16(pos + 7)).otherwise(lit(null).cast("int")))
      .withColumn("height",
        when(isJpeg && isSofAt(pos), u16(pos + 5)).otherwise(lit(null).cast("int")))
      .drop("__jpos")
  }

  /** A syntactically REAL TIFF header (the container EXIF rides on):
    * byte-order mark (II/MM — both emitted, chosen per row), magic 42,
    * a VARIABLE first-IFD offset (`pad` filler bytes precede the IFD,
    * so parsers must honor the offset pointer), and an ascending-tag
    * IFD — optional NewSubfileType(254), ImageWidth(256),
    * ImageLength(257), Compression(259), all type LONG — terminated by
    * a zero next-IFD pointer. Every multi-byte field respects the
    * declared byte order, which is the whole point of the format.
    */
  def encodeTiffHeader(w: Column, h: Column, littleEndian: Column,
      pad: Column, extraEntry: Column): Column = {
    def u16e(v: Column) = when(littleEndian, le16hex(v)).otherwise(be16hex(v))
    def u32e(v: Column) = when(littleEndian, le32hex(v)).otherwise(be32hex(v))
    def entry(tag: Int, v: Column) = concat(
      u16e(lit(tag)), u16e(lit(4)), u32e(lit(1)), u32e(v))
    val entries = concat(
      when(extraEntry, entry(254, lit(0))).otherwise(lit("")),
      entry(256, w), entry(257, h), entry(259, lit(1)))
    val count = when(extraEntry, lit(4)).otherwise(lit(3))
    to_binary(concat(
      when(littleEndian, lit("4949")).otherwise(lit("4D4D")),
      u16e(lit(42)), u32e(pad + 8), repeat(lit("00"), pad),
      u16e(count), entries, u32e(lit(0))), lit("hex"))
  }

  /** REAL TIFF parser: reads the byte-order mark, validates magic 42 IN
    * THAT BYTE ORDER, follows the first-IFD offset pointer (not a fixed
    * position), and scans the IFD's declared entry count for the
    * ImageWidth/ImageLength tags — every u16/u32 read switches
    * endianness on the header's own declaration. Entry positions are
    * direct arithmetic off the IFD base (`ifd + 2 + 12·i`), so unlike
    * [[withJpegMeta]]'s sequential walk no staging is needed; the scan
    * is a bounded `coalesce` over `maxEntries` independent probes.
    * Returns `{format, byte_order, width, height}`, nulls for
    * non-TIFF. Map-only over the payload's first bytes.
    *
    * Backed by the native [[graft.functions.TiffMeta]] expression: the
    * composed Column form below re-derives the endianness branch and
    * IFD pointer inside every tag probe and its single generated method
    * exceeds janino's 64 KB limit at the default `maxEntries` — janino
    * then drops the WHOLE project stage to interpreted evaluation
    * (observed in the m6 sf0.1 sweep). The composed form stays as
    * [[tiffMetaComposed]], the bit-parity reference.
    */
  def tiffMeta(payload: Column, maxEntries: Int = 6): Column =
    graft.functions.TiffMeta(payload, maxEntries)

  /** The composed-Column TIFF walk [[tiffMeta]] replaced — kept as the
    * parity reference ([[graft.functions.TiffMeta]] must match it
    * bit-for-bit, including out-of-bounds-null, negative-offset
    * read-from-end, and cast-wrap semantics; spec-pinned on
    * hand-written, encoder-built, and random payloads).
    */
  def tiffMetaComposed(payload: Column, maxEntries: Int = 6): Column = {
    def bAt(off: Column) =
      conv(hex(substring(payload, off, lit(1))), 16, 10).cast("long")
    val le = hex(substring(payload, 1, 2)) === "4949"
    val isTiff = hex(substring(payload, 1, 2)).isin("4949", "4D4D")
    def u16e(off: Column) = when(le, bAt(off) + bAt(off + 1) * 256)
      .otherwise(bAt(off) * 256 + bAt(off + 1))
    def u32e(off: Column) = when(le,
        bAt(off) + bAt(off + 1) * 256 + bAt(off + 2) * 65536 +
          bAt(off + 3) * 16777216)
      .otherwise(bAt(off) * 16777216 + bAt(off + 1) * 65536 +
        bAt(off + 2) * 256 + bAt(off + 3))
    val magicOk = isTiff && u16e(lit(3)) === 42
    // bound the pointer BEFORE the int cast: under ANSI mode (Spark 4's
    // default) a garbage 32-bit pointer would throw CAST_OVERFLOW and
    // kill the whole query on ONE corrupt file, and every probe offset
    // must stay inside int range; out-of-range pointers are corrupt
    // files → null ifd poisons every probe → unknown (fuzz-found)
    val ifdMax = lit((Int.MaxValue - 12 * maxEntries - 2).toLong)
    val ifdPtr = u32e(lit(5))
    val ifd = when(ifdPtr + 1 <= ifdMax, (ifdPtr + 1).cast("int"))
    val cnt = u16e(ifd)
    def tagVal(tag: Int): Column = coalesce((0 until maxEntries).map { i =>
      val pos = ifd + lit(2 + 12 * i)
      when(lit(i) < cnt && u16e(pos) === tag, u32e(pos + 8))
    }: _*)
    val width = tagVal(256)
    val height = tagVal(257)
    // dims past int range are corrupt too (same ANSI cast hazard)
    val dimMax = lit(Int.MaxValue.toLong)
    when(magicOk && width.isNotNull && height.isNotNull &&
        width <= dimMax && height <= dimMax, struct(
      lit("tiff").as("format"),
      when(le, lit("II")).otherwise(lit("MM")).as("byte_order"),
      width.cast("int").as("width"), height.cast("int").as("height")))
      .otherwise(struct(lit("unknown").as("format"),
        lit(null).cast("string").as("byte_order"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height")))
  }

  /** A syntactically REAL gzip member: magic 1F8B, deflate method,
    * little-endian mtime, deflate-flag/OS bytes, an opaque compressed
    * body of `bodyBytes` 0xAA filler (this library treats compressed
    * payloads as opaque binary — the schema/plumbing pattern of the m1
    * stub, but the FRAMING here is real), then the standard trailer:
    * CRC32 and ISIZE as little-endian u32s. Any gzip tool reads mtime
    * and ISIZE from these bytes.
    */
  def encodeGzipMember(mtime: Column, isize: Column, crc: Column,
      bodyBytes: Column): Column =
    to_binary(concat(
      lit("1F8B" + "08" + "00"), le32hex(mtime), lit("00" + "03"),
      repeat(lit("AA"), bodyBytes), le32hex(crc), le32hex(isize)), lit("hex"))

  /** REAL gzip member parser — the first FOOTER-anchored codec in the
    * family: ISIZE and CRC32 live in the last 8 bytes, so the reads
    * anchor at `length(payload)` rather than a fixed offset (exactly
    * how gzip tools recover the uncompressed size without inflating).
    * Validates magic 1F8B + deflate method 8, decodes the LE mtime at
    * byte 5, OS byte at 10, and the trailer pair. Unknown magic →
    * nulls. Map-only over first/last bytes; the payload never shuffles.
    */
  def gzipMeta(payload: Column): Column = {
    def bAt(off: Column) =
      conv(hex(substring(payload, off, lit(1))), 16, 10).cast("long")
    def le32At(off: Column) =
      bAt(off) + bAt(off + 1) * 256 + bAt(off + 2) * 65536 +
        bAt(off + 3) * 16777216
    val n = length(payload)
    val ok = hex(substring(payload, 1, 2)) === "1F8B" &&
      bAt(lit(3)) === 8 && n >= 18
    when(ok, struct(
      lit("gzip").as("format"),
      le32At(lit(5)).as("mtime"),
      bAt(lit(10)).cast("int").as("os"),
      le32At(n - 7).as("crc32"),
      le32At(n - 3).as("isize")))
      .otherwise(struct(lit("unknown").as("format"),
        lit(null).cast("long").as("mtime"), lit(null).cast("int").as("os"),
        lit(null).cast("long").as("crc32"), lit(null).cast("long").as("isize")))
  }

  /** A real RIFF/WAVE header (PCM "fmt " chunk + "data" chunk header)
    * for the given stream parameters — the 44 bytes any .wav tool reads.
    */
  def encodeWavHeader(channels: Column, sampleRate: Column,
      bitsPerSample: Column, dataBytes: Column): Column = {
    val blockAlign = floor(channels * bitsPerSample / 8).cast("int")
    val byteRate = (sampleRate * blockAlign).cast("int")
    to_binary(concat(
      lit("52494646"), le32hex(dataBytes + 36), lit("57415645"), // RIFF size WAVE
      lit("666D7420"), lit("10000000"), lit("0100"), // "fmt " len=16 PCM
      le16hex(channels), le32hex(sampleRate), le32hex(byteRate),
      le16hex(blockAlign), le16hex(bitsPerSample),
      lit("64617461"), le32hex(dataBytes)), lit("hex")) // "data" size
  }

  /** REAL WAV header parser: validates the RIFF/WAVE magic and decodes
    * channels/sample-rate/bit-depth/payload size from the PCM header's
    * fixed little-endian offsets, plus the derived duration in ms
    * (integer floor, exact). Unknown magic → nulls. Same map-only,
    * first-bytes-only profile as [[imageDims]].
    */
  def audioMeta(payload: Column): Column = {
    val isWav = hex(substring(payload, 1, 4)) === "52494646" &&
      hex(substring(payload, 9, 4)) === "57415645"
    val dataBytes = le32(payload, 41)
    val byteRate = le32(payload, 29)
    when(isWav, struct(
      lit("wav").as("format"),
      le16(payload, 23).as("channels"),
      le32(payload, 25).as("sample_rate"),
      le16(payload, 35).as("bits"),
      dataBytes.as("data_bytes"),
      floor(dataBytes.cast("double") * 1000.0 / byteRate).cast("long")
        .as("duration_ms")))
      .otherwise(struct(lit("unknown").as("format"),
        lit(null).cast("int").as("channels"), lit(null).cast("int").as("sample_rate"),
        lit(null).cast("int").as("bits"), lit(null).cast("int").as("data_bytes"),
        lit(null).cast("long").as("duration_ms")))
  }

  /** A real ISO BMFF (MP4) header for the given stream parameters:
    * `ftyp` (major brand isom) + `moov` wrapping a spec-sized `mvhd`
    * (timescale + duration at their big-endian offsets, 108 bytes) and
    * a `trak`/`tkhd` (track width/height as 16.16 fixed point, 92
    * bytes). Box sizes are correct, so any BMFF-aware tool walks these
    * boxes and reads the same fields back.
    */
  def encodeMp4Header(timescale: Column, durationTicks: Column,
      w: Column, h: Column): Column = {
    val ftyp = "00000010" + "66747970" + "69736F6D" + "00000200"
    // 9 × u32 unity transform: diag(0x10000, 0x10000, 0x40000000)
    val unityMatrix = "00010000" + "00000000" + "00000000" +
      "00000000" + "00010000" + "00000000" +
      "00000000" + "00000000" + "40000000"
    val mvhd = concat(
      lit("0000006C" + "6D766864" + "00000000" + "00000000" + "00000000"),
      be32hex(timescale), be32hex(durationTicks),
      lit("00010000" + "0100" + "0000" + "0000000000000000" + unityMatrix +
        "0" * 48 + // 6 × u32 pre_defined
        "00000002")) // next track id
    val tkhd = concat(
      lit("0000005C" + "746B6864" + "00000007" + "00000000" + "00000000" +
        "00000001" + "00000000"),
      be32hex(durationTicks),
      lit("0000000000000000" + "0000" + "0000" + "0000" + "0000" + unityMatrix),
      be32hex(w * 65536), be32hex(h * 65536))
    // trak = 8 + 92 = 100 (0x64); moov = 8 + 108 + 100 = 216 (0xD8)
    to_binary(concat(lit(ftyp), lit("000000D8" + "6D6F6F76"), mvhd,
      lit("00000064" + "7472616B"), tkhd), lit("hex"))
  }

  /** REAL MP4 header parser: validates the `ftyp` magic at byte 5,
    * reads the major brand, then locates the `mvhd` and `tkhd` boxes by
    * tag scan over the first 512 bytes (a full demuxer walks box sizes;
    * headers this parser targets fit the bound) and decodes timescale,
    * duration, and the track's 16.16 fixed-point width/height from the
    * boxes' fixed big-endian offsets. Duration is floored to ms with
    * exact integer arithmetic. Unknown magic → nulls. Map-only,
    * first-bytes-only — the payload never shuffles.
    */
  def videoMeta(payload: Column): Column = {
    val isMp4 = hex(substring(payload, 5, 4)) === "66747970"
    val hx = hex(substring(payload, 1, 512))
    // BYTE-ALIGNED tag scan: a 1-based char position into the hex string
    // addresses a byte boundary only when odd — an even match is the tag
    // pattern straddling two unrelated bytes (payload coincidence) and
    // must read as not-found rather than decode garbage fields. A real
    // demuxer walks box sizes from `moov`; within this parser's 512-byte
    // header bound the aligned-first-match rule is equivalent for the
    // headers it targets.
    def alignedLocate(tag: String): Column = {
      val raw = locate(tag, hx)
      when(raw % 2 === 1, raw).otherwise(lit(0))
    }
    val mv = alignedLocate("6D766864") // char pos of 'mvhd' tag (1-based)
    val tk = alignedLocate("746B6864")
    def beAt(pos: Column, byteOff: Int): Column =
      conv(substring(hx, pos + lit(8 + byteOff * 2), lit(8)), 16, 10).cast("long")
    val timescale = beAt(mv, 12)
    val duration = beAt(mv, 16)
    val width = (beAt(tk, 76) / 65536).cast("int")
    val height = (beAt(tk, 80) / 65536).cast("int")
    when(isMp4 && mv > 0 && tk > 0, struct(
      lit("mp4").as("format"),
      decode(substring(payload, 9, 4), "UTF-8").as("brand"),
      timescale.cast("int").as("timescale"),
      duration.as("duration_ticks"),
      width.as("width"), height.as("height"),
      floor(duration.cast("double") * 1000.0 / timescale).cast("long")
        .as("duration_ms")))
      .otherwise(struct(lit("unknown").as("format"),
        lit(null).cast("string").as("brand"),
        lit(null).cast("int").as("timescale"),
        lit(null).cast("long").as("duration_ticks"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")))
  }

  /** Writer sizing for payload-heavy tables: bounds file size so a 100 TB
    * media table splits into scan tasks that fit executor memory.
    */
  def sizedForPayloads(df: DataFrame, recordsPerFile: Long): DataFrame = {
    df.sparkSession.conf.set("spark.sql.files.maxRecordsPerFile", recordsPerFile)
    df
  }

  // ---- batched decode pipeline (the mapInPandas-shaped path) ----

  final case class MediaRow(id: Long, payload: Array[Byte])
  final case class DecodedImage(id: Long, width: Int, height: Int, channels: Int)

  /** Batch decoder signature: one call per bounded chunk of payloads —
    * the shape a real codec or model runtime wants (amortize the native
    * call, bound peak memory by `batchSize × payload`), exactly what a
    * `mapInPandas` batch UDF receives in the Python API.
    */
  type ImageBatchDecoder = Seq[Array[Byte]] => Seq[(Int, Int, Int)]

  /** STUB batch decoder: per payload, the same md5-derived fake header
    * as [[decodeImageStub]] (bit-identical — the spec pins parity), so
    * swapping in a real codec is a one-argument change.
    */
  val stubBatchDecoder: ImageBatchDecoder = payloads => payloads.map { p =>
    val d = java.security.MessageDigest.getInstance("MD5").digest(p)
      .map("%02x".format(_)).mkString
    (Integer.parseInt(d.substring(0, 4), 16) % 1920 + 64,
      Integer.parseInt(d.substring(4, 8), 16) % 1080 + 64, 3)
  }

  /** Partition-streaming batched decode — the Scala analog of
    * `df.mapInPandas(decode_batches, schema)`: each partition's rows
    * stream through the decoder in `batchSize` chunks; only one chunk of
    * payloads is resident per task at a time, and the decoder sees whole
    * batches. Map-only: no shuffle ever touches a payload.
    */
  def decodeImagesBatched(
      ds: Dataset[MediaRow],
      batchSize: Int = 64,
      decoder: ImageBatchDecoder = stubBatchDecoder): Dataset[DecodedImage] = {
    implicit val enc: Encoder[DecodedImage] = Encoders.product[DecodedImage]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { chunk =>
        val headers = decoder(chunk.map(_.payload))
        require(headers.size == chunk.size,
          s"decoder returned ${headers.size} headers for ${chunk.size} payloads")
        chunk.lazyZip(headers).map { case (r, (w, h, c)) =>
          DecodedImage(r.id, w, h, c)
        }
      }
    }
  }
}
