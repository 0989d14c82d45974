package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus batch feature extraction.
  *
  * Decode comes in two tiers. [[HeaderDecoder]] and the pixel codecs
  * ([[Bmp]], [[Png]], [[Jpeg]] — including full baseline JPEG entropy
  * decode) are REAL: pure-JVM parsing of actual bytes, no native bindings.
  * Audio/video SAMPLE decode (MP3/H.264) would need bindings this
  * container lacks, so that step is a clearly-marked deterministic stub
  * (MP3 frame HEADERS are real — [[Mp3]])
  * ([[StubDecoder]]). Both run through the same Spark-side shape —
  * binary+metadata schema, partition-wise batch UDF (`mapPartitions` over
  * a typed Dataset — the Scala analog of `mapInPandas`), and a
  * column-level metadata path that stays inside whole-stage codegen.
  *
  * There is no binary table in the testdata, so payloads are synthesized
  * deterministically from `documents.text` (UTF-8 bytes) — the plumbing is
  * identical for real image bytes.
  */
object Multimodal {

  /** A media record: opaque payload + the typed metadata a real pipeline
    * would carry (media kind, declared dims, source).
    */
  final case class MediaRecord(
      media_id: Long, kind: String, payload: Array[Byte],
      declared_w: Int, declared_h: Int)

  final case class MediaFeatures(
      media_id: Long, kind: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /** documents → synthetic media table (binary payload column). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      // deterministic kind assignment
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"),
      (col("doc_id") % 640 + 1).cast("int").as("declared_w"),
      (col("doc_id") % 480 + 1).cast("int").as("declared_h"))

  /** The decode stub for the formats still lacking a pure-JVM codec here
    * (MP3 / H.264 — images are fully real via [[Bmp]]/[[Png]]/[[Jpeg]]):
    * in production this calls ffmpeg-style bindings per batch; here it
    * derives deterministic fake features from the bytes so tests can
    * assert exact values. Marked loudly so no one mistakes it for a real
    * decoder.
    */
  object StubDecoder {
    /** STUB — stands in for real image/audio decode (no codecs in env). */
    def decode(r: MediaRecord): MediaFeatures = {
      val bytes = r.payload
      var checksum = 0L
      var i = 0
      while (i < bytes.length) { checksum = checksum * 31 + (bytes(i) & 0xff); i += 1 }
      MediaFeatures(
        media_id = r.media_id, kind = r.kind, byte_len = bytes.length,
        width = r.declared_w, height = r.declared_h,
        // ceil(len/1000) via positive-operand integer math: 0 frames for an
        // empty payload ((len-1)/1000+1 would claim 1 phantom frame)
        n_frames = if (r.kind == "video") (bytes.length + 999) / 1000 else 1,
        checksum = checksum)
    }
  }

  /** What a REAL decode extracts from container headers: pixel dims for
    * images, sample rate / channels / bit depth for audio. `format` is the
    * detected container ("bmp", "wav", "unknown"), independent of the
    * declared `kind` metadata.
    */
  final case class DecodedMedia(
      media_id: Long, format: String, width: Int, height: Int,
      sample_rate: Int, channels: Int, bits_per_sample: Int)

  /** A real (non-stub) decoder for the container formats that need no
    * native codec: BMP (BITMAPINFOHEADER pixel dims), PNG (IHDR), canonical
    * RIFF/WAVE (`fmt ` chunk walk → sample rate, channels, bit depth), and
    * JPEG pixel DIMENSIONS (marker walk to the first SOF segment — frame
    * size lives in the entropy-free header, so no codec is needed to read
    * it). Pure-JVM byte parsing, so the `mapPartitions` batch-decode path
    * runs against REAL media bytes in any environment; pixel/sample DECODE
    * of compressed formats (JPEG/MP3/H.264) still requires the codec
    * bindings [[StubDecoder]] stands in for.
    */
  object HeaderDecoder {
    private def u16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def i32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], i: Int): String =
      new String(b, i, 4, "US-ASCII")
    private def i32be(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    private val PngSig: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    def decode(r: MediaRecord): DecodedMedia = {
      val b = r.payload
      if (b.length >= 24 && b.take(8).sameElements(PngSig) && tag(b, 12) == "IHDR") {
        // IHDR is mandated first: width/height are big-endian u32 at 16/20
        DecodedMedia(r.media_id, "png", i32be(b, 16), i32be(b, 20), 0, 0, 0)
      } else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
        // BITMAPINFOHEADER at byte 14: width i32le@18, height i32le@22
        // (height < 0 = top-down row order; magnitude is the pixel height)
        DecodedMedia(r.media_id, "bmp", i32(b, 18), math.abs(i32(b, 22)), 0, 0, 0)
      } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        // JPEG: walk marker segments from SOI to the first start-of-frame
        // (SOF0..SOF15 minus DHT/JPG/DAC); its payload is
        // [len u16be][precision u8][height u16be][width u16be]. Stop at
        // SOS/EOI (entropy data follows) or any malformed length.
        def u16be(i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
        var i = 2
        var out: DecodedMedia = null
        while (out == null && i + 4 <= b.length && (b(i) & 0xff) == 0xff) {
          val m = b(i + 1) & 0xff
          if (m == 0xff) i += 1 // fill byte
          else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2 // standalone
          else if (m == 0xda || m == 0xd9) out = DecodedMedia(r.media_id, "jpeg", 0, 0, 0, 0, 0)
          else {
            val len = u16be(i + 2)
            val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
            if (isSof && i + 9 <= b.length && len >= 7)
              out = DecodedMedia(r.media_id, "jpeg", u16be(i + 7), u16be(i + 5), 0, 0, 0)
            else if (len < 2) out = DecodedMedia(r.media_id, "jpeg", 0, 0, 0, 0, 0)
            else i += 2 + len
          }
        }
        if (out != null) out else DecodedMedia(r.media_id, "jpeg", 0, 0, 0, 0, 0)
      } else if (b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE") {
        // chunk walk (chunks are 2-byte aligned); canonical files put
        // "fmt " first but the spec doesn't require it. Long arithmetic +
        // a negative-size bail-out: a corrupt size field must not stall
        // the walk (i += 8 + sz stops advancing) or overflow into a
        // negative index — either way the payload is malformed, stop.
        var i = 12L
        var done = false
        while (!done && i + 8 <= b.length) {
          val sz = i32(b, i.toInt + 4).toLong
          if (sz < 0) done = true
          else if (tag(b, i.toInt) == "fmt " && i + 24 <= b.length)
            return DecodedMedia(r.media_id, "wav", 0, 0,
              sample_rate = i32(b, i.toInt + 12), channels = u16(b, i.toInt + 10),
              bits_per_sample = u16(b, i.toInt + 22))
          else i += 8 + sz + (sz & 1)
        }
        DecodedMedia(r.media_id, "wav", 0, 0, 0, 0, 0)
      } else DecodedMedia(r.media_id, "unknown", 0, 0, 0, 0, 0)
    }
  }

  /** Real header decode over a media Dataset — identical plan shape to
    * [[extractFeatures]] (partition-wise batch, one decoder per partition),
    * but [[HeaderDecoder]] parses actual bytes.
    */
  def decodeHeaders(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(HeaderDecoder.decode))
  }

  /** Partition-wise batch feature extraction — the Scala analog of a Pandas
    * `mapInPandas` UDF: one decoder instance per partition, records streamed
    * through it. This is the pattern a real decode (model inference, codec
    * calls) plugs into without changing the plan shape.
    */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord]
      .mapPartitions { it =>
        // per-partition setup (a real decoder would init codecs here, once)
        it.map(StubDecoder.decode)
      }
  }

  /** Pure-column metadata extraction (no stub involved): byte length, md5
    * content hash, frame-sampling plan. Oracle-checkable in DuckDB because
    * the payload bytes are the UTF-8 text bytes on both sides.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("media_id"), col("kind"),
      octet_length(col("payload")).as("byte_len"),
      md5(col("payload")).as("content_md5"),
      col("declared_w"), col("declared_h"),
      // ceil(len/1000) with positive operands (truncation == floor, so the
      // two engines agree); an empty video payload has 0 frames, where the
      // (len-1)/1000+1 form diverges: Spark truncates -1/1000 to 0 (→ 1)
      // while DuckDB floors to -1 (→ 0)
      when(col("kind") === "video",
        expr("(octet_length(payload) + 999) DIV 1000"))
        .otherwise(1).cast("int").as("n_frames"))

  /** Frame-sampling plan for video payloads: one row per sampled frame with
    * its byte offset — the deterministic "which frames would we decode"
    * stage that precedes the (stubbed) decode itself. Pure columns
    * (explode over a sequence), oracle-checkable.
    */
  def frameSample(spark: SparkSession, dir: String, frameBytes: Int = 1000): DataFrame =
    mediaTable(spark, dir)
      .filter(col("kind") === "video")
      .withColumn("byte_len", octet_length(col("payload")))
      // empty payloads sample no frames — they MUST be filtered before the
      // sequence (sequence(0, -1) generates a DESCENDING range in Spark)
      .filter(col("byte_len") > 0)
      // last frame starts strictly inside the payload: ceil(len/size)-1
      // ((len)/size would emit a zero-byte frame at offset==len when len is
      // an exact multiple of the frame size)
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          ((col("byte_len") + (frameBytes - 1)) / frameBytes).cast("int") - 1)))
      .select(
        col("media_id"),
        // long to match DuckDB's BIGINT range() elements
        col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx").cast("long") * frameBytes).as("byte_offset"),
        col("byte_len"))

  /** Resize plan for image payloads: fit into a target box preserving
    * aspect ratio — the deterministic geometry stage of a resize pipeline
    * (the pixel resample itself lives behind the decode stub). Integer
    * inputs → double scale → floor'd output dims: bit-identical across
    * engines.
    */
  def resizePlan(spark: SparkSession, dir: String, box: Int = 224): DataFrame = {
    // Output dims via exact integer round-half-up ((2·d·box + m) DIV 2m):
    // no float in the geometry, so the binding dimension lands exactly on
    // the box (floor(d * (box/m)) is off by one whenever box/m is inexact
    // and d = m). The scale column is the raw double ratio — per-row
    // IEEE division is bit-identical across engines, rounding it is not
    // (see the oracle-parity notes on per-row round()).
    val m = s"greatest(declared_w, declared_h)"
    mediaTable(spark, dir)
      .filter(col("kind") === "image")
      .select(
        col("media_id"), col("declared_w"), col("declared_h"),
        expr(s"CAST($box AS DOUBLE) / $m").as("scale"),
        expr(s"CAST(greatest((2 * declared_w * $box + $m) DIV (2 * $m), 1) AS INT)").as("out_w"),
        expr(s"CAST(greatest((2 * declared_h * $box + $m) DIV (2 * $m), 1) AS INT)").as("out_h"))
  }

  def resizePlanSql(box: Int = 224): String =
    s"""SELECT media_id, declared_w, declared_h,
       |  CAST($box AS DOUBLE) / m AS scale,
       |  CAST(greatest((2 * declared_w * $box + m) // (2 * m), 1) AS INT) AS out_w,
       |  CAST(greatest((2 * declared_h * $box + m) // (2 * m), 1) AS INT) AS out_h
       |FROM (
       |  SELECT doc_id AS media_id,
       |    CAST(doc_id % 640 + 1 AS INT) AS declared_w,
       |    CAST(doc_id % 480 + 1 AS INT) AS declared_h,
       |    greatest(doc_id % 640 + 1, doc_id % 480 + 1) AS m
       |  FROM documents WHERE doc_id % 3 = 0)
       |ORDER BY media_id""".stripMargin

  /** The REAL pixel path, end to end: per image, synthesize formula pixels
    * → [[Bmp.encode]] to actual 24bpp BMP bytes → [[Bmp.decode]] those
    * bytes back (a genuine container parse: offsets, bottom-up rows, BGR,
    * padding) → [[Bmp.resizeNearest]] into the target box with the same
    * round-half-up geometry as [[resizePlan]] → a position-weighted
    * channel checksum over the RESIZED pixels.
    *
    * Differentially strong by construction: the DuckDB oracle never sees a
    * byte — it recomputes the same checksum from the pixel formula plus
    * the integer-exact nearest-neighbor index mapping
    * `sx = (2x+1)·srcW / (2·outW)`. Any defect in the codec round-trip
    * (row order, BGR swap, stride padding) or the resampler shifts the
    * checksum and fails the hash compare.
    *
    * Scale shape: one `mapPartitions` pass, all pixel work row-local, no
    * shuffle before the presentation orderBy; images are bounded at
    * 16×12×3 bytes so executor memory is flat.
    */
  def pixelStats(spark: SparkSession, dir: String, box: Int = 8): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"))
      .filter(col("doc_id") % 3 === 0)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (id % 16).toInt + 1
          val h = (id % 12).toInt + 1
          val rgb = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = (y * w + x) * 3
              rgb(p) = ((id + 7L * x + 13L * y) % 256).toByte
              rgb(p + 1) = ((x.toLong * y + id) % 256).toByte
              rgb(p + 2) = ((x + y) % 256).toByte
              x += 1
            }
            y += 1
          }
          val bytes = Bmp.encode(w, h, rgb)
          val (dw, dh, drgb) = Bmp.decode(bytes)
            .getOrElse(sys.error(s"undecodable BMP for media $id"))
          val m = math.max(dw, dh)
          val outW = math.max((2 * dw * box + m) / (2 * m), 1)
          val outH = math.max((2 * dh * box + m) / (2 * m), 1)
          val rs = Bmp.resizeNearest(dw, dh, drgb, outW, outH)
          var check = 0L
          var yy = 0
          while (yy < outH) {
            var xx = 0
            while (xx < outW) {
              val p = (yy * outW + xx) * 3
              check += ((rs(p) & 0xff) + 2 * (rs(p + 1) & 0xff) +
                3 * (rs(p + 2) & 0xff)).toLong * (xx + 1) * (yy + 1)
              xx += 1
            }
            yy += 1
          }
          (id, outW, outH, check)
        }
      }.toDF("media_id", "out_w", "out_h", "px_check")
      .orderBy("media_id")
  }

  /** [[pixelStats]]'s PNG twin: formula pixels → [[Png.encode]] (scanline
    * filter cycling with a per-image phase, so every image h ≥ 5 runs all
    * five PNG filter types through the encoder AND the decoder's unfilter
    * path) → [[Png.decode]] (real zlib inflate + unfilter) →
    * [[Bmp.resizeNearest]] → position-weighted checksum. The DuckDB oracle
    * recomputes the checksum from the formulas alone — any defect in
    * deflate/inflate framing, filter reconstruction (Sub/Up/Average/Paeth),
    * or RGB projection shifts the hash. Constants differ from the BMP twin
    * so the two queries cannot mask each other.
    */
  def pixelStatsPng(spark: SparkSession, dir: String, box: Int = 7): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"))
      .filter(col("doc_id") % 3 === 0)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (id % 14).toInt + 1
          val h = (id % 10).toInt + 1
          val rgb = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = (y * w + x) * 3
              rgb(p) = ((id + 11L * x + 3L * y) % 256).toByte
              rgb(p + 1) = ((x.toLong * y + 2L * id) % 256).toByte
              rgb(p + 2) = ((2L * x + 5L * y) % 256).toByte
              x += 1
            }
            y += 1
          }
          val bytes = Png.encode(w, h, rgb, filterPhase = (id % 5).toInt)
          val (dw, dh, drgb) = Png.decode(bytes)
            .getOrElse(sys.error(s"undecodable PNG for media $id"))
          val m = math.max(dw, dh)
          val outW = math.max((2 * dw * box + m) / (2 * m), 1)
          val outH = math.max((2 * dh * box + m) / (2 * m), 1)
          val rs = Bmp.resizeNearest(dw, dh, drgb, outW, outH)
          var check = 0L
          var yy = 0
          while (yy < outH) {
            var xx = 0
            while (xx < outW) {
              val p = (yy * outW + xx) * 3
              check += (3 * (rs(p) & 0xff) + 2 * (rs(p + 1) & 0xff) +
                (rs(p + 2) & 0xff)).toLong * (xx + 1) * (yy + 1)
              xx += 1
            }
            yy += 1
          }
          (id, outW, outH, check)
        }
      }.toDF("media_id", "out_w", "out_h", "px_check")
      .orderBy("media_id")
  }

  /** The JPEG tier of the pixel path — a LOSSY codec made differentially
    * oracle-checkable: Y is constant per 8×8 block and Cb/Cr constant per
    * 16×16 MCU, so with [[Jpeg]]'s all-ones quant tables every block is
    * DC-only and the REAL encode → huffman-decode → dequant → IDCT →
    * 4:2:0-upsample path reproduces the plane values EXACTLY (the
    * exactness argument lives on [[Jpeg]]). The DuckDB oracle recomputes
    * the block constants from the formulas and applies the same
    * fixed-point YCbCr→RGB — it never sees a byte, so a defect anywhere in
    * the entropy coding, DC prediction, zigzag, IDCT or upsampling shifts
    * the position-weighted checksum and fails the hash compare.
    */
  def pixelStatsJpeg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"))
      .filter(col("doc_id") % 3 === 0)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (id % 24).toInt + 1
          val h = (id % 18).toInt + 1
          val yP = new Array[Int](w * h)
          val cbP = new Array[Int](w * h)
          val crP = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = y * w + x
              yP(p) = ((3 * id + 17 * (x / 8) + 29 * (y / 8)) % 256).toInt
              cbP(p) = ((5 * id + 23 * (x / 16) + 31 * (y / 16)) % 256).toInt
              crP(p) = ((7 * id + 19 * (x / 16) + 37 * (y / 16)) % 256).toInt
              x += 1
            }
            y += 1
          }
          val bytes = Jpeg.encodeYCbCr(w, h, yP, cbP, crP)
          val (dw, dh, rgb) = Jpeg.decode(bytes)
            .getOrElse(sys.error(s"undecodable JPEG for media $id"))
          var check = 0L
          var yy = 0
          while (yy < dh) {
            var xx = 0
            while (xx < dw) {
              val p = (yy * dw + xx) * 3
              check += (2 * (rgb(p) & 0xff) + 5 * (rgb(p + 1) & 0xff) +
                3 * (rgb(p + 2) & 0xff)).toLong * (xx + 1) * (yy + 1)
              xx += 1
            }
            yy += 1
          }
          (id, dw, dh, check)
        }
      }.toDF("media_id", "out_w", "out_h", "px_check")
      .orderBy("media_id")
  }

  /** Byte-free recomputation: block-constant planes + the [[Jpeg.yccToRgb]]
    * fixed-point conversion (positive shifted operands, so `//` truncation
    * == floor on both engines).
    */
  def pixelStatsJpegSql(): String =
    s"""WITH imgs AS (
       |  SELECT doc_id AS media_id,
       |    doc_id % 24 + 1 AS w, doc_id % 18 + 1 AS h
       |  FROM documents WHERE doc_id % 3 = 0),
       |px AS (
       |  SELECT media_id, w, h, x, y,
       |    (3 * media_id + 17 * (x // 8) + 29 * (y // 8)) % 256 AS yv,
       |    (5 * media_id + 23 * (x // 16) + 31 * (y // 16)) % 256 AS cb,
       |    (7 * media_id + 19 * (x // 16) + 37 * (y // 16)) % 256 AS cr
       |  FROM imgs, unnest(range(0, w)) AS tx(x), unnest(range(0, h)) AS ty(y)),
       |rgb AS (
       |  SELECT media_id, w, h, x, y,
       |    least(greatest(yv + (91881 * cr + 32768) // 65536 - 179, 0), 255) AS r,
       |    least(greatest(yv - (22554 * cb + 46802 * cr + 32768) // 65536 + 135, 0), 255) AS g,
       |    least(greatest(yv + (116130 * cb + 32768) // 65536 - 227, 0), 255) AS b
       |  FROM px)
       |SELECT media_id,
       |  CAST(w AS INT) AS out_w, CAST(h AS INT) AS out_h,
       |  CAST(sum((2 * r + 5 * g + 3 * b) * (x + 1) * (y + 1)) AS BIGINT) AS px_check
       |FROM rgb GROUP BY media_id, w, h ORDER BY media_id""".stripMargin

  /** Image self-coding bits — the visual twin of the text tier's
    * `d_lm_bits`/`d_compress_ratio` quality signals: total bits to code
    * each image's gray values under their own histogram (the entropy
    * lower bound, in the exact-integer `length(bin(x))` formulation — no
    * libm). Flat/templated images (solid fills, letterboxes, test cards)
    * code in near-zero bits however large they are; real photographs
    * don't — the degenerate-image filter a multimodal curation pipeline
    * gates on. Byte path is REAL (the [[pixelStatsJpeg]] JPEG round-trip:
    * encode → full entropy decode → fixed-point YCbCr→RGB); the DuckDB
    * oracle recomputes the same pixels arithmetically (block-constant
    * planes are DCT-exact) and the same integer bits — a defect anywhere
    * in the codec path shifts the histogram and fails the hash.
    *
    * Scale shape: decode + histogram are row-local (765-int state per
    * image, inside mapPartitions like every codec op); the relation never
    * shuffles anything but the final per-image rows.
    */
  def imageBits(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def lenbin(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    Tables.documents(spark, dir).select(col("doc_id"))
      .filter(col("doc_id") % 3 === 0)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (id % 24).toInt + 1
          val h = (id % 18).toInt + 1
          val yP = new Array[Int](w * h)
          val cbP = new Array[Int](w * h)
          val crP = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = y * w + x
              yP(p) = ((3 * id + 17 * (x / 8) + 29 * (y / 8)) % 256).toInt
              cbP(p) = ((5 * id + 23 * (x / 16) + 31 * (y / 16)) % 256).toInt
              crP(p) = ((7 * id + 19 * (x / 16) + 37 * (y / 16)) % 256).toInt
              x += 1
            }
            y += 1
          }
          val bytes = Jpeg.encodeYCbCr(w, h, yP, cbP, crP)
          val (dw, dh, rgb) = Jpeg.decode(bytes)
            .getOrElse(sys.error(s"undecodable JPEG for media $id"))
          val hist = new Array[Long](766)
          var i = 0
          while (i < dw * dh) {
            val p = i * 3
            hist((rgb(p) & 0xff) + (rgb(p + 1) & 0xff) + (rgb(p + 2) & 0xff)) += 1
            i += 1
          }
          val nPx = (dw * dh).toLong
          var sumBits = 0L
          var v = 0
          while (v < 766) {
            if (hist(v) > 0) sumBits += hist(v) * (lenbin(nPx) - lenbin(hist(v)))
            v += 1
          }
          (id, nPx, sumBits, sumBits / nPx.toDouble)
        }
      }.toDF("media_id", "n_px", "sum_bits", "bits_per_px")
      .orderBy("media_id")
  }

  def imageBitsSql(): String =
    s"""WITH imgs AS (
       |  SELECT doc_id AS media_id,
       |    doc_id % 24 + 1 AS w, doc_id % 18 + 1 AS h
       |  FROM documents WHERE doc_id % 3 = 0),
       |px AS (
       |  SELECT media_id, w, h,
       |    (3 * media_id + 17 * (x // 8) + 29 * (y // 8)) % 256 AS yv,
       |    (5 * media_id + 23 * (x // 16) + 31 * (y // 16)) % 256 AS cb,
       |    (7 * media_id + 19 * (x // 16) + 37 * (y // 16)) % 256 AS cr
       |  FROM imgs, unnest(range(0, w)) AS tx(x), unnest(range(0, h)) AS ty(y)),
       |gray AS (
       |  SELECT media_id, w, h,
       |    least(greatest(yv + (91881 * cr + 32768) // 65536 - 179, 0), 255)
       |    + least(greatest(yv - (22554 * cb + 46802 * cr + 32768) // 65536 + 135, 0), 255)
       |    + least(greatest(yv + (116130 * cb + 32768) // 65536 - 227, 0), 255) AS g
       |  FROM px),
       |hist AS (
       |  SELECT media_id, w, h, g, count(*) AS c
       |  FROM gray GROUP BY media_id, w, h, g)
       |SELECT media_id,
       |  CAST(w * h AS BIGINT) AS n_px,
       |  CAST(sum(c * (length(bin(CAST(w * h AS BIGINT)))
       |    - length(bin(c)))) AS BIGINT) AS sum_bits,
       |  CAST(sum(c * (length(bin(CAST(w * h AS BIGINT))) - length(bin(c)))) AS BIGINT)
       |    / CAST(w * h AS DOUBLE) AS bits_per_px
       |FROM hist GROUP BY media_id, w, h ORDER BY media_id""".stripMargin

  /** The AUDIO tier of the byte path — real container, real PCM: formula
    * samples → [[Wav.encode]] to actual RIFF/WAVE bytes → [[Wav.decode]]
    * (genuine chunk walk, sign extension, interleaving) → integer audio
    * features (peak, energy, zero crossings) a curation pipeline gates on.
    * All features are exact integers, so the DuckDB oracle recomputes them
    * from the sample formula byte-free — a defect in the chunk walk,
    * little-endian sample packing or sign extension shifts the values.
    * Media with doc_id % 3 == 1 are the "audio" kind ([[mediaTable]]).
    */
  def audioStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"))
      .filter(col("doc_id") % 3 === 1)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val sr = 8000 + ((id % 4) * 4000).toInt
          val ch = (id % 2).toInt + 1
          val nFrames = (id % 50).toInt + 10
          val samples = Array.tabulate(nFrames * ch)(i =>
            ((id * 31 + 7L * i * i) % 65536).toInt - 32768)
          val bytes = Wav.encode(sr, ch, samples)
          val pcm = Wav.decode(bytes)
            .getOrElse(sys.error(s"undecodable WAV for media $id"))
          var peak = 0
          var energy = 0L
          var zc = 0L
          var i = 0
          while (i < pcm.samples.length) {
            val v = pcm.samples(i)
            peak = math.max(peak, math.abs(v))
            energy += v.toLong * v
            if (i > 0 && (v >= 0) != (pcm.samples(i - 1) >= 0)) zc += 1
            i += 1
          }
          (id, pcm.sampleRate, pcm.channels,
            pcm.samples.length / pcm.channels, peak, energy, zc)
        }
      }.toDF("media_id", "sample_rate", "channels", "n_frames",
        "peak_abs", "energy", "zero_cross")
      .orderBy("media_id")
  }

  def audioStatsSql(): String =
    s"""WITH au AS (
       |  SELECT doc_id AS media_id,
       |    8000 + (doc_id % 4) * 4000 AS sr,
       |    doc_id % 2 + 1 AS ch,
       |    doc_id % 50 + 10 AS nf
       |  FROM documents WHERE doc_id % 3 = 1),
       |s AS (
       |  SELECT media_id, sr, ch, nf, i,
       |    (media_id * 31 + 7 * i * i) % 65536 - 32768 AS v
       |  FROM au, unnest(range(0, nf * ch)) AS t(i)),
       |f AS (
       |  SELECT media_id, sr, ch, nf, v,
       |    lag(v) OVER (PARTITION BY media_id ORDER BY i) AS pv
       |  FROM s)
       |SELECT media_id,
       |  CAST(sr AS INT) AS sample_rate, CAST(ch AS INT) AS channels,
       |  CAST(nf AS INT) AS n_frames,
       |  CAST(max(abs(v)) AS INT) AS peak_abs,
       |  CAST(sum(v * v) AS BIGINT) AS energy,
       |  CAST(sum(CASE WHEN pv IS NOT NULL AND ((v >= 0) <> (pv >= 0))
       |           THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross
       |FROM f GROUP BY media_id, sr, ch, nf ORDER BY media_id""".stripMargin

  /** Compressed-audio HEADER metadata through the real [[Mp3]] frame walk:
    * formula-parameterized VBR MPEG-1 Layer III streams (per-frame bitrate
    * index and padding vary, an ID3v2 tag prefixes the frames) are encoded
    * to actual bytes, then [[Mp3.parse]] re-derives every reported column
    * by walking sync words and hopping computed frame lengths — the
    * duration / bitrate / frame-count readout a curation pipeline gates
    * compressed audio on WITHOUT a codec binding (the header tier the
    * H.264-free video path established). The DuckDB oracle recomputes the
    * same columns byte-free from the generating formula, so any defect in
    * the frame-length hop, syncsafe ID3 size or table lookup shifts a
    * value. Media with doc_id % 3 == 1 are the "audio" kind.
    */
  def mp3Meta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"))
      .filter(col("doc_id") % 3 === 1)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          // (id/3)%3, NOT id%3: media ids are already the id%3==1 residue,
          // so id%3 would pin every stream to one sample-rate table entry
          val srIdx = ((id / 3) % 3).toInt
          val chMode = (id % 4).toInt
          val nFrames = (id % 40).toInt + 5
          val id3Payload = (id % 100).toInt + 10
          val bytes = Mp3.encode(srIdx, chMode,
            f => 1 + ((id * 7 + f * 3L) % 14).toInt,
            f => ((id + f) % 2).toInt,
            nFrames, id3Payload)
          val info = Mp3.parse(bytes)
            .getOrElse(sys.error(s"unparseable MP3 stream for media $id"))
          (id, info.nFrames, info.sampleRate,
            info.nFrames.toLong * Mp3.SamplesPerFrame * 1000L / info.sampleRate,
            info.sumKbps / info.nFrames, info.chMode,
            info.nBytes.toLong, info.id3Bytes.toLong)
        }
      }.toDF("media_id", "n_frames", "sample_rate", "duration_ms",
        "kbps_avg", "ch_mode", "n_bytes", "id3_bytes")
      .orderBy("media_id")
  }

  def mp3MetaSql: String =
    s"""WITH au AS (
       |  SELECT doc_id AS media_id,
       |    (doc_id // 3) % 3 AS sri, doc_id % 4 AS ch_mode,
       |    doc_id % 40 + 5 AS nf, doc_id % 100 + 10 AS id3
       |  FROM documents WHERE doc_id % 3 = 1),
       |fr AS (
       |  SELECT media_id, sri, ch_mode, nf, id3, f,
       |    ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])[
       |      CAST(1 + (media_id * 7 + f * 3) % 14 AS INT)] AS kbps,
       |    (media_id + f) % 2 AS pad
       |  FROM au, unnest(range(0, nf)) AS t(f)),
       |fl AS (
       |  SELECT media_id, sri, ch_mode, nf, id3,
       |    sum(144 * (kbps * 1000)
       |        // ([44100,48000,32000])[CAST(sri + 1 AS INT)] + pad)
       |      AS frame_bytes,
       |    sum(kbps) AS sum_kbps
       |  FROM fr GROUP BY media_id, sri, ch_mode, nf, id3)
       |SELECT media_id,
       |  CAST(nf AS INT) AS n_frames,
       |  CAST(([44100,48000,32000])[CAST(sri + 1 AS INT)] AS INT) AS sample_rate,
       |  CAST(nf * 1152 * 1000
       |       // ([44100,48000,32000])[CAST(sri + 1 AS INT)] AS BIGINT)
       |    AS duration_ms,
       |  CAST(sum_kbps // nf AS BIGINT) AS kbps_avg,
       |  CAST(ch_mode AS INT) AS ch_mode,
       |  CAST(10 + id3 + frame_bytes AS BIGINT) AS n_bytes,
       |  CAST(10 + id3 AS BIGINT) AS id3_bytes
       |FROM fl ORDER BY media_id""".stripMargin

  /** Compressed-audio SIDE-INFO metadata through the real
    * [[Mp3.parseSideInfo]] bit walk — the honest tier above
    * [[mp3Meta]]'s header hop (r17 VERDICT prescription #8): the same
    * formula-parameterized streams now carry REAL ISO 11172-3 side-info
    * blocks (written bit-exact by [[Mp3.encode]]), and the walk reads
    * main_data_begin plus per-granule-channel part2_3_length /
    * big_values / global_gain back out of the bytes. The report is what
    * an audio-curation gate reads without a sample decode: the
    * global_gain envelope (loudness proxy), total Huffman payload bits,
    * and whether the stream uses the bit reservoir. The DuckDB oracle
    * recomputes every column byte-free from the [[Mp3.gcFields]]
    * generator formula, so any defect in the bit offsets, the
    * granule-channel stride, or the mono/stereo block length shifts a
    * value.
    */
  def mp3SideInfo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"))
      .filter(col("doc_id") % 3 === 1)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val srIdx = ((id / 3) % 3).toInt
          val chMode = (id % 4).toInt
          val nFrames = (id % 40).toInt + 5
          val id3Payload = (id % 100).toInt + 10
          val bytes = Mp3.encode(srIdx, chMode,
            f => 1 + ((id * 7 + f * 3L) % 14).toInt,
            f => ((id + f) % 2).toInt,
            nFrames, id3Payload)
          val si = Mp3.parseSideInfo(bytes)
            .getOrElse(sys.error(s"unparseable MP3 side info for media $id"))
          (id, si.nGc, si.sumPart23, si.minGain, si.maxGain,
            si.sumBigValues, si.maxMainDataBegin)
        }
      }.toDF("media_id", "n_gc", "sum_part23_bits", "min_gain", "max_gain",
        "sum_big_values", "max_mdb")
      .orderBy("media_id")
  }

  def mp3SideInfoSql: String =
    s"""WITH au AS (
       |  SELECT doc_id AS media_id,
       |    doc_id % 4 AS ch_mode, doc_id % 40 + 5 AS nf
       |  FROM documents WHERE doc_id % 3 = 1),
       |gc AS (
       |  SELECT media_id,
       |    CASE WHEN ch_mode = 3 THEN 1 ELSE 2 END AS n_ch,
       |    f, g, c,
       |    CAST(1 + (media_id * 7 + f * 3) % 14 AS INT) AS bi
       |  FROM au,
       |    unnest(range(0, nf)) AS tf(f),
       |    unnest(range(0, 2)) AS tg(g),
       |    unnest(range(0, 2)) AS tc(c)
       |  WHERE c < CASE WHEN ch_mode = 3 THEN 1 ELSE 2 END),
       |fields AS (
       |  SELECT media_id,
       |    64 + (bi * 29 + f * 11 + g * 5 + c * 2) %
       |      least(320,
       |        (3 * ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])[bi]
       |         - 36) * 2 - 64) AS p23,
       |    (bi * 17 + f * 5 + g + c) % 289 AS bigv,
       |    32 + (bi * 13 + f * 7 + g * 3 + c) % 200 AS gain
       |  FROM gc)
       |SELECT media_id,
       |  CAST(count(*) AS INT) AS n_gc,
       |  CAST(sum(p23) AS BIGINT) AS sum_part23_bits,
       |  CAST(min(gain) AS INT) AS min_gain,
       |  CAST(max(gain) AS INT) AS max_gain,
       |  CAST(sum(bigv) AS BIGINT) AS sum_big_values,
       |  0 AS max_mdb
       |FROM fields GROUP BY media_id ORDER BY media_id""".stripMargin

  /** Acoustic fingerprint of one audio clip — the audio twin of [[dhashOf]],
    * in the Haitsma–Kalker energy-difference family (ISMIR 2002, public):
    * 64 frames × 16 samples, bit f = (E[f+1] > E[f]) over per-frame
    * energies, packed into a non-negative 63-bit BIGINT so both engines
    * agree. The pipeline is REAL end to end: formula samples →
    * [[Wav.encode]] to RIFF/WAVE bytes → [[Wav.decode]] (actual chunk walk
    * + sign extension) → energies over the DECODED samples.
    *
    * Family structure mirrors the image tier: half the clips share a base
    * signal (`g = id % 25`), half are unique (`g = 100 + id`); each member
    * shifts ONE frame's samples by `(id % 11) * 2048` (mod-wrapped into
    * 16-bit range) — same clip re-leveled, the re-encoded/re-mastered copy
    * an audio corpus dedups. Quadratic `g`-entangled terms (`11g²`,
    * `7gi`, `5g·frame²`) give distinct groups pseudo-random energy-slope
    * patterns; measured at sf0.1 (1,667 clips): family hamming ≤ 4,
    * cross-group ≥ 10, zero accidental pairs at the ≤ 6 threshold.
    */
  private[graft] def audioFpOf(id: Long): Long = {
    val fam = (id / 3) % 2 == 0
    val g = if (fam) id % 25 else 100 + id
    val f0 = ((id / 25) % 64).toInt
    val delta = ((id % 11) * 2048).toInt
    val samples = Array.tabulate(1024) { i =>
      val f = i / 16
      val x = ((11L * g * g + 37L * g + 13L * i * i + 7L * g * i +
        5L * g * f * f) % 65536L).toInt - 32768
      if (f == f0) ((x + 32768 + delta) % 65536) - 32768 else x
    }
    val bytes = Wav.encode(16000, 1, samples)
    val pcm = Wav.decode(bytes)
      .getOrElse(sys.error(s"undecodable WAV for media $id"))
    var hash = 0L
    var prev = 0L
    var f = 0
    while (f < 64) {
      var e = 0L
      var j = 0
      while (j < 16) {
        val v = pcm.samples(f * 16 + j); e += v.toLong * v; j += 1
      }
      if (f > 0 && e > prev) hash |= 1L << (f - 1)
      prev = e
      f += 1
    }
    hash
  }

  /** (media_id, afp) — every audio clip fingerprinted through the real
    * WAV round-trip. Media with doc_id % 3 == 1 are the "audio" kind.
    */
  def audioFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"))
      .filter(col("doc_id") % 3 === 1)
      .as[Long]
      .mapPartitions(_.map(id => (id, audioFpOf(id))))
      .toDF("media_id", "afp")
  }

  private def sharedAudioFps(spark: SparkSession, dir: String): DataFrame =
    graft.SharedRel(spark, s"afp|$dir", graft.Materialize.Local)(
      audioFingerprint(spark, dir))

  /** Audio near-duplicate pairs — the [[imageNearDup]] machinery pointed at
    * the acoustic fingerprint: 8×8-bit hamming-banded LSH candidates,
    * exact popcount verify, pigeonhole-lossless at `maxDist` < 8 so the
    * all-pairs DuckDB oracle is exact. No all-pairs path on the Spark side.
    */
  def audioNearDup(spark: SparkSession, dir: String, maxDist: Int = 6): DataFrame =
    hammingPairs(sharedAudioFps(spark, dir)
        .select(col("media_id").as("id"), col("afp").as("dhash")), maxDist)
      .orderBy("id_a", "id_b")

  /** Shared analytic fingerprint recompute (no codec — the formulas;
    * exact because WAV PCM is lossless end to end).
    */
  private def audioFpSql: String =
    """WITH au AS (
      |  SELECT doc_id AS media_id,
      |    CASE WHEN (doc_id // 3) % 2 = 0 THEN doc_id % 25
      |         ELSE 100 + doc_id END AS g,
      |    (doc_id // 25) % 64 AS f0,
      |    (doc_id % 11) * 2048 AS delta
      |  FROM documents WHERE doc_id % 3 = 1),
      |s AS (
      |  SELECT media_id, t.i // 16 AS f,
      |    CASE WHEN t.i // 16 = f0
      |      THEN ((11*g*g + 37*g + 13*t.i*t.i + 7*g*t.i
      |             + 5*g*(t.i//16)*(t.i//16)) % 65536 + delta) % 65536 - 32768
      |      ELSE (11*g*g + 37*g + 13*t.i*t.i + 7*g*t.i
      |            + 5*g*(t.i//16)*(t.i//16)) % 65536 - 32768
      |    END AS v
      |  FROM au, unnest(range(0, 1024)) AS t(i)),
      |fe AS (SELECT media_id, f, sum(v * v) AS e FROM s GROUP BY 1, 2),
      |abits AS (
      |  SELECT a.media_id, a.f - 1 AS pos,
      |    CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
      |  FROM fe a JOIN fe b ON a.media_id = b.media_id AND b.f = a.f - 1
      |  WHERE a.f >= 1),
      |afps AS (
      |  SELECT media_id, CAST(sum(bit * (1::BIGINT << pos)) AS BIGINT) AS afp
      |  FROM abits GROUP BY media_id)""".stripMargin

  def audioFingerprintSql: String =
    s"""$audioFpSql
       |SELECT media_id, afp FROM afps ORDER BY media_id""".stripMargin

  /** Oracle: plain all-pairs popcount ≤ maxDist — identical to the banded
    * result by the pigeonhole argument in [[imageNearDup]].
    */
  def audioNearDupSql(maxDist: Int = 6): String =
    s"""$audioFpSql
       |SELECT a.media_id AS id_a, b.media_id AS id_b,
       |  CAST(bit_count(xor(a.afp, b.afp)) AS INT) AS hamming
       |FROM afps a JOIN afps b ON a.media_id < b.media_id
       |WHERE bit_count(xor(a.afp, b.afp)) <= $maxDist
       |ORDER BY id_a, id_b""".stripMargin

  /** Incremental audio dedup — the acoustic twin of [[imageDedupIncr]],
    * completing the per-modality daily-arrival family (text
    * `dedupIncrement`, image `imageDedupIncr`, vector `semDedupIncr`):
    * classify today's clip intake (salted `inc:` split, the shared
    * unbiased-arrival contract) against the frozen base fingerprint index
    * — 8 bytes per clip at production scale, never recomputed per
    * increment. Delta clips whose fingerprint is within `maxDist` of any
    * base clip drop as `dup_of_base`; else within `maxDist` of a
    * smaller-id delta clip as `dup_in_increment`; else `kept`. Both
    * near-joins run through the banded [[hammingJoin]] — no all-pairs
    * path, O(delta) per day.
    */
  def audioDedupIncr(spark: SparkSession, dir: String, deltaMod: Int = 3,
                     maxDist: Int = 6): DataFrame = {
    val isDelta = pmod(graft.Exprs.hex60(
      concat(lit("inc:"), col("media_id").cast("string"))), lit(deltaMod)) === 0
    val fps = sharedAudioFps(spark, dir)
    val base = fps.filter(!isDelta).select(col("media_id").as("id"), col("afp").as("dhash"))
    val delta = fps.filter(isDelta).select(col("media_id").as("id"), col("afp").as("dhash"))
    val ofBase = hammingJoin(delta, base, maxDist, (_, _) => lit(true))
      .select(col("id_a").as("id")).distinct().withColumn("ob", lit(1))
    val inDelta = hammingPairs(delta, maxDist)
      .select(col("id_b").as("id")).distinct().withColumn("od", lit(1))
    delta
      .join(ofBase, Seq("id"), "left")
      .join(inDelta, Seq("id"), "left")
      .select(col("id").as("media_id"), col("dhash").as("afp"),
        when(col("ob") === 1, "dup_of_base")
          .when(col("od") === 1, "dup_in_increment")
          .otherwise("kept").as("drop_reason"))
      .withColumn("keep", col("drop_reason") === "kept")
      .select("media_id", "afp", "keep", "drop_reason")
      .orderBy("media_id")
  }

  /** Oracle: analytic fingerprint recompute + all-pairs popcount joins —
    * equivalent to the banded engine path by the pigeonhole argument.
    */
  def audioDedupIncrSql(deltaMod: Int = 3, maxDist: Int = 6): String =
    s"""$audioFpSql,
       |tag AS (
       |  SELECT media_id, afp,
       |    ${graft.Exprs.hex60Sql("'inc:' || media_id::VARCHAR")} % $deltaMod = 0 AS is_delta
       |  FROM afps),
       |base AS (SELECT * FROM tag WHERE NOT is_delta),
       |delta AS (SELECT * FROM tag WHERE is_delta),
       |ofbase AS (
       |  SELECT DISTINCT d.media_id FROM delta d JOIN base b
       |    ON bit_count(xor(d.afp, b.afp)) <= $maxDist),
       |indelta AS (
       |  SELECT DISTINCT d.media_id FROM delta d JOIN delta e
       |    ON e.media_id < d.media_id AND bit_count(xor(d.afp, e.afp)) <= $maxDist)
       |SELECT d.media_id, d.afp, dr = 'kept' AS keep, dr AS drop_reason
       |FROM (
       |  SELECT d.media_id, d.afp,
       |    CASE WHEN ob.media_id IS NOT NULL THEN 'dup_of_base'
       |         WHEN ind.media_id IS NOT NULL THEN 'dup_in_increment'
       |         ELSE 'kept' END AS dr
       |  FROM delta d
       |  LEFT JOIN ofbase ob ON d.media_id = ob.media_id
       |  LEFT JOIN indelta ind ON d.media_id = ind.media_id) d
       |ORDER BY media_id""".stripMargin

  def pixelStatsPngSql(box: Int = 7): String =
    s"""WITH imgs AS (
       |  SELECT doc_id AS media_id,
       |    doc_id % 14 + 1 AS w, doc_id % 10 + 1 AS h
       |  FROM documents WHERE doc_id % 3 = 0),
       |dims AS (
       |  SELECT media_id, w, h,
       |    greatest((2 * w * $box + greatest(w, h)) // (2 * greatest(w, h)), 1) AS out_w,
       |    greatest((2 * h * $box + greatest(w, h)) // (2 * greatest(w, h)), 1) AS out_h
       |  FROM imgs),
       |px AS (
       |  SELECT media_id, out_w, out_h, x, y,
       |    (2 * x + 1) * w // (2 * out_w) AS sx,
       |    (2 * y + 1) * h // (2 * out_h) AS sy
       |  FROM dims, unnest(range(0, out_w)) AS tx(x), unnest(range(0, out_h)) AS ty(y))
       |SELECT media_id,
       |  CAST(out_w AS INT) AS out_w, CAST(out_h AS INT) AS out_h,
       |  CAST(sum((3 * ((media_id + 11 * sx + 3 * sy) % 256)
       |        + 2 * ((sx * sy + 2 * media_id) % 256)
       |        + ((2 * sx + 5 * sy) % 256)) * (x + 1) * (y + 1)) AS BIGINT) AS px_check
       |FROM px GROUP BY media_id, out_w, out_h ORDER BY media_id""".stripMargin

  /** Perceptual dHash over the decoded-pixel relation — the image twin of
    * the text tier's fingerprints. Families of NEAR-duplicate images are
    * synthesized on purpose (no image bytes exist in the testdata): group
    * `g = media_id % 25` fixes the base image (dims and pixel formulas
    * with group-dependent gradients, so distinct groups hash far apart),
    * and each member perturbs ONE pixel's red channel by `media_id % 11`
    * — byte-level different, perceptually near-identical, exactly the
    * recompressed/re-watermarked copies a 100 TB image corpus dedups.
    *
    * The pipeline per image is REAL: formula pixels → [[Bmp.encode]] →
    * [[Bmp.decode]] (actual codec round-trip) → [[Bmp.resizeNearest]] to
    * the canonical 9×8 thumbnail → integer luma (299r+587g+114b)/1000 →
    * 63 horizontal gradient-sign bits (8 rows × 8 comparisons, minus the
    * last so the pack stays inside a non-negative BIGINT on both
    * engines). The DuckDB oracle recomputes the hash from the formulas
    * alone — a defect anywhere in codec, resize, or bit packing shifts
    * it.
    */
  def perceptualHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"))
      .filter(col("doc_id") % 3 === 0)
      .as[Long]
      .mapPartitions(_.map(id => (id, dhashOf(id))))
      .toDF("media_id", "dhash")
  }

  /** The per-image synthesize→encode→decode→resize→hash pipeline, shared
    * verbatim by the batch [[perceptualHash]] and the streaming
    * [[graft.streaming.ImageDedupStream]] so the two tiers cannot drift.
    */
  private[graft] def dhashOf(id: Long): Long = {
    // HALF the images are family members (g = id % 25 picks one of 25
    // shared base images), half are UNIQUE (g = 100 + id, their own
    // texture): a real corpus is mostly singletons with duplicate
    // families mixed in, and the increment operator needs genuinely-new
    // content to ever classify anything `kept`
    val fam = (id / 3) % 2 == 0
    val g = if (fam) id % 25 else 100 + id
    dhashImage(g, id / 25, id % 11, id / 7, id % 13)
  }

  /** Core synthesize→encode→decode→resize→hash of ONE image: base texture
    * fixed by `g`, two channel nudges parameterized by the caller —
    * [[dhashOf]] seeds them from the image id, [[frameHash]] from the
    * video id (so same-texture frames across videos are near, not
    * byte-equal).
    */
  private def dhashImage(g0: Long, pSeed1: Long, delta1: Long,
                         pSeed2: Long, delta2: Long): Long = {
    val g = g0.toInt
    val w = g % 6 + 10
    val h = g % 4 + 9
    val cr = 3 + g % 5
    val cg = 2 + g % 7
    val cb = 1 + g % 3
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        // QUADRATIC texture, not linear gradients: a linear ramp's
        // gradient-sign pattern is nearly group-independent (mod-256
        // wraparound aside), which collapsed cross-group hamming to
        // ~11 and made groups collide; the x², y², xy terms give each
        // group a pseudo-random sign pattern (measured: same-group
        // max 2 bits, cross-group min 18, zero cross pairs ≤ 6)
        rgb(p) = ((17L * g + cr.toLong * x * x + 11L * y * y + 7L * x * y) % 256).toByte
        rgb(p + 1) = ((3L * g + cg.toLong * x * y + 5L * x + 2L * y * y) % 256).toByte
        rgb(p + 2) = ((g + 2L * cb * x * x + 3L * y + cb.toLong * x * y) % 256).toByte
        x += 1
      }
      y += 1
    }
    // the member perturbation: one red and one green channel nudged —
    // the "same image, different bytes" family member (two pixels so
    // family hamming spans 0-4 bits, not degenerate all-0)
    val k = (pSeed1 % (w * h)).toInt
    rgb(k * 3) = (((rgb(k * 3) & 0xff) + delta1) % 256).toByte
    val k2 = (pSeed2 % (w * h)).toInt
    rgb(k2 * 3 + 1) = (((rgb(k2 * 3 + 1) & 0xff) + delta2) % 256).toByte
    val bytes = Bmp.encode(w, h, rgb)
    val (dw, dh, drgb) = Bmp.decode(bytes)
      .getOrElse(sys.error(s"undecodable BMP for texture $g"))
    val th = Bmp.resizeNearest(dw, dh, drgb, 9, 8)
    val gray = new Array[Int](9 * 8)
    var i = 0
    while (i < 72) {
      gray(i) = (299 * (th(i * 3) & 0xff) + 587 * (th(i * 3 + 1) & 0xff) +
        114 * (th(i * 3 + 2) & 0xff)) / 1000
      i += 1
    }
    var hash = 0L
    var yy = 0
    while (yy < 8) {
      var xx = 0
      while (xx < 8) {
        val pos = yy * 8 + xx
        if (pos < 63 && gray(yy * 9 + xx + 1) > gray(yy * 9 + xx))
          hash |= 1L << pos
        xx += 1
      }
      yy += 1
    }
    hash
  }

  /** Image near-duplicate pairs via hamming-banded LSH over [[perceptualHash]]
    * — the simhash banding pattern applied to the image tier: 8 bands of
    * 8 bits; candidates share ≥1 band; verify = exact popcount on the
    * 63-bit hashes. With `maxDist` < 8 bands the banding is PIGEONHOLE-
    * LOSSLESS (≤ maxDist differing bits dirty at most maxDist bands, so
    * ≥ 2 bands stay identical): the banded result EQUALS the all-pairs
    * result, which is exactly what the DuckDB oracle computes — no recall
    * tolerance in the compare. No all-pairs path exists on the Spark
    * side: candidates are generated only inside band buckets, pair output
    * is bounded by true near-dup cluster sizes (inherent to the
    * operator), and the verify filter is a projection.
    */
  /** Banded-candidate hamming pairs over an (`id`, `dhash`) relation —
    * shared by [[imageNearDup]] (image level) and [[imageDupClusters]]
    * (distinct-hash level).
    */
  private def bandsOf(rel: DataFrame): DataFrame =
    rel.select(col("id"), col("dhash"),
      explode(sequence(lit(0), lit(7))).as("band"))
      .withColumn("bv", expr("shiftright(dhash, band * 8)").bitwiseAND(lit(255L)))

  /** Banded candidates between two (`id`, `dhash`) relations under an id
    * predicate, verified by exact popcount — the one join shape behind
    * [[imageNearDup]] (self, `<`), [[imageDupClusters]] (distinct-hash
    * self, `<`) and [[imageDedupIncr]] (delta × base, unrestricted).
    */
  /** `dedup = false` skips the candidate-level distinct: a pair agreeing
    * on several bands then surfaces once per band (the popcount re-runs
    * per copy — one xor, cheap), which is correct whenever the CONSUMER
    * dedups at its own (coarser) key anyway — the video containment fold
    * dedups at (video, frame, video) — and saves a full shuffle of the
    * candidate multiset (guide §2.4). Pair-level outputs (imageNearDup
    * and friends) keep the dedup: their contract is one row per pair.
    */
  private def hammingJoin(a: DataFrame, b: DataFrame, maxDist: Int,
                          idPred: (Column, Column) => Column,
                          dedup: Boolean = true): DataFrame = {
    require(maxDist < 8, s"maxDist $maxDist >= 8 bands breaks pigeonhole-losslessness")
    val cand0 = bandsOf(a).as("a").join(bandsOf(b).as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          idPred(col("a.id"), col("b.id")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.dhash").as("ha"), col("b.dhash").as("hb"))
    val cand = if (dedup) cand0.distinct() else cand0
    cand.withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  private def hammingPairs(rel: DataFrame, maxDist: Int): DataFrame =
    hammingJoin(rel, rel, maxDist, _ < _)

  private def sharedHashes(spark: SparkSession, dir: String): DataFrame =
    graft.SharedRel(spark, s"phash|$dir", graft.Materialize.Local)(
      perceptualHash(spark, dir))

  def imageNearDup(spark: SparkSession, dir: String, maxDist: Int = 6): DataFrame =
    hammingPairs(sharedHashes(spark, dir).select(col("media_id").as("id"), col("dhash")),
        maxDist)
      .orderBy("id_a", "id_b")

  /** Cross-modal caption+image JOINT near-dup pairs — the LAION-style
    * pair-dedup a multimodal training corpus runs before contrastive
    * training: a (caption, image) PAIR is a duplicate of another only when
    * BOTH modalities agree — the images are perceptually near (banded
    * dHash hamming ≤ `maxDist`, exactly [[imageNearDup]]'s relation) AND
    * the captions are MinHash-near (agreement on ≥ `minAgree` of the 8
    * signature hashes, the same signature-space contract as the text
    * tier's `d_neardup_incr`). Same image with genuinely different
    * captions = two distinct supervision examples (keep both); same
    * caption on different images likewise. Only the doubly-duplicate
    * pairs are redundant.
    *
    * Scale shape: the STRICTER, CHEAPER modality prunes first — image
    * pairs come from the hamming-banded join over the session-shared
    * phash relation (bounded by true near-dup family sizes), and the
    * caption check then attaches 8 ints per side to that bounded pair
    * relation via two id equi-joins on the session-shared signature
    * table. No text-side candidate generation runs at all, and no array
    * or text payload ever reaches the pair relation.
    */
  def captionDup(spark: SparkSession, dir: String, maxDist: Int = 6,
                 minAgree: Int = 7): DataFrame = {
    val ms = (0 until 8).map(i => s"m$i")
    val sig = graft.functions.TextOps.bandedSignatures(spark, dir)
    def side(suffix: String): DataFrame =
      sig.select(col("doc_id").as(s"id$suffix") +:
        ms.map(m => col(m).as(s"$m$suffix")): _*)
    val nAgreeE = ms.map(m =>
      (col(s"${m}_a") === col(s"${m}_b")).cast("int")).reduce(_ + _)
    imageNearDup(spark, dir, maxDist)
      .join(side("_a"), "id_a").join(side("_b"), "id_b")
      .withColumn("n_agree", nAgreeE)
      .filter(col("n_agree") >= minAgree)
      .select(col("id_a"), col("id_b"), col("hamming"), col("n_agree"))
      .orderBy(col("id_a"), col("id_b"))
  }

  def captionDupSql(maxDist: Int = 6, minAgree: Int = 7): String = {
    val agree = (0 until 8).map(i => s"CAST(sa.m$i = sb.m$i AS INT)").mkString(" + ")
    s"""$dhashBitsSql,
       |hams AS (
       |  SELECT a.media_id AS id_a, b.media_id AS id_b,
       |    CAST(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS INT) AS hamming
       |  FROM bits a JOIN bits b
       |    ON a.pos = b.pos AND a.media_id < b.media_id
       |  GROUP BY 1, 2),
       |sig AS (
       |  ${graft.functions.TextOps.minhashSigSqlInner})
       |SELECT h.id_a, h.id_b, h.hamming, ($agree) AS n_agree
       |FROM hams h
       |JOIN sig sa ON sa.doc_id = h.id_a
       |JOIN sig sb ON sb.doc_id = h.id_b
       |WHERE h.hamming <= $maxDist AND ($agree) >= $minAgree
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Caption–image consistency gate — the alt-text/boilerplate cut every
    * image-text corpus runs, and the COMPLEMENT of [[captionDup]]'s joint
    * verdict: pairs whose captions are MinHash-near (≥ `minAgree` of 8
    * signature hashes — the text tier's near-dup contract) but whose
    * images are NOT perceptually near (banded dHash hamming > `maxDist`).
    * A caption recycled across unrelated images is navigation chrome,
    * SEO spam, or a template alt-text — supervision noise for contrastive
    * training, where [[captionDup]]'s doubly-duplicate pairs are merely
    * redundant. Pure composition of the two session-shared relations.
    *
    * Scale shape: here the CAPTION side generates candidates (the
    * opposite pruning order from [[captionDup]] — the surviving modality
    * must drive): the banded-signature self-join over image docs
    * (bounded LSH bucket fan-out), agreement verified as 8 int
    * comparisons, and the image check is a popcount PROJECTION on the
    * two dhashes already attached to the pair — no image-side candidate
    * generation at all.
    */
  def captionMismatch(spark: SparkSession, dir: String, maxDist: Int = 6,
                      minAgree: Int = 7): DataFrame = {
    val ms = (0 until 8).map(i => s"m$i")
    val sig = graft.functions.TextOps.bandedSignatures(spark, dir)
    val msig = sig.join(
      sharedHashes(spark, dir).withColumnRenamed("media_id", "doc_id"), "doc_id")
    def pairCols = col("a.doc_id").as("id_a") +: col("b.doc_id").as("id_b") +:
      col("a.dhash").as("ha") +: col("b.dhash").as("hb") +:
      ms.flatMap(m => Seq(col(s"a.$m").as(s"${m}_a"), col(s"b.$m").as(s"${m}_b")))
    val j1 = msig.as("a").join(msig.as("b"),
        col("a.band1") === col("b.band1") && col("a.doc_id") < col("b.doc_id"))
      .select(pairCols: _*)
    val j2 = msig.as("a").join(msig.as("b"),
        col("a.band2") === col("b.band2") && col("a.band1") =!= col("b.band1") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(pairCols: _*)
    val nAgreeE = ms.map(m =>
      (col(s"${m}_a") === col(s"${m}_b")).cast("int")).reduce(_ + _)
    j1.unionAll(j2)
      .withColumn("n_agree", nAgreeE)
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("n_agree") >= minAgree && col("hamming") > maxDist)
      .select(col("id_a"), col("id_b"), col("n_agree"), col("hamming"))
      .orderBy(col("id_a"), col("id_b"))
  }

  def captionMismatchSql(maxDist: Int = 6, minAgree: Int = 7): String = {
    val agree = (0 until 8).map(i => s"CAST(a.m$i = b.m$i AS INT)").mkString(" + ")
    s"""$dhashBitsSql,
       |ph AS (
       |  SELECT media_id, CAST(sum(bit * (1::BIGINT << pos)) AS BIGINT) AS dhash
       |  FROM bits GROUP BY media_id),
       |hams AS (
       |  SELECT a.media_id AS id_a, b.media_id AS id_b,
       |    CAST(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS INT) AS hamming
       |  FROM bits a JOIN bits b
       |    ON a.pos = b.pos AND a.media_id < b.media_id
       |  GROUP BY 1, 2),
       |sig AS (
       |  ${graft.functions.TextOps.minhashSigSqlInner}),
       |msig AS (
       |  SELECT sig.*,
       |    m0 || ',' || m1 || ',' || m2 || ',' || m3 AS band1,
       |    m4 || ',' || m5 || ',' || m6 || ',' || m7 AS band2
       |  FROM sig JOIN ph ON sig.doc_id = ph.media_id),
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, ($agree) AS n_agree
       |  FROM msig a JOIN msig b ON a.band1 = b.band1 AND a.doc_id < b.doc_id
       |  UNION ALL
       |  SELECT a.doc_id, b.doc_id, ($agree)
       |  FROM msig a JOIN msig b
       |    ON a.band2 = b.band2 AND a.band1 <> b.band1 AND a.doc_id < b.doc_id)
       |SELECT c.id_a, c.id_b, c.n_agree, h.hamming
       |FROM cand c JOIN hams h ON h.id_a = c.id_a AND h.id_b = c.id_b
       |WHERE c.n_agree >= $minAgree AND h.hamming > $maxDist
       |ORDER BY c.id_a, c.id_b""".stripMargin
  }

  /** Incremental JOINT caption+image dedup — the frozen-index daily form
    * of [[captionDup]], completing the incremental matrix for the
    * cross-modal pair relation (text / image / audio / video / vector all
    * have one; this is the (caption, image) PAIR's): each DELTA pair
    * (salted `inc:` split on the media id, the shared arrival contract)
    * is classified against the FROZEN base pair index and smaller-id
    * delta pairs — a pair duplicates another only when BOTH modalities
    * agree (banded dHash hamming ≤ `maxDist` AND ≥ `minAgree`-of-8
    * MinHash agreement, exactly the batch operator's joint criterion) —
    * as `dup_of_base` / `dup_in_increment` / `kept` with min-id lineage.
    *
    * Scale shape: image candidates from the hamming-banded join (delta ×
    * base and delta × delta, never all-pairs), caption check attached as
    * 8 ints per side from the session-shared signature table, one
    * min-agg per verdict class. The frozen index is 8 bytes of dHash +
    * 10 ints of signature per admitted pair.
    */
  def captionDupIncr(spark: SparkSession, dir: String, deltaMod: Int = 5,
                     maxDist: Int = 6, minAgree: Int = 7): DataFrame = {
    import graft.functions.TextOps
    val ms = (0 until 8).map(i => s"m$i")
    val sig = TextOps.bandedSignatures(spark, dir)
    val hashes = sharedHashes(spark, dir)
      .join(sig.select(col("doc_id").as("media_id") +:
        ms.map(m => col(m)): _*), "media_id")
      .withColumn("is_delta", pmod(graft.Exprs.hex60(
        concat(lit("inc:"), col("media_id").cast("string"))), lit(deltaMod)) === 0)
    def side(suffix: String)(d: DataFrame): DataFrame =
      d.select(col("media_id").as(s"id$suffix") +: col("dhash").as(s"h$suffix") +:
        ms.map(m => col(m).as(s"$m$suffix")): _*)
    val delta = side("")(hashes.filter(col("is_delta")))
    val base = side("_b")(hashes.filter(!col("is_delta")))
    val agreeE = ms.map(m => (col(s"$m") === col(s"${m}_b")).cast("int")).reduce(_ + _)
    def witnesses(right: DataFrame, pred: Column): DataFrame =
      hammingJoin(
        delta.select(col("id"), col("h").as("dhash")),
        right.select(col("id_b").as("id"), col("h_b").as("dhash")),
        maxDist, (a, b) => lit(true))
        .select(col("id_a").as("id"), col("id_b"))
        .join(delta.select(col("id") +: ms.map(m => col(m)): _*), "id")
        .join(right.select(col("id_b") +: ms.map(m => col(s"${m}_b")): _*), "id_b")
        .filter(agreeE >= minAgree && pred)
    val ofBase = witnesses(base, lit(true))
      .groupBy("id").agg(min("id_b").as("dup_of_b"))
    val inDelta = witnesses(side("_b")(hashes.filter(col("is_delta"))),
      col("id_b") < col("id"))
      .groupBy("id").agg(min("id_b").as("dup_in_d"))
    delta.select(col("id"))
      .join(ofBase, Seq("id"), "left")
      .join(inDelta, Seq("id"), "left")
      .select(col("id").as("media_id"),
        (col("dup_of_b").isNull && col("dup_in_d").isNull).as("keep"),
        when(col("dup_of_b").isNotNull, "dup_of_base")
          .when(col("dup_in_d").isNotNull, "dup_in_increment")
          .otherwise("kept").as("drop_reason"),
        coalesce(col("dup_of_b"), col("dup_in_d")).as("dup_of"))
      .orderBy("media_id")
  }

  def captionDupIncrSql(deltaMod: Int = 5, maxDist: Int = 6,
                        minAgree: Int = 7): String = {
    val agree = (0 until 8).map(i => s"CAST(sa.m$i = sb.m$i AS INT)").mkString(" + ")
    def arm(baseRel: String, pred: String): String =
      s"""SELECT d.media_id AS id, b.media_id AS id_b
         |  FROM hams hp
         |  JOIN delta d ON d.media_id = hp.id_a
         |  JOIN $baseRel b ON b.media_id = hp.id_b
         |  JOIN sig sa ON sa.doc_id = hp.id_a
         |  JOIN sig sb ON sb.doc_id = hp.id_b
         |  WHERE $agree >= $minAgree $pred
         |  UNION ALL
         |  SELECT d.media_id, b.media_id
         |  FROM hams hp
         |  JOIN delta d ON d.media_id = hp.id_b
         |  JOIN $baseRel b ON b.media_id = hp.id_a
         |  JOIN sig sa ON sa.doc_id = hp.id_b
         |  JOIN sig sb ON sb.doc_id = hp.id_a
         |  WHERE $agree >= $minAgree $pred""".stripMargin
    s"""$dhashBitsSql,
       |hams AS (
       |  SELECT a.media_id AS id_a, b.media_id AS id_b
       |  FROM bits a JOIN bits b ON a.pos = b.pos AND a.media_id < b.media_id
       |  GROUP BY 1, 2
       |  HAVING sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) <= $maxDist),
       |sig AS (
       |  ${graft.functions.TextOps.minhashSigSqlInner}),
       |split AS (
       |  SELECT media_id,
       |    (${graft.Exprs.hex60Sql("'inc:' || media_id::VARCHAR")} % $deltaMod) = 0
       |      AS is_delta
       |  FROM imgs0),
       |delta AS (SELECT media_id FROM split WHERE is_delta),
       |base AS (SELECT media_id FROM split WHERE NOT is_delta),
       |ofbase AS (
       |  SELECT id, min(id_b) AS dup_of_b FROM (
       |  ${arm("base", "")})
       |  GROUP BY id),
       |indelta AS (
       |  SELECT id, min(id_b) AS dup_in_d FROM (
       |  ${arm("delta", "AND b.media_id < d.media_id")})
       |  GROUP BY id)
       |SELECT d.media_id,
       |  (ob.dup_of_b IS NULL AND ind.dup_in_d IS NULL) AS keep,
       |  CASE WHEN ob.dup_of_b IS NOT NULL THEN 'dup_of_base'
       |       WHEN ind.dup_in_d IS NOT NULL THEN 'dup_in_increment'
       |       ELSE 'kept' END AS drop_reason,
       |  COALESCE(ob.dup_of_b, ind.dup_in_d) AS dup_of
       |FROM delta d
       |LEFT JOIN ofbase ob ON d.media_id = ob.id
       |LEFT JOIN indelta ind ON d.media_id = ind.id
       |ORDER BY d.media_id""".stripMargin
  }

  /** Image near-dup CLUSTERS — connected components over the verified
    * ≤ `maxDist` pair graph, each image labeled with its component's
    * min-id representative. Unlike the text tier (whose clusters are
    * banding-DEFINED, so it propagates over the band-bucket incidence
    * graph directly), image near-dup is verify-FILTERED: an 8-bit band
    * collision between unrelated thumbnails must NOT merge their
    * clusters, so components live on the verified pair graph.
    *
    * Scale shape, in propagation order: (1) EXACT collapse first —
    * `groupBy(dhash)` folds every byte-identical thumbnail family to one
    * node (hash-agg, map-side combinable; the overwhelming bulk of a real
    * dedup corpus — re-uploads and recompressions — collapses here), so
    * (2) the banded pair join and min-label propagation run on the
    * DISTINCT-hash relation, orders of magnitude smaller than the image
    * corpus, and (3) labels broadcast back to images through one join on
    * `dhash`. The propagation loop is the [[graft.functions.TextOps.dupClusters]]
    * machinery: one shuffle per round, lineage severed per round,
    * convergence counted by `Observation`, loud failure on non-convergence.
    */
  def imageDupClusters(spark: SparkSession, dir: String, maxDist: Int = 6,
                       mat: graft.Materialize = graft.Materialize.Local): DataFrame = {
    val hashes = sharedHashes(spark, dir)
    val groups = mat(hashes.groupBy("dhash").agg(min("media_id").as("id")))
    val pairs = hammingPairs(groups, maxDist).select("id_a", "id_b")
    val edges = mat(pairs.union(
      pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b"))))
    var labels = mat(groups.select(col("id"), col("id").as("label")))
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 25) {
      // min over neighbors' labels, then fold into own label
      val stepped = edges
        .join(labels.select(col("id").as("id_b"), col("label").as("nl")), "id_b")
        .groupBy(col("id_a").as("id")).agg(min(col("nl")).as("nbr_min"))
        .join(labels, Seq("id"), "right")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"),
          (coalesce(col("nbr_min"), col("label")) < col("label")).cast("long").as("chg"))
      val obs = org.apache.spark.sql.Observation()
      val next = mat(stepped.observe(obs, sum(col("chg")).as("changed")))
      changed = obs.get("changed").asInstanceOf[Long]
      labels = next.drop("chg")
      rounds += 1
    }
    require(changed == 0,
      s"imageDupClusters did not converge within $rounds rounds ($changed labels moving)")
    // both back-join relations are distinct-hash-sized — DECLARE the
    // broadcast: the checkpointed label relation carries no size stats,
    // so the planner would otherwise sort-merge the image corpus into it
    hashes.join(broadcast(groups.withColumnRenamed("id", "hash_rep")), "dhash")
      .join(broadcast(labels.select(col("id").as("hash_rep"), col("label"))), "hash_rep")
      .withColumn("cluster_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("label"))))
      .select(col("media_id"), col("label").as("cluster_rep"), col("cluster_size"))
      .orderBy(col("media_id"))
  }

  /** The image dedup APPLY — every image tagged keep/drop, exactly one
    * representative (the min-id label) kept per near-dup cluster; the
    * decision relation stays 3 columns however large the payloads are.
    */
  def imageDedupApply(spark: SparkSession, dir: String, maxDist: Int = 6): DataFrame =
    imageDupClusters(spark, dir, maxDist)
      .select(col("media_id"), col("cluster_rep"),
        (col("media_id") === col("cluster_rep")).as("keep"))

  /** Incremental image dedup — the image twin of
    * [[graft.functions.TextOps.dedupIncrement]], at the PERCEPTUAL level:
    * dedup today's image intake (the salted-hash delta split — the same
    * `inc:` salt as every other incremental operator here, so the delta
    * approximates real arrivals instead of a source-pure slice) against
    * the existing corpus WITHOUT touching the corpus itself. The base
    * side collapses to its dHash index (at production scale: the
    * persisted perceptual-hash table maintained across increments — 8
    * bytes per image); delta images near any base hash (≤ `maxDist`)
    * drop as `dup_of_base`, else near any SMALLER-id delta image as
    * `dup_in_increment` (for exact-hash groups this reduces to the text
    * tier's min-rep rule), else `kept`. Both near-joins run through the
    * banded [[hammingJoin]] — no all-pairs path.
    */
  def imageDedupIncr(spark: SparkSession, dir: String, deltaMod: Int = 3,
                     maxDist: Int = 6): DataFrame = {
    val isDelta = pmod(graft.Exprs.hex60(
      concat(lit("inc:"), col("media_id").cast("string"))), lit(deltaMod)) === 0
    val hashes = sharedHashes(spark, dir)
    val base = hashes.filter(!isDelta).select(col("media_id").as("id"), col("dhash"))
    val delta = hashes.filter(isDelta).select(col("media_id").as("id"), col("dhash"))
    val ofBase = hammingJoin(delta, base, maxDist, (_, _) => lit(true))
      .select(col("id_a").as("id")).distinct().withColumn("ob", lit(1))
    val inDelta = hammingPairs(delta, maxDist)
      .select(col("id_b").as("id")).distinct().withColumn("od", lit(1))
    delta
      .join(ofBase, Seq("id"), "left")
      .join(inDelta, Seq("id"), "left")
      .select(col("id").as("media_id"), col("dhash"),
        when(col("ob") === 1, "dup_of_base")
          .when(col("od") === 1, "dup_in_increment")
          .otherwise("kept").as("drop_reason"))
      .withColumn("keep", col("drop_reason") === "kept")
      .select("media_id", "dhash", "keep", "drop_reason")
      .orderBy("media_id")
  }

  /** Per-frame perceptual hash of one video frame: texture token
    * `t = (video % 15) * 4 + frame` — families of 15 share frame
    * textures, ADJACENT families overlap on their tail/head frames
    * (partial containment, like overlapping-cut re-edits) — with the
    * nudge seeded by the VIDEO id, so same-texture frames across videos
    * are near (≤ 3 bits measured), never byte-equal.
    */
  private[graft] def frameHash(videoId: Long, frame: Int): Long = {
    val t = (videoId % 15) * 4 + frame
    dhashImage(300 + t, videoId / 25, videoId % 11, videoId / 7, videoId % 13)
  }

  private[graft] def frameCount(videoId: Long): Int = (3 + videoId % 4).toInt

  /** (video_id, frame, dhash) — every frame of every video decoded and
    * hashed through the same real-codec pipeline as the image tier.
    */
  def videoFrameHashes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"))
      .filter(col("doc_id") % 3 === 2)
      .as[Long]
      .mapPartitions(_.flatMap { v =>
        (0 until frameCount(v)).iterator.map(f => (v, f, frameHash(v, f)))
      })
      .toDF("video_id", "frame", "dhash")
  }

  /** Video near-dup by FRAME containment — the video twin of the text
    * tier's segment containment: two videos are related in proportion to
    * how many of the first's sampled frames have a perceptual near-match
    * (≤ `maxDist`) anywhere in the second. Exactly the re-edit/re-upload
    * relation a 100 TB video corpus dedups on: trims, re-intros and
    * re-encodes keep most frames perceptually intact.
    *
    * Shape: frame hashes → banded frame-level candidate join (the SAME
    * [[hammingJoin]] machinery — no all-pairs over frames, let alone
    * videos) → distinct matched (video_a, frame_a, video_b) → count per
    * video pair / frames of a. `n_frames_a` is a row-local expression
    * (3 + id % 4), so no second scan or join fetches it.
    */
  def videoContainment(spark: SparkSession, dir: String, maxDist: Int = 6): DataFrame = {
    val frames = graft.SharedRel(spark, s"vframes|$dir", graft.Materialize.Local)(
      videoFrameHashes(spark, dir))
    // frame-level near matches BETWEEN videos (either direction of the
    // banded join, a<b ordering applied at the video level)
    val rel = frames.select(
      (col("video_id") * 16 + col("frame")).as("id"), col("dhash"))
    // dedup = false: the oriented fold below dedups at (video, frame,
    // video), so the banded join's pair-level distinct would be a
    // redundant shuffle of the full frame-candidate multiset
    val matches = hammingJoin(rel, rel, maxDist,
        (a, b) => floor(a / 16) =!= floor(b / 16), dedup = false)
      .select(floor(col("id_a") / 16).cast("long").as("va"),
        pmod(col("id_a"), lit(16)).as("fa"),
        floor(col("id_b") / 16).cast("long").as("vb"))
    // orient every match as (smaller video, its frame, larger video)
    val oriented = matches
      .select(least(col("va"), col("vb")).as("id_a"),
        when(col("va") < col("vb"), col("fa")).as("frame_a"),
        greatest(col("va"), col("vb")).as("id_b"))
      .filter(col("frame_a").isNotNull)
      .distinct()
    oriented.groupBy("id_a", "id_b")
      .agg(count(lit(1)).cast("int").as("n_shared"))
      .withColumn("n_frames_a", (lit(3) + pmod(col("id_a"), lit(4))).cast("int"))
      .withColumn("containment",
        round(col("n_shared") / col("n_frames_a"), 4))
      .select("id_a", "id_b", "n_frames_a", "n_shared", "containment")
      .orderBy("id_a", "id_b")
  }

  /** The shared analytic dHash recompute (no codec — the formulas): one
    * row per (media_id, bit position, bit). `gray` mirrors codec output
    * exactly because BMP is lossless and `resizeNearest` is pure integer
    * sampling arithmetic.
    */
  private def dhashBitsSql: String =
    """WITH imgs0 AS (
      |  SELECT doc_id AS media_id,
      |    CASE WHEN (doc_id // 3) % 2 = 0 THEN doc_id % 25
      |         ELSE 100 + doc_id END AS g
      |  FROM documents WHERE doc_id % 3 = 0),
      |imgs AS (
      |  SELECT media_id, g, g % 6 + 10 AS w, g % 4 + 9 AS h,
      |    3 + g % 5 AS cr, 2 + g % 7 AS cg, 1 + g % 3 AS cb,
      |    (media_id // 25) % ((g % 6 + 10) * (g % 4 + 9)) AS k,
      |    media_id % 11 AS delta,
      |    (media_id // 7) % ((g % 6 + 10) * (g % 4 + 9)) AS k2,
      |    media_id % 13 AS delta2
      |  FROM imgs0),
      |grid AS (
      |  SELECT media_id, g, cr, cg, cb, x, y,
      |    (2 * x + 1) * w // 18 AS sx, (2 * y + 1) * h // 16 AS sy,
      |    k % w AS px, k // w AS py, delta,
      |    k2 % w AS px2, k2 // w AS py2, delta2
      |  FROM imgs, unnest(range(0, 9)) AS tx(x), unnest(range(0, 8)) AS ty(y)),
      |gray AS (
      |  SELECT media_id, x, y,
      |    (299 * ((17 * g + cr * sx * sx + 11 * sy * sy + 7 * sx * sy
      |              + CASE WHEN sx = px AND sy = py THEN delta ELSE 0 END) % 256)
      |     + 587 * ((3 * g + cg * sx * sy + 5 * sx + 2 * sy * sy
      |              + CASE WHEN sx = px2 AND sy = py2 THEN delta2 ELSE 0 END) % 256)
      |     + 114 * ((g + 2 * cb * sx * sx + 3 * sy + cb * sx * sy) % 256)) // 1000 AS gy
      |  FROM grid),
      |bits AS (
      |  SELECT a.media_id, a.y * 8 + a.x AS pos,
      |    CASE WHEN b.gy > a.gy THEN 1 ELSE 0 END AS bit
      |  FROM gray a JOIN gray b
      |    ON a.media_id = b.media_id AND b.x = a.x + 1 AND b.y = a.y
      |  WHERE a.x < 8 AND a.y * 8 + a.x < 63)""".stripMargin

  def perceptualHashSql: String =
    s"""$dhashBitsSql
       |SELECT media_id, CAST(sum(bit * (1::BIGINT << pos)) AS BIGINT) AS dhash
       |FROM bits GROUP BY media_id ORDER BY media_id""".stripMargin

  /** Oracle: plain all-pairs popcount ≤ maxDist — identical to the banded
    * result by the pigeonhole argument in [[imageNearDup]].
    */
  def imageNearDupSql(maxDist: Int = 6): String =
    s"""$dhashBitsSql,
       |hams AS (
       |  SELECT a.media_id AS id_a, b.media_id AS id_b,
       |    CAST(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS INT) AS hamming
       |  FROM bits a JOIN bits b
       |    ON a.pos = b.pos AND a.media_id < b.media_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, hamming FROM hams
       |WHERE hamming <= $maxDist ORDER BY id_a, id_b""".stripMargin

  /** Shared oracle tail: transitive closure over the verified pair graph
    * (fixpoint reach vs the engine's exact-collapse + label propagation —
    * a genuinely different algorithm, like the text-tier cluster oracle).
    */
  private def imageClusterRepSql(maxDist: Int): String =
    s"""WITH RECURSIVE ${dhashBitsSql.stripPrefix("WITH ")},
       |hams AS (
       |  SELECT a.media_id AS id_a, b.media_id AS id_b,
       |    sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS hamming
       |  FROM bits a JOIN bits b
       |    ON a.pos = b.pos AND a.media_id < b.media_id
       |  GROUP BY 1, 2),
       |pairs AS (SELECT id_a, id_b FROM hams WHERE hamming <= $maxDist),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs),
       |nodes AS (SELECT DISTINCT media_id FROM bits),
       |reach(doc, r) AS (
       |  SELECT media_id, media_id FROM nodes
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc),
       |rep AS (SELECT doc, min(r) AS cluster_rep FROM reach GROUP BY doc)""".stripMargin

  def imageDupClustersSql(maxDist: Int = 6): String =
    s"""${imageClusterRepSql(maxDist)}
       |SELECT doc AS media_id, cluster_rep,
       |  count(*) OVER (PARTITION BY cluster_rep) AS cluster_size
       |FROM rep ORDER BY media_id""".stripMargin

  def imageDedupApplySql(maxDist: Int = 6): String =
    s"""${imageClusterRepSql(maxDist)}
       |SELECT doc AS media_id, cluster_rep, doc = cluster_rep AS keep
       |FROM rep ORDER BY media_id""".stripMargin

  /** Oracle: all-pairs popcount joins over the packed hashes (DuckDB
    * `xor`/`bit_count`) — equivalent to the banded engine path by the
    * same pigeonhole argument.
    */
  def imageDedupIncrSql(deltaMod: Int = 3, maxDist: Int = 6): String =
    s"""$dhashBitsSql,
       |hs AS (
       |  SELECT media_id, CAST(sum(bit * (1::BIGINT << pos)) AS BIGINT) AS dhash
       |  FROM bits GROUP BY media_id),
       |tag AS (
       |  SELECT media_id, dhash,
       |    ${graft.Exprs.hex60Sql("'inc:' || media_id::VARCHAR")} % $deltaMod = 0 AS is_delta
       |  FROM hs),
       |base AS (SELECT * FROM tag WHERE NOT is_delta),
       |delta AS (SELECT * FROM tag WHERE is_delta),
       |ofbase AS (
       |  SELECT DISTINCT d.media_id FROM delta d JOIN base b
       |    ON bit_count(xor(d.dhash, b.dhash)) <= $maxDist),
       |indelta AS (
       |  SELECT DISTINCT d.media_id FROM delta d JOIN delta e
       |    ON e.media_id < d.media_id AND bit_count(xor(d.dhash, e.dhash)) <= $maxDist)
       |SELECT d.media_id, d.dhash, dr = 'kept' AS keep, dr AS drop_reason
       |FROM (
       |  SELECT d.media_id, d.dhash,
       |    CASE WHEN ob.media_id IS NOT NULL THEN 'dup_of_base'
       |         WHEN ind.media_id IS NOT NULL THEN 'dup_in_increment'
       |         ELSE 'kept' END AS dr
       |  FROM delta d
       |  LEFT JOIN ofbase ob ON d.media_id = ob.media_id
       |  LEFT JOIN indelta ind ON d.media_id = ind.media_id) d
       |ORDER BY media_id""".stripMargin

  /** Shared analytic per-frame hash recompute (the video tier's
    * `dhashBitsSql` — same formula recompute as the image tier, keyed by
    * (video, frame)): CTE chain ending in `vh(video_id, frame, dhash)`.
    * The oracles built on it are plain all-pairs frame popcounts —
    * equivalent to the banded engine path by pigeonhole.
    */
  private def videoHashSql: String =
    """WITH vids AS (
       |  SELECT doc_id AS video_id, 3 + doc_id % 4 AS nf
       |  FROM documents WHERE doc_id % 3 = 2),
       |vf0 AS (
       |  SELECT video_id, t.frame,
       |    300 + (video_id % 15) * 4 + t.frame AS g
       |  FROM vids, unnest(range(0, nf)) AS t(frame)),
       |vf AS (
       |  SELECT video_id, frame, g, g % 6 + 10 AS w, g % 4 + 9 AS h,
       |    3 + g % 5 AS cr, 2 + g % 7 AS cg, 1 + g % 3 AS cb,
       |    (video_id // 25) % ((g % 6 + 10) * (g % 4 + 9)) AS k,
       |    video_id % 11 AS delta,
       |    (video_id // 7) % ((g % 6 + 10) * (g % 4 + 9)) AS k2,
       |    video_id % 13 AS delta2
       |  FROM vf0),
       |vgrid AS (
       |  SELECT video_id, frame, g, cr, cg, cb, x, y,
       |    (2 * x + 1) * w // 18 AS sx, (2 * y + 1) * h // 16 AS sy,
       |    k % w AS px, k // w AS py, delta,
       |    k2 % w AS px2, k2 // w AS py2, delta2
       |  FROM vf, unnest(range(0, 9)) AS tx(x), unnest(range(0, 8)) AS ty(y)),
       |vgray AS (
       |  SELECT video_id, frame, x, y,
       |    (299 * ((17 * g + cr * sx * sx + 11 * sy * sy + 7 * sx * sy
       |              + CASE WHEN sx = px AND sy = py THEN delta ELSE 0 END) % 256)
       |     + 587 * ((3 * g + cg * sx * sy + 5 * sx + 2 * sy * sy
       |              + CASE WHEN sx = px2 AND sy = py2 THEN delta2 ELSE 0 END) % 256)
       |     + 114 * ((g + 2 * cb * sx * sx + 3 * sy + cb * sx * sy) % 256)) // 1000 AS gy
       |  FROM vgrid),
       |vbits AS (
       |  SELECT a.video_id, a.frame, a.y * 8 + a.x AS pos,
       |    CASE WHEN b.gy > a.gy THEN 1 ELSE 0 END AS bit
       |  FROM vgray a JOIN vgray b
       |    ON a.video_id = b.video_id AND a.frame = b.frame
       |    AND b.x = a.x + 1 AND b.y = a.y
       |  WHERE a.x < 8 AND a.y * 8 + a.x < 63),
       |vh AS (
       |  SELECT video_id, frame,
       |    CAST(sum(bit * (1::BIGINT << pos)) AS BIGINT) AS dhash
       |  FROM vbits GROUP BY 1, 2)""".stripMargin

  def videoContainmentSql(maxDist: Int = 6): String =
    s"""$videoHashSql,
       |fmatch AS (
       |  SELECT DISTINCT a.video_id AS id_a, a.frame AS frame_a,
       |    b.video_id AS id_b
       |  FROM vh a JOIN vh b
       |    ON a.video_id < b.video_id
       |    AND bit_count(xor(a.dhash, b.dhash)) <= $maxDist)
       |SELECT id_a, id_b, CAST(3 + id_a % 4 AS INT) AS n_frames_a,
       |  CAST(count(*) AS INT) AS n_shared,
       |  round(count(*) / (3.0 + id_a % 4), 4) AS containment
       |FROM fmatch GROUP BY id_a, id_b ORDER BY id_a, id_b""".stripMargin

  /** Incremental video dedup — the last member of the per-modality
    * daily-arrival family (text/image/audio/vector twins all shipped):
    * classify today's video intake (salted `inc:` split over video ids)
    * by FRAME CONTAINMENT against the frozen base frame-hash index. A
    * delta video whose sampled frames are ≥ `contThreshold` contained
    * (perceptual near-match, ≤ `maxDist` bits) in some single base video
    * drops as `dup_of_base` — the re-upload/re-encode of an owned video;
    * else contained in a smaller-id DELTA video as `dup_in_increment`;
    * else `kept`. Containment (not whole-video hashing) is the right
    * relation for video: trims and re-intros keep most frames intact.
    *
    * Scale shape: the base side is the persisted per-frame hash table (8
    * bytes × ~4 frames per video); both near-joins are the banded
    * [[hammingJoin]] at FRAME level (no all-pairs over frames or videos);
    * the containment fold is one (delta_video, matched_video) hash agg.
    * O(delta) per day, like every twin.
    */
  /** Video ids of `queryFrames` whose sampled frames are ≥ `contThreshold`
    * contained (frame near-match ≤ `maxDist` bits) in `otherFrames` — the
    * banded frame join + per-pair containment fold SHARED by the batch
    * incremental tier ([[videoDedupIncr]]) and the streaming admission
    * ([[graft.streaming.VideoDedupStream]]), so the two cannot drift.
    * Both inputs are (video_id, frame, dhash) relations; `pred` filters
    * candidate frame pairs on the packed ids (id = video·16 + frame).
    */
  private[graft] def containedVideoIds(queryFrames: DataFrame,
      otherFrames: DataFrame, maxDist: Int, contThreshold: Double,
      pred: (Column, Column) => Column = (_, _) => lit(true)): DataFrame = {
    def rel(df: DataFrame) = df.select(
      (col("video_id") * 16 + col("frame")).as("id"), col("dhash"))
    // dedup = false: the (vd, fd, vo) distinct below subsumes the banded
    // join's pair-level dedup (same rationale as videoContainment)
    hammingJoin(rel(queryFrames), rel(otherFrames), maxDist, pred, dedup = false)
      .select(floor(col("id_a") / 16).cast("long").as("vd"),
        pmod(col("id_a"), lit(16)).as("fd"),
        floor(col("id_b") / 16).cast("long").as("vo"))
      .distinct()
      .groupBy("vd", "vo").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >=
        ceil(lit(contThreshold) * (lit(3) + pmod(col("vd"), lit(4)))))
      .select(col("vd").as("video_id")).distinct()
  }

  def videoDedupIncr(spark: SparkSession, dir: String, deltaMod: Int = 3,
                     maxDist: Int = 6, contThreshold: Double = 0.5): DataFrame = {
    val frames = graft.SharedRel(spark, s"vframes|$dir", graft.Materialize.Local)(
      videoFrameHashes(spark, dir))
    val isDelta = pmod(graft.Exprs.hex60(
      concat(lit("inc:"), col("video_id").cast("string"))), lit(deltaMod)) === 0
    val base = frames.filter(!isDelta)
    val delta = frames.filter(isDelta)
    // frame matches → per (delta video, other video) distinct matched
    // delta-frames → containment of the DELTA video's frames
    val ofBase = containedVideoIds(delta, base, maxDist, contThreshold)
      .withColumn("ob", lit(1))
    val inDelta = containedVideoIds(delta, delta, maxDist, contThreshold,
        (a, b) => floor(b / 16) < floor(a / 16))
      .withColumn("od", lit(1))
    frames.filter(isDelta).select("video_id").distinct()
      .join(ofBase, Seq("video_id"), "left")
      .join(inDelta, Seq("video_id"), "left")
      .select(col("video_id"),
        (lit(3) + pmod(col("video_id"), lit(4))).cast("int").as("n_frames"),
        when(col("ob") === 1, "dup_of_base")
          .when(col("od") === 1, "dup_in_increment")
          .otherwise("kept").as("drop_reason"))
      .withColumn("keep", col("drop_reason") === "kept")
      .select("video_id", "n_frames", "keep", "drop_reason")
      .orderBy("video_id")
  }

  /** Oracle: all-pairs frame popcount over the analytic hash recompute,
    * then the same containment fold — banded-equivalent by pigeonhole.
    */
  def videoDedupIncrSql(deltaMod: Int = 3, maxDist: Int = 6,
                        contThreshold: Double = 0.5): String =
    s"""$videoHashSql,
       |tag AS (
       |  SELECT video_id, frame, dhash,
       |    ${graft.Exprs.hex60Sql("'inc:' || video_id::VARCHAR")} % $deltaMod = 0 AS is_delta
       |  FROM vh),
       |vbase AS (SELECT * FROM tag WHERE NOT is_delta),
       |vdelta AS (SELECT * FROM tag WHERE is_delta),
       |ofbase AS (
       |  SELECT DISTINCT vd FROM (
       |    SELECT d.video_id AS vd, b.video_id AS vo,
       |      count(DISTINCT d.frame) AS n_shared
       |    FROM vdelta d JOIN vbase b
       |      ON bit_count(xor(d.dhash, b.dhash)) <= $maxDist
       |    GROUP BY 1, 2)
       |  WHERE n_shared >= ceil($contThreshold * (3 + vd % 4))),
       |indelta AS (
       |  SELECT DISTINCT vd FROM (
       |    SELECT d.video_id AS vd, e.video_id AS vo,
       |      count(DISTINCT d.frame) AS n_shared
       |    FROM vdelta d JOIN vdelta e
       |      ON e.video_id < d.video_id
       |      AND bit_count(xor(d.dhash, e.dhash)) <= $maxDist
       |    GROUP BY 1, 2)
       |  WHERE n_shared >= ceil($contThreshold * (3 + vd % 4)))
       |SELECT video_id, CAST(3 + video_id % 4 AS INT) AS n_frames,
       |  dr = 'kept' AS keep, dr AS drop_reason
       |FROM (
       |  SELECT v.video_id,
       |    CASE WHEN ob.vd IS NOT NULL THEN 'dup_of_base'
       |         WHEN ind.vd IS NOT NULL THEN 'dup_in_increment'
       |         ELSE 'kept' END AS dr
       |  FROM (SELECT DISTINCT video_id FROM vdelta) v
       |  LEFT JOIN ofbase ob ON v.video_id = ob.vd
       |  LEFT JOIN indelta ind ON v.video_id = ind.vd)
       |ORDER BY video_id""".stripMargin

  def pixelStatsSql(box: Int = 8): String =
    s"""WITH imgs AS (
       |  SELECT doc_id AS media_id,
       |    doc_id % 16 + 1 AS w, doc_id % 12 + 1 AS h
       |  FROM documents WHERE doc_id % 3 = 0),
       |dims AS (
       |  SELECT media_id, w, h,
       |    greatest((2 * w * $box + greatest(w, h)) // (2 * greatest(w, h)), 1) AS out_w,
       |    greatest((2 * h * $box + greatest(w, h)) // (2 * greatest(w, h)), 1) AS out_h
       |  FROM imgs),
       |px AS (
       |  SELECT media_id, out_w, out_h, x, y,
       |    (2 * x + 1) * w // (2 * out_w) AS sx,
       |    (2 * y + 1) * h // (2 * out_h) AS sy
       |  FROM dims, unnest(range(0, out_w)) AS tx(x), unnest(range(0, out_h)) AS ty(y))
       |SELECT media_id,
       |  CAST(out_w AS INT) AS out_w, CAST(out_h AS INT) AS out_h,
       |  CAST(sum(((media_id + 7 * sx + 13 * sy) % 256
       |        + 2 * ((sx * sy + media_id) % 256)
       |        + 3 * ((sx + sy) % 256)) * (x + 1) * (y + 1)) AS BIGINT) AS px_check
       |FROM px GROUP BY media_id, out_w, out_h ORDER BY media_id""".stripMargin

  def frameSampleSql(frameBytes: Int = 1000): String =
    s"""SELECT media_id, frame_idx, frame_idx * $frameBytes AS byte_offset, byte_len
       |FROM (
       |  SELECT doc_id AS media_id,
       |    CAST(octet_length(encode(text)) AS INT) AS byte_len
       |  FROM documents
       |  WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0),
       |  unnest(range(0, (byte_len + ${frameBytes - 1}) // $frameBytes)) AS t(frame_idx)
       |ORDER BY media_id, frame_idx""".stripMargin

  val mediaMetaSql: String =
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |  CAST(octet_length(encode(text)) AS INT) AS byte_len,
      |  md5(text) AS content_md5,
      |  CAST(doc_id % 640 + 1 AS INT) AS declared_w,
      |  CAST(doc_id % 480 + 1 AS INT) AS declared_h,
      |  CAST(CASE WHEN doc_id % 3 = 2 THEN (octet_length(encode(text)) + 999) // 1000
      |       ELSE 1 END AS INT) AS n_frames
      |FROM documents ORDER BY media_id""".stripMargin
}
