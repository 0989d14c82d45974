package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG pixel codec — the second REAL pixel path of the multimodal
  * tier (after [[Bmp]]): PNG needs only zlib (`java.util.zip`) plus the five
  * scanline filters, no native codec, so full pixel decode runs in any
  * environment.
  *
  * Scope: 8-bit truecolor (color type 2, RGB) and truecolor+alpha (color
  * type 6, alpha dropped on decode), non-interlaced — the mainstream
  * non-paletted shapes. Anything else (palette, 16-bit, interlace,
  * malformed chunks, truncated or over-long pixel data) returns None from
  * [[decode]]: a loud refusal, not a garbage decode.
  *
  * In-memory representation matches [[Bmp]]: top-down row-major RGB triples.
  *
  * All size/offset arithmetic that involves header-declared dimensions runs
  * in Long and is bounded before any allocation — a corrupt header with
  * width near 2^30 must refuse, not overflow into a negative array size
  * (the same rule retrofitted onto [[Bmp.decode]]).
  */
object Png {

  private val Sig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Refuse images whose decoded pixel buffer would exceed this (64 MB of
    * RGB) — far above any fixture, far below Int.MaxValue. */
  private val MaxPixelBytes = 64L << 20

  private def i32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def putI32be(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = ((v >>> 24) & 0xff).toByte
    b(i + 1) = ((v >>> 16) & 0xff).toByte
    b(i + 2) = ((v >>> 8) & 0xff).toByte
    b(i + 3) = (v & 0xff).toByte
  }

  private def chunk(tag: String, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + payload.length)
    putI32be(out, 0, payload.length)
    val t = tag.getBytes("US-ASCII")
    System.arraycopy(t, 0, out, 4, 4)
    System.arraycopy(payload, 0, out, 8, payload.length)
    val crc = new CRC32
    crc.update(out, 4, 4 + payload.length)
    putI32be(out, 8 + payload.length, crc.getValue.toInt)
    out
  }

  /** Paeth predictor (PNG spec §9.4) — shared by encode and decode. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode top-down RGB triples as a non-interlaced 8-bit truecolor PNG.
    * Each scanline uses filter `(y + filterPhase) % 5`, so any image with
    * height ≥ 5 exercises ALL five filter types — the encoder's job here is
    * to make the decoder's unfilter path differentially testable, exactly
    * as [[Bmp.encode]] feeds the BMP round trip.
    */
  def encode(width: Int, height: Int, rgb: Array[Byte], filterPhase: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == width * height * 3,
      s"need ${width * height * 3} rgb bytes, got ${rgb.length}")
    val rowLen = width * 3
    val raw = new Array[Byte]((rowLen + 1) * height)
    var y = 0
    while (y < height) {
      val f = ((y + filterPhase) % 5 + 5) % 5
      val rb = y * (rowLen + 1)
      raw(rb) = f.toByte
      var i = 0
      while (i < rowLen) {
        val cur = rgb(y * rowLen + i) & 0xff
        val left = if (i >= 3) rgb(y * rowLen + i - 3) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * rowLen + i) & 0xff else 0
        val ul = if (y > 0 && i >= 3) rgb((y - 1) * rowLen + i - 3) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case _ => cur - paeth(left, up, ul)
        }
        raw(rb + 1 + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zOut = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      zOut.write(buf, 0, n)
    }
    deflater.end()
    val ihdr = new Array[Byte](13)
    putI32be(ihdr, 0, width); putI32be(ihdr, 4, height)
    ihdr(8) = 8  // bit depth
    ihdr(9) = 2  // color type: truecolor RGB
    // compression 0, filter 0, interlace 0 already zero
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", zOut.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Decode a non-interlaced 8-bit truecolor (RGB or RGBA) PNG to
    * (width, height, top-down RGB triples); alpha is dropped. None on
    * anything out of scope or malformed — including dimensions whose pixel
    * buffer would not fit sane bounds (checked in Long BEFORE allocating).
    */
  def decode(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < Sig.length + 25 || !b.take(Sig.length).sameElements(Sig))
      return None
    // ---- chunk walk: IHDR must be first; concatenate all IDAT payloads
    var i = Sig.length
    var width = 0; var height = 0; var colorType = -1
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawIend && i + 8 <= b.length) {
      val len = i32be(b, i)
      val tag = new String(b, i + 4, 4, "US-ASCII")
      // Long guard: a corrupt length near 2^31 must not wrap the cursor
      if (len < 0 || i.toLong + 12L + len > b.length) return None
      tag match {
        case "IHDR" =>
          if (sawIhdr || len != 13) return None
          sawIhdr = true
          width = i32be(b, i + 8); height = i32be(b, i + 12)
          val bitDepth = b(i + 16) & 0xff
          colorType = b(i + 17) & 0xff
          val interlace = b(i + 20) & 0xff
          if (bitDepth != 8 || (colorType != 2 && colorType != 6) || interlace != 0)
            return None
        case "IDAT" =>
          if (!sawIhdr) return None
          idat.write(b, i + 8, len)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunk: skip
      }
      i += 12 + len
    }
    if (!sawIhdr || !sawIend) return None
    // ---- bounds in Long BEFORE any allocation
    val bpp = if (colorType == 6) 4 else 3
    if (width <= 0 || height <= 0) return None
    val rowLenL = width.toLong * bpp
    val rawLenL = (rowLenL + 1L) * height
    if (width.toLong * height * 3L > MaxPixelBytes || rawLenL > Int.MaxValue)
      return None
    // ---- inflate exactly rawLen bytes; short or over-long data refuses
    val raw = new Array[Byte](rawLenL.toInt)
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        // n == 0 with space left and !finished means needsInput (truncated)
        // OR needsDictionary (FDICT — forbidden by PNG, so malformed); both
        // refuse. Gating on needsInput alone would spin forever on FDICT.
        if (n == 0) return None
        got += n
      }
      if (got < raw.length) return None
      // surplus pixel data = not the image the header declared
      if (!inflater.finished() && inflater.inflate(new Array[Byte](1)) > 0) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()
    // ---- unfilter scanlines in place, then project to RGB
    val rowLen = rowLenL.toInt
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val rb = y * (rowLen + 1)
      val f = raw(rb) & 0xff
      if (f > 4) return None
      var k = 0
      while (k < rowLen) {
        val x = raw(rb + 1 + k) & 0xff
        val left = if (k >= bpp) raw(rb + 1 + k - bpp) & 0xff else 0
        val up = if (y > 0) raw(rb - rowLen + k) & 0xff else 0
        val ul = if (y > 0 && k >= bpp) raw(rb - rowLen + k - bpp) & 0xff else 0
        val v = f match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + (left + up) / 2
          case _ => x + paeth(left, up, ul)
        }
        raw(rb + 1 + k) = (v & 0xff).toByte
        k += 1
      }
      var px = 0
      while (px < width) {
        val s = rb + 1 + px * bpp
        val d = (y * width + px) * 3
        rgb(d) = raw(s); rgb(d + 1) = raw(s + 1); rgb(d + 2) = raw(s + 2)
        px += 1
      }
      y += 1
    }
    Some((width, height, rgb))
  }
}
