package graft.multimodal

/** Pure-JVM baseline sequential JPEG (ITU T.81): a real encoder and a real
  * general decoder, no native codec.
  *
  * Decoder ([[decode]]) handles any 8-bit baseline JPEG: marker walk, DQT /
  * DHT (multi-table segments) / SOF0 / DRI / SOS, huffman entropy decode
  * with byte unstuffing and restart markers, DC prediction, dequantization,
  * de-zigzag, double-precision separable 8×8 IDCT, arbitrary (≤2,≤2)
  * sampling factors with replication upsampling, and the fixed-point
  * YCbCr→RGB below. Progressive (SOF2), arithmetic coding, 12-bit
  * precision and >3 components refuse with None — loud refusal, not a
  * garbage decode. All size arithmetic is Long-guarded before allocation.
  *
  * Encoder ([[encodeYCbCr]]) emits baseline 4:2:0 with ALL-ONES quant
  * tables and self-declared huffman tables (12 DC categories at 4 bits,
  * the 162 valid AC symbols at 8 bits — canonical, no all-ones code). With
  * quantization 1, an image whose Y is constant per 8×8 block and whose
  * chroma is constant per 16×16 MCU round-trips EXACTLY: each block's
  * forward DCT is DC-only (DC = 8·(v−128), an exact double; AC sums cancel
  * below the rounding threshold) and the IDCT of a DC-only block is the
  * flat value DC/8 — which is what makes a LOSSY codec differentially
  * oracle-checkable ([[Multimodal.pixelStatsJpeg]]): the oracle recomputes
  * the block constants from the formula, byte-free.
  *
  * YCbCr→RGB (both directions of the contract live HERE and in the oracle
  * SQL): positive-operand fixed point, truncation == floor on both engines:
  *   R = clamp(y + (91881·cr + 32768 >> 16) − 179)
  *   G = clamp(y − (22554·cb + 46802·cr + 32768 >> 16) + 135)
  *   B = clamp(y + (116130·cb + 32768 >> 16) − 227)
  * (BT.601 coefficients ×2¹⁶; the constant offsets fold the −128 chroma
  * bias so every shifted operand stays non-negative.)
  */
object Jpeg {

  private[multimodal] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // 8-point DCT basis: M(u)(x) = C(u)/2 · cos((2x+1)uπ/16)
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Fixed-point YCbCr→RGB — the single definition both the decoder and
    * the oracle SQL state. Inputs 0..255, output clamped 0..255.
    */
  def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def clamp(v: Int) = math.max(0, math.min(255, v))
    (clamp(y + ((91881 * cr + 32768) >> 16) - 179),
      clamp(y - ((22554 * cb + 46802 * cr + 32768) >> 16) + 135),
      clamp(y + ((116130 * cb + 32768) >> 16) - 227))
  }

  // ---- huffman tables (encoder side: self-declared, canonical) ----

  // DC: 12 category symbols, all 4-bit codes (codes 0..11; 1111 unused)
  private val DcBits = { val b = new Array[Int](17); b(4) = 12; b }
  private val DcVals: Array[Int] = (0 to 11).toArray
  // AC: the 162 valid run/size symbols, all 8-bit codes (0..161 < 255)
  private val AcVals: Array[Int] =
    (Seq(0x00, 0xF0) ++ (for { r <- 0 to 15; s <- 1 to 10 } yield (r << 4) | s))
      .sorted.toArray
  private val AcBits = { val b = new Array[Int](17); b(8) = AcVals.length; b }

  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var vi = 0
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var n = bits(len)
      while (n > 0) {
        out(vals(vi)) = (code, len); vi += 1; code += 1; n -= 1
      }
      code <<= 1
    }
    out.toMap
  }
  private val DcCodes = canonicalCodes(DcBits, DcVals)
  private val AcCodes = canonicalCodes(AcBits, AcVals)

  // ---- bit I/O ----

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { put(0x7f, 8 - n) } // pad with 1s
  }

  /** Entropy-segment bit reader with 0xFF00 unstuffing; byte-aligns and
    * consumes RSTn markers on demand. Returns −1 past the segment end.
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    var hitMarker = false
    def bit(): Int = {
      if (n == 0) {
        if (pos >= b.length) return -1
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) return -1
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1
          else { hitMarker = true; pos -= 1; return -1 }
          v = 0xff
        }
        acc = v; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def bits(len: Int): Int = {
      var v = 0
      var i = 0
      while (i < len) {
        val x = bit(); if (x < 0) return -1
        v = (v << 1) | x; i += 1
      }
      v
    }
    /** Align to a byte boundary and consume an expected RSTn marker. */
    def restart(): Boolean = {
      n = 0; hitMarker = false
      if (pos + 2 > b.length || (b(pos) & 0xff) != 0xff) return false
      val m = b(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2; true
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var t = 0
    while (a != 0) { a >>= 1; t += 1 }
    t
  }

  // ---- encoder ----

  private def fdctQuant(block: Array[Double]): Array[Int] = {
    // rows then columns through the shared basis; quant table is all ones
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += block(y * 8 + x) * Basis(u)(x); x += 1 }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    val out = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * Basis(v)(yy); yy += 1 }
        out(v * 8 + u) = math.round(s).toInt
        v += 1
      }
      u += 1
    }
    out
  }

  private def writeBlock(bw: BitWriter, coef: Array[Int], pred: Int): Int = {
    val dc = coef(0)
    val diff = dc - pred
    val t = category(diff)
    val (c, l) = DcCodes(t)
    bw.put(c, l)
    if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
    var run = 0
    var k = 1
    while (k < 64) {
      val v = coef(Zigzag(k))
      if (v == 0) run += 1
      else {
        while (run >= 16) { val (zc, zl) = AcCodes(0xF0); bw.put(zc, zl); run -= 16 }
        val s = category(v)
        val (ac, al) = AcCodes((run << 4) | s)
        bw.put(ac, al)
        bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ec, el) = AcCodes(0x00); bw.put(ec, el) }
    dc
  }

  /** Encode full-resolution Y/Cb/Cr planes (w×h each, values 0..255) as a
    * baseline 4:2:0 JPEG with all-ones quant tables. Chroma is subsampled
    * by 2×2 rounded mean; edges pad by replication.
    */
  def encodeYCbCr(w: Int, h: Int, yP: Array[Int], cbP: Array[Int],
                  crP: Array[Int]): Array[Byte] = {
    require(w > 0 && h > 0 && yP.length == w * h &&
      cbP.length == w * h && crP.length == w * h, "bad plane dims")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    // DQT: table 0, all ones, zigzag order
    marker(0xdb); u16(2 + 1 + 64); out.write(0x00)
    (0 until 64).foreach(_ => out.write(1))
    // SOF0: 3 components, Y 2×2, Cb/Cr 1×1, all quant table 0
    marker(0xc0); u16(8 + 3 * 3); out.write(8); u16(h); u16(w); out.write(3)
    out.write(1); out.write(0x22); out.write(0)
    out.write(2); out.write(0x11); out.write(0)
    out.write(3); out.write(0x11); out.write(0)
    // DHT: DC table 0 + AC table 0 (used by all components)
    marker(0xc4); u16(2 + (1 + 16 + DcVals.length) + (1 + 16 + AcVals.length))
    out.write(0x00); (1 to 16).foreach(l => out.write(DcBits(l)))
    DcVals.foreach(out.write)
    out.write(0x10); (1 to 16).foreach(l => out.write(AcBits(l)))
    AcVals.foreach(out.write)
    // SOS
    marker(0xda); u16(6 + 2 * 3); out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x00)
    out.write(3); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    // entropy data
    val mcusX = (w + 15) / 16
    val mcusY = (h + 15) / 16
    def yAt(x: Int, y: Int): Int =
      yP(math.min(y, h - 1) * w + math.min(x, w - 1))
    def cAt(p: Array[Int])(cx: Int, cy: Int): Int = {
      // 2×2 rounded mean at full-res (2cx, 2cy), edge-replicated
      def s(x: Int, y: Int) = p(math.min(y, h - 1) * w + math.min(x, w - 1))
      (s(2 * cx, 2 * cy) + s(2 * cx + 1, 2 * cy) +
        s(2 * cx, 2 * cy + 1) + s(2 * cx + 1, 2 * cy + 1) + 2) / 4
    }
    val bw = new BitWriter(out)
    var predY, predCb, predCr = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) {
            val block = new Array[Double](64)
            var i = 0
            while (i < 64) {
              val px = mx * 16 + bx * 8 + i % 8
              val py = my * 16 + by * 8 + i / 8
              block(i) = yAt(px, py) - 128.0
              i += 1
            }
            predY = writeBlock(bw, fdctQuant(block), predY)
            bx += 1
          }
          by += 1
        }
        for (chroma <- 0 to 1) {
          val p = if (chroma == 0) cAt(cbP) _ else cAt(crP) _
          val block = new Array[Double](64)
          var i = 0
          while (i < 64) {
            block(i) = p(mx * 8 + i % 8, my * 8 + i / 8) - 128.0
            i += 1
          }
          if (chroma == 0) predCb = writeBlock(bw, fdctQuant(block), predCb)
          else predCr = writeBlock(bw, fdctQuant(block), predCr)
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder ----

  private final case class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // canonical ranges per length: (minCode, maxCode, first value index)
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var vi = 0
      for (len <- 1 to 16) {
        if (bits(len) == 0) { minCode(len) = 0; maxCode(len) = -1 }
        else {
          valPtr(len) = vi
          minCode(len) = code
          code += bits(len); vi += bits(len)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
    def read(br: BitReader): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        val b = br.bit(); if (b < 0) return -1
        code = (code << 1) | b
        len += 1
        if (maxCode(len) >= minCode(len) && code >= minCode(len) && code <= maxCode(len))
          return vals(valPtr(len) + code - minCode(len))
      }
      -1
    }
  }

  private final case class Component(id: Int, hi: Int, vi: Int, tq: Int,
                                     var dcTab: Int = 0, var acTab: Int = 0)

  private val MaxPixels = 1L << 26 // 64M pixels ≈ 192 MB RGB — loud refusal above

  /** Decode any supported baseline JPEG to (width, height, top-down RGB).
    * None on anything unsupported, malformed or truncated.
    */
  def decode(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    def u16(i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    val qtabs = Array.fill(4)(null: Array[Int])
    val dcTabs = Array.fill(4)(null: HuffTable)
    val acTabs = Array.fill(4)(null: HuffTable)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var i = 2
    var sosAt = -1
    while (sosAt < 0) {
      if (i + 4 > b.length || (b(i) & 0xff) != 0xff) return None
      val m = b(i + 1) & 0xff
      if (m == 0xff) { i += 1 } // fill byte
      else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2
      else if (m == 0xd9) return None // EOI before SOS
      else {
        val len = u16(i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val seg = i + 4
        val segEnd = i + 2 + len
        m match {
          case 0xdb => // DQT: one or more tables
            var p = seg
            while (p < segEnd) {
              val pq = (b(p) & 0xff) >> 4
              val tq = b(p) & 0x0f
              if (pq != 0 || tq > 3) return None // 16-bit tables unsupported
              if (p + 1 + 64 > segEnd) return None
              qtabs(tq) = Array.tabulate(64)(k => b(p + 1 + k) & 0xff)
              p += 65
            }
          case 0xc4 => // DHT: one or more tables
            var p = seg
            while (p < segEnd) {
              val tc = (b(p) & 0xff) >> 4
              val th = b(p) & 0x0f
              if (tc > 1 || th > 3 || p + 17 > segEnd) return None
              val bits = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) { bits(l) = b(p + l) & 0xff; total += bits(l); l += 1 }
              if (p + 17 + total > segEnd || total > 256) return None
              val vals = Array.tabulate(total)(k => b(p + 17 + k) & 0xff)
              val t = HuffTable(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              p += 17 + total
            }
          case 0xc0 | 0xc1 => // baseline / extended sequential huffman
            if (seg + 6 > segEnd || (b(seg) & 0xff) != 8) return None
            h = u16(seg + 1); w = u16(seg + 3)
            val n = b(seg + 5) & 0xff
            if (w <= 0 || h <= 0 || n < 1 || n > 3 ||
              seg + 6 + 3 * n > segEnd) return None
            if (w.toLong * h > MaxPixels) return None
            comps = Array.tabulate(n) { k =>
              val p = seg + 6 + 3 * k
              val hv = b(p + 1) & 0xff
              val c = Component(b(p) & 0xff, hv >> 4, hv & 0x0f, b(p + 2) & 0x0f)
              if (c.hi < 1 || c.hi > 2 || c.vi < 1 || c.vi > 2 || c.tq > 3) return None
              c
            }
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // progressive / arithmetic / hierarchical
          case 0xdd => // DRI
            if (len != 4) return None
            restartInterval = u16(seg)
          case 0xda =>
            if (comps == null) return None
            val n = b(seg) & 0xff
            if (n != comps.length || seg + 1 + 2 * n + 3 > segEnd) return None
            var k = 0
            while (k < n) {
              val cid = b(seg + 1 + 2 * k) & 0xff
              val tt = b(seg + 2 + 2 * k) & 0xff
              if ((tt >> 4) > 3 || (tt & 0x0f) > 3) return None
              comps.find(_.id == cid) match {
                case Some(c) => c.dcTab = tt >> 4; c.acTab = tt & 0x0f
                case None => return None
              }
              k += 1
            }
            sosAt = segEnd
          case _ => () // APPn / COM / others: skip
        }
        if (sosAt < 0) i = segEnd
      }
    }
    // T.81 single-component scans are NON-interleaved: one block per MCU
    // over the component's own block grid, whatever sampling SOF declared
    if (comps.length == 1) comps(0) = comps(0).copy(hi = 1, vi = 1)
    val hmax = comps.map(_.hi).max
    val vmax = comps.map(_.vi).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // per-component padded plane (Long-guarded)
    val planeW = comps.map(c => mcusX * c.hi * 8)
    val planeH = comps.map(c => mcusY * c.vi * 8)
    var ci = 0
    while (ci < comps.length) {
      if (planeW(ci).toLong * planeH(ci) > 4L * MaxPixels) return None
      if (qtabs(comps(ci).tq) == null) return None
      if (dcTabs(comps(ci).dcTab) == null || acTabs(comps(ci).acTab) == null)
        return None
      ci += 1
    }
    val planes = comps.indices.map(k => new Array[Byte](planeW(k) * planeH(k))).toArray
    val br = new BitReader(b, sosAt)
    val preds = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    val pix = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return None
        java.util.Arrays.fill(preds, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val qt = qtabs(c.tq)
        val dct = dcTabs(c.dcTab)
        val act = acTabs(c.acTab)
        var by = 0
        while (by < c.vi) {
          var bx = 0
          while (bx < c.hi) {
            java.util.Arrays.fill(coef, 0)
            val t = dct.read(br); if (t < 0 || t > 11) return None
            val dv = br.bits(t); if (dv < 0 && t > 0) return None
            preds(ci) += extend(dv, t)
            coef(0) = preds(ci) * qt(0)
            var k = 1
            var open = true
            while (open && k < 64) {
              val rs = act.read(br); if (rs < 0) return None
              if (rs == 0x00) open = false
              else if (rs == 0xF0) k += 16
              else {
                k += rs >> 4
                if (k > 63) return None
                val s = rs & 0x0f
                val av = br.bits(s); if (av < 0) return None
                coef(Zigzag(k)) = extend(av, s) * qt(k)
                k += 1
              }
            }
            // IDCT: columns then rows through the shared basis
            var x = 0
            while (x < 8) {
              var yy = 0
              while (yy < 8) {
                var s = 0.0
                var u = 0
                while (u < 8) { s += Basis(u)(yy) * coef(u * 8 + x); u += 1 }
                tmp(yy * 8 + x) = s
                yy += 1
              }
              x += 1
            }
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                var s = 0.0
                var u = 0
                while (u < 8) { s += Basis(u)(xx) * tmp(yy * 8 + u); u += 1 }
                pix(yy * 8 + xx) = s
                xx += 1
              }
              yy += 1
            }
            val px0 = (mx * c.hi + bx) * 8
            val py0 = (my * c.vi + by) * 8
            var p = 0
            while (p < 64) {
              val v = math.max(0, math.min(255, math.round(pix(p) + 128.0).toInt))
              planes(ci)((py0 + p / 8) * planeW(ci) + px0 + p % 8) = v.toByte
              p += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // project to RGB with replication upsampling
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        if (comps.length == 1) {
          val v = planes(0)(y * planeW(0) + x)
          rgb(p) = v; rgb(p + 1) = v; rgb(p + 2) = v
        } else {
          def sample(k: Int): Int = {
            val sx = x * comps(k).hi / hmax
            val sy = y * comps(k).vi / vmax
            planes(k)(sy * planeW(k) + sx) & 0xff
          }
          val (r, g, bb) = yccToRgb(sample(0), sample(1), sample(2))
          rgb(p) = r.toByte; rgb(p + 1) = g.toByte; rgb(p + 2) = bb.toByte
        }
        x += 1
      }
      y += 1
    }
    Some((w, h, rgb))
  }
}
