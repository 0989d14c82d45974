package graft.multimodal

/** Pure-JVM MPEG-1 Layer III FRAME-HEADER + SIDE-INFO codec — two honest
  * tiers of the compressed-audio path: no SAMPLE decode (that would need
  * the Huffman stage and a hybrid synthesis filterbank — a real codec
  * binding), but a REAL byte walk over the fixed-layout frame headers
  * (ISO/IEC 11172-3 public layout: sync word, version/layer bits,
  * bitrate and samplerate indices, padding, channel mode, plus the ID3v2
  * prefix tag's syncsafe size) AND a REAL bit walk over each frame's
  * side-info block ([[parseSideInfo]]: main_data_begin, per
  * granule-channel part2_3_length / big_values / global_gain). Duration,
  * frame-count, bitrate and the loudness/payload envelope — everything a
  * curation pipeline gates compressed audio on before deciding to
  * transcode — come straight out of these walks.
  *
  * Malformed input refuses with None (lost sync, reserved/free indices,
  * truncated tail, mid-stream samplerate or mode change) — the
  * [[Wav.decode]] loud-refusal contract.
  */
object Mp3 {

  /** MPEG-1 Layer III bitrate table, kbps, indexed by the 4-bit header
    * field (0 = "free format" and 15 = reserved — both refused).
    */
  val BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 samplerate table indexed by the 2-bit header field (3 reserved). */
  val SampleRate: Array[Int] = Array(44100, 48000, 32000)

  /** MPEG-1 Layer III granularity: 1152 PCM samples per frame. */
  val SamplesPerFrame = 1152

  final case class FrameInfo(sampleRate: Int, chMode: Int, nFrames: Int,
                             sumKbps: Long, nBytes: Int, id3Bytes: Int)

  /** Aggregate of the Layer III SIDE-INFO walk ([[parseSideInfo]]):
    * granule-channel count, total Huffman+scalefactor payload bits
    * (part2_3_length), the global_gain envelope (the loudness proxy a
    * curation gate reads without decoding audio), total big_values, and
    * the bit-reservoir high-water mark (max main_data_begin).
    */
  final case class SideInfo(nGc: Int, sumPart23: Long, minGain: Int,
                            maxGain: Int, sumBigValues: Long,
                            maxMainDataBegin: Int)

  /** MPEG-1 side-info block length after the 4-byte header (no CRC):
    * 17 bytes mono (chMode 3), 32 bytes dual/stereo — ISO/IEC 11172-3
    * fixed layout (9-bit main_data_begin, private bits, per-channel
    * scfsi, then 59 bits per granule-channel; both window-switching
    * branches are 22 bits, so the granule-channel stride is constant).
    */
  def sideInfoBytes(chMode: Int): Int = if (chMode == 3) 17 else 32

  /** Worst-case per-granule-channel main-data budget at bitrate index
    * `bi`: the smallest legal frame is sr = 48000 (`len = 3·kbps` bytes,
    * no padding) and the largest overhead is stereo (4-byte header +
    * 32-byte side info, FOUR granule-channels), so
    * `(3·kbps − 36)·8 / 4 = (3·kbps − 36)·2` bits per granule-channel.
    * Capping part2_3_length here keeps `Σ part2_3 ≤ the frame's
    * main-data bits` for EVERY (srIdx, chMode, padding) shape the
    * encoder can emit.
    */
  def p23CapBits(bi: Int): Int = (3 * BitrateKbps(bi) - 36) * 2

  /** The deterministic side-info field generator [[encode]] writes and
    * the SQL oracle mirrors: (part2_3_length, big_values, global_gain,
    * scalefac_compress) per (bitrate index, frame, granule, channel).
    * Bounds are the spec's: big_values ≤ 288, and part2_3_length bounded
    * below [[p23CapBits]] so that with main_data_begin = 0 every frame's
    * declared Huffman+scalefactor payload physically fits its own
    * main-data region — the emitted streams are reservoir-CONSISTENT,
    * not just side-info-true (unbounded, a 96-byte bi=1 stereo frame's
    * four granule-channels could declare ~870+ bits against 480
    * physical — spec-invalid MPEG-1 a real validator rejects). The
    * bound is a MODULUS, not a clamp (ADVICE r19): a clamp made every
    * over-cap granule-channel emit the SAME capped value exactly where
    * frames are smallest, so the differential oracle's sum_part23 lost
    * per-gc variance there and a bit-offset defect corrupting capped
    * values could in principle cancel in the sum; the modulus keeps the
    * same bound with full variance. Where the cap never binds
    * (`p23CapBits − 64 ≥ 320`, bi ≥ 6 — at bi = 5 the cap is 312 − 64 =
    * 248 < 320, so the modulus still binds there) the emitted values are
    * unchanged. Domain is the format's own bitrate indices, bi ∈ 1..14
    * (0 = free format, 15 = reserved — at bi = 0 the cap arithmetic would
    * go negative and the modulus would stop bounding p23); [[encode]]
    * already refuses out-of-range indices, and the require here keeps the
    * public entry honest too.
    */
  def gcFields(bi: Int, f: Int, g: Int, c: Int): (Int, Int, Int, Int) = {
    require(bi >= 1 && bi <= 14, s"bitrate index out of MPEG-1 domain: $bi")
    (
    64 + (bi * 29 + f * 11 + g * 5 + c * 2) %
      math.min(320, p23CapBits(bi) - 64),
    (bi * 17 + f * 5 + g + c) % 289,
    32 + (bi * 13 + f * 7 + g * 3 + c) % 200,
    (f + g) % 16)
  }

  private final class BitWriter(b: Array[Byte], startByte: Int) {
    private var pos = startByte * 8
    def put(v: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        if (((v >> i) & 1) != 0) b(pos / 8) = (b(pos / 8) | (0x80 >> (pos % 8))).toByte
        pos += 1; i -= 1
      }
    }
  }

  private final class BitReader(b: Array[Byte], startByte: Int) {
    private var pos = startByte * 8
    def get(bits: Int): Int = {
      var v = 0; var i = 0
      while (i < bits) {
        v = (v << 1) | ((b(pos / 8) >> (7 - pos % 8)) & 1)
        pos += 1; i += 1
      }
      v
    }
  }

  /** Encode a syntactically valid (header-true, junk-payload) MPEG-1
    * Layer III stream: an ID3v2.4 tag of `id3Payload` bytes (0 = none),
    * then `nFrames` frames with per-frame bitrate index and padding bit.
    * Frame length is the spec formula `144·bitrate/samplerate + padding`.
    */
  def encode(srIdx: Int, chMode: Int, bitrateIdx: Int => Int,
             padding: Int => Int, nFrames: Int, id3Payload: Int): Array[Byte] = {
    require(srIdx >= 0 && srIdx <= 2 && chMode >= 0 && chMode <= 3 &&
      nFrames > 0 && id3Payload >= 0 && id3Payload < (1 << 28),
      "bad MP3 shape") // ID3v2 size field is 28-bit syncsafe
    val frames = (0 until nFrames).map { f =>
      val bi = bitrateIdx(f)
      val pad = padding(f) & 1
      require(bi >= 1 && bi <= 14, s"bitrate index $bi out of range")
      val len = 144 * (BitrateKbps(bi) * 1000) / SampleRate(srIdx) + pad
      val b = new Array[Byte](len)
      b(0) = 0xff.toByte
      b(1) = 0xfb.toByte // sync 111 | MPEG-1 (11) | Layer III (01) | no CRC
      b(2) = ((bi << 4) | (srIdx << 2) | (pad << 1)).toByte
      b(3) = (chMode << 6).toByte
      // REAL side info (the honest tier above the header walk): the
      // fixed-layout ISO 11172-3 block, self-contained frames
      // (main_data_begin = 0 — no bit reservoir), long blocks only
      // (window_switching_flag = 0), fields from [[gcFields]]
      val nCh = if (chMode == 3) 1 else 2
      val w = new BitWriter(b, 4)
      w.put(0, 9)                       // main_data_begin
      w.put(0, if (nCh == 1) 5 else 3)  // private_bits
      w.put(0, 4 * nCh)                 // scfsi
      for (g <- 0 until 2; c <- 0 until nCh) {
        val (p23, bigv, gain, sfc) = gcFields(bi, f, g, c)
        w.put(p23, 12); w.put(bigv, 9); w.put(gain, 8); w.put(sfc, 4)
        w.put(0, 1)                     // window_switching_flag
        (0 until 3).foreach(k => w.put((bi + f + g + c + k) % 32, 5)) // table_select
        w.put(f % 16, 4); w.put(f % 8, 3)                  // region counts
        w.put(f % 2, 1); w.put((f + g) % 2, 1); w.put((f + c) % 2, 1)
      }
      var i = 4 + sideInfoBytes(chMode)
      while (i < len) { b(i) = ((f * 31 + i) & 0x7f).toByte; i += 1 }
      b
    }
    val id3 =
      if (id3Payload > 0) {
        val t = new Array[Byte](10 + id3Payload)
        t(0) = 'I'; t(1) = 'D'; t(2) = '3'; t(3) = 4; t(4) = 0; t(5) = 0
        // syncsafe size: 7 data bits per byte, high bit clear
        t(6) = ((id3Payload >> 21) & 0x7f).toByte
        t(7) = ((id3Payload >> 14) & 0x7f).toByte
        t(8) = ((id3Payload >> 7) & 0x7f).toByte
        t(9) = (id3Payload & 0x7f).toByte
        t
      } else Array.empty[Byte]
    (id3 ++ frames.flatten).toArray
  }

  /** Header walk: skip the ID3v2 tag if present, then parse every frame
    * header, hopping by the computed frame length. None on any malformed
    * structure — a partial parse is never reported as metadata.
    */
  def parse(b: Array[Byte]): Option[FrameInfo] = {
    var i = 0
    var id3Bytes = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // syncsafe 28-bit size; a set high bit means a corrupt tag header
      if (((b(6) | b(7) | b(8) | b(9)) & 0x80) != 0) return None
      val sz = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      id3Bytes = 10 + sz
      i = id3Bytes
      if (i > b.length) return None
    }
    var sr = -1
    var chMode = -1
    var n = 0
    var sumKbps = 0L
    while (i < b.length) {
      if (i + 4 > b.length) return None // truncated header
      if ((b(i) & 0xff) != 0xff || (b(i + 1) & 0xe0) != 0xe0) return None // lost sync
      val version = ((b(i + 1) & 0xff) >> 3) & 0x3
      val layer = ((b(i + 1) & 0xff) >> 1) & 0x3
      if (version != 3 || layer != 1) return None // MPEG-1 Layer III only
      val bi = ((b(i + 2) & 0xff) >> 4) & 0xf
      val si = ((b(i + 2) & 0xff) >> 2) & 0x3
      val pad = ((b(i + 2) & 0xff) >> 1) & 0x1
      if (bi == 0 || bi == 15 || si == 3) return None // free/reserved
      val m = ((b(i + 3) & 0xff) >> 6) & 0x3
      if (sr < 0) { sr = SampleRate(si); chMode = m }
      else if (sr != SampleRate(si) || chMode != m) return None // mid-stream change
      val len = 144 * (BitrateKbps(bi) * 1000) / SampleRate(si) + pad
      if (i + len > b.length) return None // truncated frame
      sumKbps += BitrateKbps(bi)
      n += 1
      i += len
    }
    if (n == 0) None
    else Some(FrameInfo(sr, chMode, n, sumKbps, b.length, id3Bytes))
  }

  /** Side-info walk — the honest tier ABOVE [[parse]]'s header hop and
    * below a sample decode (which would need the Huffman stage and the
    * hybrid synthesis filterbank): re-walk the frames, and inside each
    * read the fixed-layout ISO 11172-3 side-info block bit by bit —
    * main_data_begin (the bit-reservoir back-pointer), and per
    * granule-channel the part2_3_length / big_values / global_gain /
    * scalefac_compress fields. Both window-switching branches are 22
    * bits, so the granule-channel stride is constant and the walk never
    * needs the Huffman tables.
    *
    * Loud refusals beyond [[parse]]'s: a frame too short for its side
    * info, big_values over the spec's 288 ceiling, and a nonzero
    * main_data_begin on the FIRST frame (there is no earlier frame for
    * the reservoir to point into). NOTE a per-frame Σ part2_3_length vs
    * frame-size check would be WRONG — the reservoir lets a frame's main
    * data live in earlier frames, which is exactly why the back-pointer
    * exists.
    */
  def parseSideInfo(b: Array[Byte]): Option[SideInfo] = {
    var i = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      if (((b(6) | b(7) | b(8) | b(9)) & 0x80) != 0) return None
      i = 10 + (((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f))
      if (i > b.length) return None
    }
    var nGc = 0
    var sumPart23 = 0L
    var minGain = Int.MaxValue
    var maxGain = Int.MinValue
    var sumBigValues = 0L
    var maxMdb = 0
    var first = true
    while (i < b.length) {
      if (i + 4 > b.length) return None
      if ((b(i) & 0xff) != 0xff || (b(i + 1) & 0xe0) != 0xe0) return None
      if (((b(i + 1) >> 3) & 0x3) != 3 || ((b(i + 1) >> 1) & 0x3) != 1) return None
      val bi = ((b(i + 2) & 0xff) >> 4) & 0xf
      val si = ((b(i + 2) & 0xff) >> 2) & 0x3
      val pad = ((b(i + 2) & 0xff) >> 1) & 0x1
      if (bi == 0 || bi == 15 || si == 3) return None
      val chMode = ((b(i + 3) & 0xff) >> 6) & 0x3
      val len = 144 * (BitrateKbps(bi) * 1000) / SampleRate(si) + pad
      if (i + len > b.length) return None
      val nCh = if (chMode == 3) 1 else 2
      if (len < 4 + sideInfoBytes(chMode)) return None // no room for side info
      val r = new BitReader(b, i + 4)
      val mdb = r.get(9)
      if (first && mdb != 0) return None // reservoir into a frame that isn't there
      if (mdb > maxMdb) maxMdb = mdb
      r.get(if (nCh == 1) 5 else 3) // private_bits
      r.get(4 * nCh)                // scfsi
      for (_ <- 0 until 2 * nCh) {
        val p23 = r.get(12)
        val bigv = r.get(9)
        val gain = r.get(8)
        r.get(4)                    // scalefac_compress
        r.get(1)                    // window_switching_flag (both branches 22 bits)
        r.get(22)
        r.get(3)                    // preflag, scalefac_scale, count1table_select
        if (bigv > 288) return None // spec ceiling
        nGc += 1
        sumPart23 += p23
        sumBigValues += bigv
        if (gain < minGain) minGain = gain
        if (gain > maxGain) maxGain = gain
      }
      first = false
      i += len
    }
    if (nGc == 0) None
    else Some(SideInfo(nGc, sumPart23, minGain, maxGain, sumBigValues, maxMdb))
  }
}
