package graft.multimodal

/** Pure-JVM MPEG-1 Layer III FRAME-HEADER codec — the header tier of the
  * compressed-audio path, the same tier as the H.264-free video path: no
  * audio decode (that would need a hybrid synthesis filterbank and a
  * Huffman stage — a real codec binding), but a REAL byte walk over the
  * fixed-layout frame headers (ISO/IEC 11172-3 public layout): sync word,
  * version/layer bits, bitrate and samplerate indices, padding, channel
  * mode, plus the ID3v2 prefix tag (syncsafe size) real files carry.
  * Duration / frame-count / bitrate metadata — everything a curation
  * pipeline gates compressed audio on before deciding to transcode —
  * comes straight out of this walk.
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
      var i = 4
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
}
