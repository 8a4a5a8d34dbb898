package graft.sources

/** Audio metadata codec — FLAC and MP3 are the audio half of a
  * multimodal crawl, and curation runs on METADATA (sample rate,
  * channels, duration, title/artist/language tags) long before any
  * sample decodes. Sibling of [[WavCodec]] in the audio family; the
  * sample-decode stays at the stub boundary (codec libraries), the
  * container walk is the engine's job — the same split as
  * [[Mp4Codec]].
  *
  * FLAC: `fLaC` magic, then metadata blocks (1-byte last-flag+type,
  * 24-bit big-endian length): STREAMINFO's packed bitfields (20-bit
  * sample rate, 3-bit channels-1, 5-bit bps-1, 36-bit total samples)
  * and the VORBIS_COMMENT block — little-endian lengths inside a
  * big-endian container, `KEY=value` fields split at the FIRST `=`,
  * keys canonicalized upper-case. Other block types skip by length.
  *
  * MP3: an optional ID3v2.3/2.4 tag (syncsafe tag size; frame sizes
  * plain u32 in v2.3, syncsafe in v2.4; text frames in Latin-1,
  * UTF-16 with BOM, UTF-16BE, or UTF-8), then the first MPEG-1
  * Layer III frame header (bitrate/sample-rate tables, frame length
  * 144·bitrate/rate + padding).
  *
  * Refusal contract ([[GzipCodec]] discipline): whole-file None on a
  * bad magic, a truncated block/frame, a STREAMINFO that is not 34
  * bytes, a zero sample rate, a malformed comment block, an ID3 size
  * past EOF, unsupported ID3 versions/flags, or a first MPEG header
  * that is not MPEG-1 Layer III with a valid bitrate/rate. Never
  * throws. */
object AudioMetaCodec {

  /** One metadata row: kind ∈ streaminfo/vendor/comment (FLAC) or
    * tag/stream (MP3); numeric rows carry num, text rows sval. */
  case class Meta(kind: String, key: String, sval: String, num: Long)

  val MaxComments: Int = 10000
  val MaxTextBytes: Int = 1 << 20

  private final class Fail extends RuntimeException(null, null, false, false)
  private val fail = new Fail
  private def err(): Nothing = throw fail

  def decodeFlac(bytes: Array[Byte]): Option[Vector[Meta]] =
    try Some(runFlac(bytes))
    catch { case _: Fail => None }

  def decodeMp3(bytes: Array[Byte]): Option[Vector[Meta]] =
    try Some(runMp3(bytes))
    catch { case _: Fail => None }

  private def runFlac(b: Array[Byte]): Vector[Meta] = {
    def u8(p: Int): Int = { if (p < 0 || p >= b.length) err(); b(p) & 0xff }
    if (b.length < 8 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' ||
        b(3) != 'C') err()
    val out = Vector.newBuilder[Meta]
    var p = 4
    var first = true
    var last = false
    while (!last) {
      val h = u8(p)
      last = (h & 0x80) != 0
      val btype = h & 0x7f
      if (btype == 127) err() // forbidden by spec
      val len = (u8(p + 1) << 16) | (u8(p + 2) << 8) | u8(p + 3)
      val at = p + 4
      if (at + len > b.length) err()
      if (first && btype != 0) err() // STREAMINFO must lead
      first = false
      btype match {
        case 0 =>
          if (len != 34) err()
          var packed = 0L
          var i = 0
          while (i < 8) { packed = (packed << 8) | u8(at + 10 + i); i += 1 }
          val rate = (packed >>> 44) & 0xfffff
          val ch = ((packed >>> 41) & 7) + 1
          val bps = ((packed >>> 36) & 0x1f) + 1
          val total = packed & ((1L << 36) - 1)
          if (rate == 0) err()
          out += Meta("streaminfo", "sample_rate", null, rate)
          out += Meta("streaminfo", "channels", null, ch)
          out += Meta("streaminfo", "bits", null, bps)
          out += Meta("streaminfo", "total_samples", null, total)
          if (total > 0)
            out += Meta("streaminfo", "duration_ms", null,
              total * 1000 / rate)
        case 4 =>
          def u32le(q: Int): Long =
            (u8(q) | (u8(q + 1) << 8) | (u8(q + 2) << 16) |
              (u8(q + 3).toLong << 24)) & 0xffffffffL
          var q = at
          val bend = at + len
          val vlen = u32le(q); q += 4
          if (vlen > MaxTextBytes || q + vlen > bend) err()
          out += Meta("vendor", "vendor",
            new String(b, q, vlen.toInt,
              java.nio.charset.StandardCharsets.UTF_8), 0)
          q += vlen.toInt
          val n = u32le(q); q += 4
          if (n > MaxComments) err()
          var i = 0L
          while (i < n) {
            val flen = u32le(q); q += 4
            if (flen > MaxTextBytes || q + flen > bend) err()
            val kv = new String(b, q, flen.toInt,
              java.nio.charset.StandardCharsets.UTF_8)
            q += flen.toInt
            val eq = kv.indexOf('=')
            if (eq <= 0) err()
            out += Meta("comment",
              kv.substring(0, eq).toUpperCase(java.util.Locale.ROOT),
              kv.substring(eq + 1), 0)
            i += 1
          }
        case _ => () // seektable / padding / picture / …: skip by length
      }
      p = at + len
    }
    out.result()
  }

  /** Ogg/Opus metadata (RFC 3533 + RFC 7845) — podcast/speech corpora
    * ship this; channels/preskip/duration/tags need no Opus decoder.
    * Page walk: capture pattern, version 0, CRC32 (forward 0x04C11DB7,
    * computed with a zeroed CRC field), lacing-value packet
    * reassembly (255 = continues); single logical stream only
    * (multiplexed serials refuse). Packet 1 must be OpusHead
    * (channels, preskip, input rate), packet 2 OpusTags (the same
    * comment grammar as FLAC's Vorbis block; trailing bytes after the
    * comments — the RFC's binary-suffix space — are ignored).
    * Duration = (last granule − preskip) at the fixed 48 kHz granule
    * rate. Whole-file refusal on any structural fault. */
  /** One Ogg/Opus row: idx disambiguates repeated comment keys. */
  case class OpusMeta(kind: String, key: String, idx: Int, num: Long,
      sval: String)

  def decodeOgg(bytes: Array[Byte]): Option[Vector[OpusMeta]] =
    try Some(runOgg(bytes))
    catch { case _: Fail => None }

  private val OggCrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var k = 0
      while (k < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        k += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  private def runOgg(b: Array[Byte]): Vector[OpusMeta] = {
    def u8(p: Int): Int = { if (p < 0 || p >= b.length) err(); b(p) & 0xff }
    def u16le(p: Int): Int = u8(p) | (u8(p + 1) << 8)
    def u32le(p: Int): Long =
      (u8(p) | (u8(p + 1) << 8) | (u8(p + 2) << 16) |
        (u8(p + 3).toLong << 24)) & 0xffffffffL

    val out = Vector.newBuilder[OpusMeta]
    var p = 0
    var serial = -1L
    var lastGranule = 0L
    var nPages = 0
    var sawEos = false
    val packets = Vector.newBuilder[Array[Byte]]
    var partial = new java.io.ByteArrayOutputStream()
    var packetCount = 0
    while (p < b.length) {
      if (sawEos) err() // trailing pages after EOS
      if (p + 27 > b.length) err()
      if (!(u8(p) == 'O' && u8(p + 1) == 'g' && u8(p + 2) == 'g' &&
            u8(p + 3) == 'S')) err()
      if (u8(p + 4) != 0) err() // stream structure version
      val htype = u8(p + 5)
      var granule = 0L
      var i = 0
      while (i < 8) { granule |= (u8(p + 6 + i).toLong << (8 * i)); i += 1 }
      val ser = u32le(p + 14)
      if (serial < 0) serial = ser
      else if (ser != serial) err() // multiplexed: out of envelope
      val nsegs = u8(p + 26)
      val lacingAt = p + 27
      var bodyLen = 0
      i = 0
      while (i < nsegs) { bodyLen += u8(lacingAt + i); i += 1 }
      val bodyAt = lacingAt + nsegs
      if (bodyAt + bodyLen > b.length) err()
      // CRC over the page with a zeroed CRC field
      var crc = 0
      def feed(q: Int): Unit =
        crc = (crc << 8) ^ OggCrcTable(((crc >>> 24) ^ u8(q)) & 0xff)
      i = p
      while (i < p + 22) { feed(i); i += 1 }
      i = 0
      while (i < 4) {
        crc = (crc << 8) ^ OggCrcTable((crc >>> 24) & 0xff); i += 1
      }
      i = p + 26
      while (i < bodyAt + bodyLen) { feed(i); i += 1 }
      if (crc != (u32le(p + 22)).toInt) err()
      if ((htype & 1) == 0 && partial.size > 0 && nPages > 0) err()
      // packet reassembly via lacing values
      var off = bodyAt
      i = 0
      while (i < nsegs) {
        val ln = u8(lacingAt + i)
        partial.write(b, off, ln)
        off += ln
        if (ln < 255) {
          packets += partial.toByteArray
          packetCount += 1
          partial = new java.io.ByteArrayOutputStream()
        }
        i += 1
      }
      if (granule != -1L) lastGranule = granule
      if ((htype & 4) != 0) sawEos = true
      nPages += 1
      p = bodyAt + bodyLen
    }
    if (nPages == 0 || !sawEos || partial.size > 0) err()
    val ps = packets.result()
    if (ps.length < 2) err()
    val head = ps(0)
    if (head.length < 19 || !new String(head, 0, 8,
        java.nio.charset.StandardCharsets.US_ASCII).equals("OpusHead"))
      err()
    if ((head(8) & 0xff) != 1) err() // OpusHead version
    val ch = head(9) & 0xff
    val preskip = (head(10) & 0xff) | ((head(11) & 0xff) << 8)
    val rate = ((head(12) & 0xff) | ((head(13) & 0xff) << 8) |
      ((head(14) & 0xff) << 16) | ((head(15) & 0xffL) << 24)) & 0xffffffffL
    out += OpusMeta("stream", "channels", 0, ch, null)
    out += OpusMeta("stream", "preskip", 0, preskip, null)
    out += OpusMeta("stream", "input_rate", 0, rate, null)
    out += OpusMeta("stream", "duration_ms", 0,
      math.max(0L, lastGranule - preskip) * 1000 / 48000, null)
    out += OpusMeta("stream", "pages", 0, nPages, null)
    val tags = ps(1)
    if (tags.length < 12 || !new String(tags, 0, 8,
        java.nio.charset.StandardCharsets.US_ASCII).equals("OpusTags"))
      err()
    def t32le(q: Int): Long = {
      if (q + 4 > tags.length) err()
      ((tags(q) & 0xffL) | ((tags(q + 1) & 0xffL) << 8) |
        ((tags(q + 2) & 0xffL) << 16) | ((tags(q + 3) & 0xffL) << 24))
    }
    var q = 8
    val vlen = t32le(q); q += 4
    if (vlen > MaxTextBytes || q + vlen > tags.length) err()
    out += OpusMeta("vendor", "vendor", 0, 0,
      new String(tags, q, vlen.toInt,
        java.nio.charset.StandardCharsets.UTF_8))
    q += vlen.toInt
    val n = t32le(q); q += 4
    if (n > MaxComments) err()
    var ci = 0L
    while (ci < n) {
      val flen = t32le(q); q += 4
      if (flen > MaxTextBytes || q + flen > tags.length) err()
      val kv = new String(tags, q, flen.toInt,
        java.nio.charset.StandardCharsets.UTF_8)
      q += flen.toInt
      val eq = kv.indexOf('=')
      if (eq <= 0) err()
      out += OpusMeta("comment",
        kv.substring(0, eq).toUpperCase(java.util.Locale.ROOT),
        ci.toInt, 0, kv.substring(eq + 1))
      ci += 1
    }
    // bytes past the comments: the RFC's binary-suffix space, ignored
    out.result()
  }

  /** MPEG-1 Layer III bitrate table (kbps), index 1..14. */
  private val Mp3Bitrate = Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320, 0)
  private val Mp3Rate = Array(44100, 48000, 32000, 0)

  private def runMp3(b: Array[Byte]): Vector[Meta] = {
    def u8(p: Int): Int = { if (p < 0 || p >= b.length) err(); b(p) & 0xff }
    def syncsafe(p: Int): Int = {
      if ((u8(p) | u8(p + 1) | u8(p + 2) | u8(p + 3)) >= 0x80) err()
      (u8(p) << 21) | (u8(p + 1) << 14) | (u8(p + 2) << 7) | u8(p + 3)
    }
    val out = Vector.newBuilder[Meta]
    var p = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val ver = u8(3)
      if (ver != 3 && ver != 4) err()
      if (u8(5) != 0) err() // unsync/extended/footer: out of envelope
      val size = syncsafe(6)
      if (10 + size > b.length) err()
      var q = 10
      val tend = 10 + size
      var inFrames = true
      while (inFrames && q + 10 <= tend) {
        if (u8(q) == 0) inFrames = false // padding
        else {
          val id = new String(b, q, 4,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          if (!id.forall(c => (c >= 'A' && c <= 'Z') ||
              (c >= '0' && c <= '9'))) err()
          val fsz =
            if (ver == 4) syncsafe(q + 4)
            else (u8(q + 4) << 24) | (u8(q + 5) << 16) | (u8(q + 6) << 8) |
              u8(q + 7)
          if (fsz < 0 || q + 10 + fsz > tend) err()
          if (id.startsWith("T") && id != "TXXX" && fsz >= 1) {
            val enc = u8(q + 10)
            val raw = java.util.Arrays.copyOfRange(b, q + 11, q + 10 + fsz)
            val cs = enc match {
              case 0 => java.nio.charset.StandardCharsets.ISO_8859_1
              case 1 => java.nio.charset.StandardCharsets.UTF_16 // BOM
              case 2 => java.nio.charset.StandardCharsets.UTF_16BE
              case 3 => java.nio.charset.StandardCharsets.UTF_8
              case _ => err()
            }
            var s = new String(raw, cs)
            while (s.nonEmpty && s.charAt(s.length - 1) == '\u0000')
              s = s.substring(0, s.length - 1) // NUL-terminated texts
            out += Meta("tag", id, s, 0)
          }
          q += 10 + fsz
        }
      }
      p = tend
    }
    // first MPEG audio frame header
    if (p + 4 > b.length) err()
    if (u8(p) != 0xff || (u8(p + 1) & 0xe0) != 0xe0) err()
    val verBits = (u8(p + 1) >> 3) & 3
    val layerBits = (u8(p + 1) >> 1) & 3
    if (verBits != 3 || layerBits != 1) err() // MPEG-1 Layer III only
    val br = Mp3Bitrate((u8(p + 2) >> 4) & 0xf)
    val rate = Mp3Rate((u8(p + 2) >> 2) & 3)
    if (br == 0 || rate == 0) err()
    val pad = (u8(p + 2) >> 1) & 1
    val flen = 144 * br * 1000 / rate + pad
    if (p + flen > b.length) err() // first frame must be whole
    out += Meta("stream", "mpeg_version", null, 1)
    out += Meta("stream", "layer", null, 3)
    out += Meta("stream", "bitrate_kbps", null, br)
    out += Meta("stream", "sample_rate", null, rate)
    out += Meta("stream", "frame_bytes", null, flen)
    out.result()
  }
}
