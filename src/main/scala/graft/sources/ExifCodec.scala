package graft.sources

/** EXIF metadata codec — image-side PII curation: crawled JPEGs carry
  * camera metadata in an APP1 `Exif` segment (a TIFF 6.0 IFD tree),
  * and the GPS sub-IFD inside it is personal data a corpus pipeline
  * must surface before training (the image-side counterpart of the
  * text PII scrubbers in TextQueries). Orientation (tag 0x0112) also
  * feeds the decode path — a vision pipeline that ignores it trains
  * on rotated images.
  *
  * Walk: JPEG marker segments up to SOS/EOI; the first APP1 whose
  * payload starts `Exif\0\0` holds a TIFF block — byte order II/MM,
  * magic 42, IFD0, the EXIF (0x8769) and GPS (0x8825) sub-IFD
  * pointers, the next-IFD chain (thumbnail IFD1). Entry types: BYTE,
  * ASCII (NUL-stripped), SHORT, LONG, RATIONAL, UNDEFINED (emitted as
  * hex), SLONG, SRATIONAL; values over 4 bytes live at TIFF-relative
  * offsets. Every read is bounds-checked against the APP1 segment —
  * never the whole file.
  *
  * Contract: a JPEG with no Exif APP1 yields Some(empty) — absence of
  * metadata is data; a malformed TIFF block (bad magic, entry table
  * past the segment, looped IFD chain, count over [[MaxValues]])
  * refuses the whole file (None), the [[GzipCodec]] discipline.
  * Unknown entry TYPES are skipped per the TIFF forward-compat rule.
  * Never throws. */
object ExifCodec {

  /** One tag value: `ifd` ∈ ifd0/exif/gps/ifd1…; rationals carry
    * num/den (den=1 for integral types); ASCII and UNDEFINED carry
    * sval (UNDEFINED as lowercase hex) with num=den=0. */
  case class Tag(ifd: String, tag: Int, ttype: Int, idx: Int,
      num: Long, den: Long, sval: String)

  val MaxValues: Int = 65536
  val MaxIfds: Int = 16

  private final class Fail extends RuntimeException(null, null, false, false)
  private val fail = new Fail
  private def err(): Nothing = throw fail

  def parse(jpeg: Array[Byte]): Option[Vector[Tag]] =
    try Some(run(jpeg))
    catch { case _: Fail => None }

  /** The bare TIFF IFD walk over a standalone block — WebP's EXIF
    * chunk carries the TIFF bytes with no `Exif\0\0` prefix. */
  def parseTiff(block: Array[Byte]): Option[Vector[Tag]] =
    try Some(tiffWalk(block, 0, block.length))
    catch { case _: Fail => None }

  private def run(b: Array[Byte]): Vector[Tag] = {
    def u8(p: Int): Int = { if (p < 0 || p >= b.length) err(); b(p) & 0xff }
    if (b.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) err()
    // marker walk for the Exif APP1
    var p = 2
    var tiffAt = -1
    var tiffEnd = -1
    var done = false
    while (!done && tiffAt < 0) {
      if (u8(p) != 0xff) err()
      val m = u8(p + 1)
      if (m == 0xd9 || m == 0xda) done = true // EOI / SOS: no metadata
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) p += 2 // bare markers
      else {
        val len = (u8(p + 2) << 8) | u8(p + 3)
        if (len < 2 || p + 2 + len > b.length) err()
        if (m == 0xe1 && len >= 8 + 6 &&
            b(p + 4) == 'E' && b(p + 5) == 'x' && b(p + 6) == 'i' &&
            b(p + 7) == 'f' && b(p + 8) == 0 && b(p + 9) == 0) {
          tiffAt = p + 10
          tiffEnd = p + 2 + len
        }
        p += 2 + len
      }
    }
    if (tiffAt < 0) return Vector.empty
    tiffWalk(b, tiffAt, tiffEnd)
  }

  /** TIFF IFD tree in `b[tiffAt, tiffEnd)` → tag rows. Throws Fail. */
  private def tiffWalk(b: Array[Byte], tiffAt: Int,
      tiffEnd: Int): Vector[Tag] = {
    if (tiffEnd - tiffAt < 8) err()
    // TIFF block, all offsets relative to tiffAt, bounded by tiffEnd
    def t8(off: Long): Int = {
      val q = tiffAt + off
      if (off < 0 || q >= tiffEnd) err()
      b(q.toInt) & 0xff
    }
    val le = (t8(0), t8(1)) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => err()
    }
    def t16(off: Long): Int =
      if (le) t8(off) | (t8(off + 1) << 8)
      else (t8(off) << 8) | t8(off + 1)
    def t32(off: Long): Long =
      if (le) (t16(off) | (t16(off + 2).toLong << 16)) & 0xffffffffL
      else ((t16(off).toLong << 16) | t16(off + 2)) & 0xffffffffL

    if (t16(2) != 42) err()
    val out = Vector.newBuilder[Tag]
    var emitted = 0
    val seen = new java.util.HashSet[Long]()
    var nIfds = 0

    def typeSize(t: Int): Int = t match {
      case 1 | 2 | 7 => 1
      case 3 => 2
      case 4 | 9 => 4
      case 5 | 10 => 8
      case _ => 0 // unknown: skipped
    }

    def parseIfd(off0: Long, name: String): Unit = {
      if (off0 == 0) return
      if (!seen.add(off0) || nIfds >= MaxIfds) err() // loop / bomb
      nIfds += 1
      val n = t16(off0)
      if (off0 + 2 + n * 12L + 4 > tiffEnd - tiffAt) err()
      var i = 0
      var exifPtr = 0L
      var gpsPtr = 0L
      while (i < n) {
        val e = off0 + 2 + i * 12L
        val tag = t16(e)
        val ttype = t16(e + 2)
        val count = t32(e + 4)
        val sz = typeSize(ttype)
        if (sz > 0) {
          if (count > MaxValues || emitted + count > MaxValues) err()
          val byteLen = count * sz
          val vAt = if (byteLen <= 4) e + 8 else t32(e + 8)
          if (vAt + byteLen > tiffEnd - tiffAt) err()
          if (name == "ifd0" && tag == 0x8769 && ttype == 4 && count == 1)
            exifPtr = t32(vAt)
          else if (name == "ifd0" && tag == 0x8825 && ttype == 4 &&
              count == 1)
            gpsPtr = t32(vAt)
          else ttype match {
            case 2 =>
              val sb = new java.lang.StringBuilder()
              var k = 0L
              while (k < count) {
                val c = t8(vAt + k)
                if (c != 0) sb.append(c.toChar)
                k += 1
              }
              out += Tag(name, tag, ttype, 0, 0, 0, sb.toString)
              emitted += 1
            case 7 =>
              val sb = new java.lang.StringBuilder()
              var k = 0L
              while (k < count) {
                sb.append("%02x".format(t8(vAt + k)))
                k += 1
              }
              out += Tag(name, tag, ttype, 0, 0, 0, sb.toString)
              emitted += 1
            case _ =>
              var k = 0L
              while (k < count) {
                val at = vAt + k * sz
                val (num, den) = ttype match {
                  case 1 => (t8(at).toLong, 1L)
                  case 3 => (t16(at).toLong, 1L)
                  case 4 => (t32(at), 1L)
                  case 9 => (t32(at).toInt.toLong, 1L)
                  case 5 => (t32(at), t32(at + 4))
                  case 10 => (t32(at).toInt.toLong, t32(at + 4).toInt.toLong)
                  case _ => err()
                }
                out += Tag(name, tag, ttype, k.toInt, num, den, null)
                emitted += 1
                k += 1
              }
          }
        }
        i += 1
      }
      if (exifPtr != 0) parseIfd(exifPtr, "exif")
      if (gpsPtr != 0) parseIfd(gpsPtr, "gps")
      val next = t32(off0 + 2 + n * 12L)
      if (next != 0 && name == "ifd0") parseIfd(next, "ifd1")
    }

    parseIfd(t32(4), "ifd0")
    out.result()
  }
}
