package graft.sources

/** ZIP archive codec (PKWARE APPNOTE) — the other archive shape
  * datasets actually ship in next to tar/webdataset: Kaggle exports,
  * image-caption bundles, scraped-document drops. The reference's
  * artifact bundles are tar/npy/h5 (dataops/dataset.py); ZIP is the
  * same members-in-one-object idea with a central directory instead
  * of streamed headers — which is exactly what makes it scan-friendly
  * at 100 TB: the member table sits at the END of the object, so a
  * reader lists and range-reads members without touching the rest.
  *
  * Decode walks the spec structures: locate the End Of Central
  * Directory record (backward signature scan over the ≤64 KiB comment
  * tail), walk the central directory's file headers, then for each
  * member verify its local header and inflate (method 8, raw deflate
  * via [[java.util.zip.Inflater]]) or copy (method 0, stored), and
  * check CRC-32 + declared size.
  *
  * Contract discipline as the other container codecs: a structurally
  * broken ARCHIVE (bad EOCD/central-directory bounds or signatures,
  * counts over caps) refuses whole with None; a single bad MEMBER —
  * unsupported method (bzip2/lzma/zstd), encryption flag, local
  * header mismatch, deflate error, CRC or size mismatch — degrades
  * per member (skipped, the rest of the archive survives). Directory
  * entries (name ends '/') are structural, not data, and are not
  * emitted. ZIP64 archives are a documented refusal (EOCD counts of
  * 0xFFFF / sizes of 0xFFFFFFFF): the 4 GiB member ceiling already
  * exceeds the per-task budget this engine allows one object.
  */
object ZipCodec {

  case class Member(name: String, method: Int, data: Array[Byte])

  val MaxMembers: Int = 100000
  val MaxMemberBytes: Int = GzipCodec.MaxInflatedBytes
  val MaxTotalBytes: Long = 1L << 31

  private val EocdSig = 0x06054b50
  private val CenSig = 0x02014b50
  private val LocSig = 0x04034b50

  /** Decode an archive to its file members (per-member degrade), or
    * None if the central structure is broken. Never throws. */
  def decode(bytes: Array[Byte]): Option[Vector[Member]] = {
    val eocd = findEocd(bytes).getOrElse(return None)
    val total = u16(bytes, eocd + 10)
    val cdSize = u32(bytes, eocd + 12)
    val cdOff = u32(bytes, eocd + 16)
    if (total == 0xffff || cdOff == 0xffffffffL) return None // ZIP64
    if (total > MaxMembers) return None
    if (cdOff + cdSize > eocd) return None
    val out = Vector.newBuilder[Member]
    var p = cdOff.toInt
    var n = 0
    var budget = MaxTotalBytes
    while (n < total) {
      if (p + 46 > bytes.length || u32(bytes, p) != CenSig) return None
      val flags = u16(bytes, p + 8)
      val method = u16(bytes, p + 10)
      val crc = u32(bytes, p + 16)
      val csize = u32(bytes, p + 20)
      val usize = u32(bytes, p + 24)
      val nameLen = u16(bytes, p + 28)
      val extraLen = u16(bytes, p + 30)
      val commentLen = u16(bytes, p + 32)
      val locOff = u32(bytes, p + 42)
      if (p + 46 + nameLen > bytes.length) return None
      val name = new String(bytes, p + 46, nameLen, "UTF-8")
      p += 46 + nameLen + extraLen + commentLen
      n += 1
      if (!name.endsWith("/")) {
        if (csize == 0xffffffffL || usize == 0xffffffffL) return None // ZIP64
        if (usize <= MaxMemberBytes && usize <= budget)
          member(bytes, name, flags, method, crc, csize.toInt, usize.toInt,
            locOff).foreach { m => budget -= m.data.length; out += m }
      }
    }
    Some(out.result())
  }

  /** One member: local-header check + decompress + CRC/size verify.
    * None skips the member, not the archive. */
  private def member(
      bytes: Array[Byte], name: String, flags: Int, method: Int, crc: Long,
      csize: Int, usize: Int, locOff: Long): Option[Member] = {
    if ((flags & 0x1) != 0) return None // encrypted
    if (locOff + 30 > bytes.length || u32(bytes, locOff.toInt) != LocSig)
      return None
    val lp = locOff.toInt
    val lNameLen = u16(bytes, lp + 26)
    val lExtraLen = u16(bytes, lp + 28)
    val dataOff = lp + 30 + lNameLen + lExtraLen
    if (csize < 0 || dataOff.toLong + csize > bytes.length) return None
    val data: Array[Byte] = method match {
      case 0 =>
        if (csize != usize) return None
        java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + csize)
      case 8 => inflateRaw(bytes, dataOff, csize, usize).getOrElse(return None)
      case _ => return None // bzip2/lzma/zstd/etc: unsupported method
    }
    if (data.length != usize) return None
    val c = new java.util.zip.CRC32()
    c.update(data)
    if (c.getValue != crc) return None
    Some(Member(name, method, data))
  }

  /** Raw-deflate inflate with an exact output budget. */
  private def inflateRaw(
      bytes: Array[Byte], off: Int, len: Int, usize: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(bytes, off, len)
      val out = new Array[Byte](usize)
      var done = 0
      while (done < usize) {
        val n = inf.inflate(out, done, usize - done)
        if (n == 0) {
          if (inf.finished() || inf.needsDictionary() || inf.needsInput())
            return None
        }
        done += n
      }
      // the stream must END here: a probe byte catches oversize output
      // (finished() alone can be false until the final block is read)
      val probe = new Array[Byte](1)
      if (inf.inflate(probe, 0, 1) > 0) return None
      Some(out)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** Backward scan for the EOCD signature within the spec's maximum
    * comment span (22-byte record + ≤65535 comment bytes). */
  private def findEocd(bytes: Array[Byte]): Option[Int] = {
    val floor = math.max(0, bytes.length - 22 - 65535)
    var p = bytes.length - 22
    while (p >= floor) {
      if (u32(bytes, p) == EocdSig &&
        p + 22 + u16(bytes, p + 20) == bytes.length) return Some(p)
      p -= 1
    }
    None
  }

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], p: Int): Long =
    (u16(b, p) | (u16(b, p + 2).toLong << 16)) & 0xffffffffL
}
