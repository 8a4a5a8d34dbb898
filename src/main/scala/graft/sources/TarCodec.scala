package graft.sources

/** Pure-Scala codec for POSIX ustar tar archives — the container the
  * reference's webdataset shards actually are (144-record tar files,
  * dataops/dataset.py:31; webdataset's contract is "a tar of
  * `<key>.<ext>` members, grouped by key"). Public format: 512-byte
  * headers (name 100, mode/uid/gid, size as 11-digit octal, mtime,
  * 8-space-blanked checksum summed over the header, typeflag '0',
  * `ustar` magic), member data zero-padded to 512, two zero blocks of
  * trailer.
  *
  * Same envelope discipline as [[NpyCodec]]/the TIFF codec: the
  * writer emits spec-conformant archives any `tar`/webdataset reader
  * accepts, and the reader returns None for anything it cannot
  * faithfully parse (bad checksum, truncated member, non-file
  * typeflags other than '0'/NUL) rather than throwing.
  */
object TarCodec {

  /** One archive member: webdataset-style `<key>.<ext>` name +
    * payload bytes. */
  case class Member(name: String, data: Array[Byte])

  private val BlockSize = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    val padded = ("0" * (width - 1 - s.length)) + s + "\u0000"
    padded.getBytes("US-ASCII")
  }

  /** Encode members into one ustar archive (order preserved). */
  def encode(members: Seq[Member]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { m =>
      require(m.name.getBytes("US-ASCII").length <= 100, s"name too long: ${m.name}")
      val header = new Array[Byte](BlockSize)
      def put(off: Int, bytes: Array[Byte]): Unit =
        System.arraycopy(bytes, 0, header, off, bytes.length)
      put(0, m.name.getBytes("US-ASCII"))
      put(100, octal(420, 8))          // mode 0644
      put(108, octal(0, 8))            // uid
      put(116, octal(0, 8))            // gid
      put(124, octal(m.data.length.toLong, 12))
      put(136, octal(0, 12))           // mtime 0 — deterministic shards
      java.util.Arrays.fill(header, 148, 156, ' '.toByte) // checksum blanks
      header(156) = '0'                // typeflag: regular file
      put(257, ("ustar\u0000" + "00").getBytes("US-ASCII")) // POSIX magic + version
      val sum = header.map(_ & 0xff).sum
      put(148, octal(sum.toLong, 7))   // 6 digits + NUL, trailing space
      header(155) = ' '
      out.write(header)
      out.write(m.data)
      val pad = (BlockSize - m.data.length % BlockSize) % BlockSize
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](2 * BlockSize)) // end-of-archive trailer
    out.toByteArray
  }

  /** Decode an archive; None on any structural violation. */
  def decode(bytes: Array[Byte]): Option[Seq[Member]] = {
    val members = Seq.newBuilder[Member]
    var pos = 0
    def parseOctal(off: Int, len: Int): Long = {
      val s = new String(bytes, off, len, "US-ASCII")
        .takeWhile(c => c >= '0' && c <= '7')
      if (s.isEmpty) -1L else java.lang.Long.parseLong(s, 8)
    }
    while (pos + BlockSize <= bytes.length) {
      if (bytes.slice(pos, pos + BlockSize).forall(_ == 0)) {
        // end-of-archive zero block
        return Some(members.result())
      }
      val nameEnd = {
        var i = pos; while (i < pos + 100 && bytes(i) != 0) i += 1; i
      }
      val name = new String(bytes, pos, nameEnd - pos, "US-ASCII")
      val size = parseOctal(pos + 124, 12)
      if (name.isEmpty || size < 0) return None
      // verify the header checksum with the field blanked
      val stored = parseOctal(pos + 148, 8)
      var sum = 0L
      var i = 0
      while (i < BlockSize) {
        sum += (if (i >= 148 && i < 156) ' '.toInt else bytes(pos + i) & 0xff)
        i += 1
      }
      if (stored != sum) return None
      val typeflag = bytes(pos + 156)
      if (typeflag != '0'.toByte && typeflag != 0) return None // files only
      val dataStart = pos + BlockSize
      if (size > Int.MaxValue || dataStart + size > bytes.length) return None
      members += Member(name,
        java.util.Arrays.copyOfRange(bytes, dataStart, (dataStart + size).toInt))
      val padded = ((size + BlockSize - 1) / BlockSize) * BlockSize
      pos = dataStart + padded.toInt
    }
    None // ran off the end without a trailer
  }

  /** Webdataset grouping: members sharing the dot-stripped prefix
    * form one record — `000001.txt` + `000001.cls` → key `000001`
    * with two named parts.
    *
    * Duplicate member names (legal in tar: appended members shadow
    * earlier ones) resolve LAST-WINS, deliberately matching
    * `tar -x` extraction semantics — `groupBy` preserves archive
    * order within each key and `toMap` keeps the later entry. A
    * dot-less member name yields the empty-string part key (the
    * whole name is the record key), consistent with webdataset's
    * "everything after the first dot is the extension" convention. */
  def groupByKey(members: Seq[Member]): Seq[(String, Map[String, Array[Byte]])] =
    members.groupBy(m => m.name.takeWhile(_ != '.'))
      .map { case (k, ms) =>
        k -> ms.map(m => m.name.dropWhile(_ != '.').drop(1) -> m.data).toMap
      }.toSeq.sortBy(_._1)
}
