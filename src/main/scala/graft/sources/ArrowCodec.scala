package graft.sources

/** Arrow IPC codec — the columnar interchange format dataset tooling
  * actually trades: Feather V2 exports (IPC FILE format, trailing
  * footer) and the HuggingFace-datasets cache shape (IPC STREAM
  * format, sequential encapsulated messages). The reference moves
  * tabular artifacts as npy/h5/csv (dataops/dataset.py); Arrow is the
  * same columns-in-one-object idea with a zero-copy layout — the
  * trailing footer of the file format is what makes it range-read
  * friendly on an object store, exactly like ZIP's central directory.
  *
  * Everything is decoded from the public format specification: the
  * flatbuffers tables (Footer/Schema/Field/Message/RecordBatch — a
  * from-scratch vtable walker, no flatbuffers library), the
  * encapsulated-message framing (0xFFFFFFFF continuation + metadata
  * length + body), and the per-column buffer layout (validity bitmap,
  * offsets, data, in depth-first field order). Fixtures are written
  * by pyarrow — the format's reference implementation — so two
  * independent implementations meet over the wire.
  *
  * Envelope: Int 8/16/32/64 (signed+unsigned), FloatingPoint
  * half/single/double, Bool, Utf8, Binary, List<primitive> and
  * FixedSizeList<primitive>. Documented refusals, all whole-file (a
  * columnar table is all-or-nothing): dictionary encoding, compressed
  * bodies (BodyCompression), other logical types, nesting deeper than
  * one list level. Values emit as raw little-endian bits zero-extended
  * to a long (bit-exact NaN payloads), strings as UTF-8, binary as
  * lowercase hex. Never throws.
  */
object ArrowCodec {

  /** One value cell. For list columns: a NULL list is a single row
    * with `elem` null carrying the COLUMN vtype; elements carry the
    * leaf vtype and their element index. */
  case class Cell(batch: Int, col: String, row: Long, elem: Option[Long],
      vtype: String, isNull: Boolean, bits: Option[Long], str: Option[String])

  val MaxCells: Long = 4L << 20
  val MaxBatches: Int = 65536
  val MaxFields: Int = 4096
  val MaxMetaBytes: Int = 1 << 20

  private final class Fail extends RuntimeException(null, null, false, false)
  private val fail = new Fail
  private def err(): Nothing = throw fail

  /** Decode a `.arrow` object in either IPC framing, or None on any
    * structural fault or envelope refusal. Never throws. */
  def decode(bytes: Array[Byte]): Option[Vector[Cell]] =
    try {
      if (bytes.length >= 12 && hasMagic(bytes, 0) &&
          bytes(6) == 0 && bytes(7) == 0) decodeFile(bytes)
      else decodeStream(bytes)
    } catch { case _: Fail => None }

  // ---- byte readers (every access bounds-checked) --------------------

  private def u8(b: Array[Byte], p: Long): Int = {
    if (p < 0 || p + 1 > b.length) err()
    b(p.toInt) & 0xff
  }
  private def uN(b: Array[Byte], p: Long, n: Int): Long = {
    if (p < 0 || p + n > b.length) err()
    var v = 0L; var j = 0
    while (j < n) { v |= (b(p.toInt + j) & 0xffL) << (8 * j); j += 1 }
    v
  }
  private def i16(b: Array[Byte], p: Long): Int = uN(b, p, 2).toShort.toInt
  private def i32(b: Array[Byte], p: Long): Int = uN(b, p, 4).toInt
  private def u32(b: Array[Byte], p: Long): Long = uN(b, p, 4)
  private def i64(b: Array[Byte], p: Long): Long = uN(b, p, 8)

  private def hasMagic(b: Array[Byte], p: Int): Boolean =
    b.length >= p + 6 && b(p) == 'A' && b(p + 1) == 'R' && b(p + 2) == 'R' &&
      b(p + 3) == 'O' && b(p + 4) == 'W' && b(p + 5) == '1'

  // ---- minimal flatbuffers vtable walk -------------------------------

  /** Absolute position of table field `id`, or -1 if absent. */
  private def field(b: Array[Byte], tpos: Long, id: Int): Long = {
    val vt = tpos - i32(b, tpos)
    if (vt < 0) err()
    val vtSize = uN(b, vt, 2)
    val slot = 4 + 2 * id
    if (slot + 2 > vtSize) -1L
    else {
      val fo = uN(b, vt + slot, 2)
      if (fo == 0) -1L else tpos + fo
    }
  }
  /** Follow a table/string/vector offset field to its target. */
  private def indirect(b: Array[Byte], p: Long): Long = {
    val t = p + u32(b, p)
    if (t < 0 || t > b.length) err()
    t
  }
  private def str(b: Array[Byte], p: Long): String = {
    val t = indirect(b, p)
    val n = u32(b, t)
    if (n > MaxMetaBytes || t + 4 + n > b.length) err()
    new String(b, (t + 4).toInt, n.toInt, java.nio.charset.StandardCharsets.UTF_8)
  }
  /** (element count, absolute position of element 0). */
  private def vec(b: Array[Byte], p: Long, stride: Int): (Long, Long) = {
    val t = indirect(b, p)
    val n = u32(b, t)
    if (n * stride + t + 4 > b.length) err()
    (n, t + 4)
  }

  // ---- schema ---------------------------------------------------------

  private sealed trait Typ { def label: String }
  private case class Prim(label: String, width: Int) extends Typ // LE fixed width
  private case object BoolT extends Typ { val label = "bool" }
  private case class VarBytes(label: String) extends Typ // utf8 / bin
  private case class ListT(child: Prim, childBool: Boolean, fixed: Int,
      label: String) extends Typ

  private case class FieldSpec(name: String, typ: Typ)

  /** Parse a Field table (Schema.fbs): name(0) nullable(1)
    * type_type(2) type(3) dictionary(4) children(5). */
  private def parseField(b: Array[Byte], fpos: Long, depth: Int): FieldSpec = {
    val namePos = field(b, fpos, 0)
    if (namePos < 0) err()
    val name = str(b, namePos)
    if (field(b, fpos, 4) >= 0) err() // dictionary-encoded: refuse
    val ttPos = field(b, fpos, 2)
    val tt = if (ttPos < 0) 0 else u8(b, ttPos)
    val tvPos = field(b, fpos, 3)
    def typeTable: Long = { if (tvPos < 0) err(); indirect(b, tvPos) }
    def childField(i: Int): Long = {
      val ch = field(b, fpos, 5)
      if (ch < 0) err()
      val (n, at) = vec(b, ch, 4)
      if (i >= n) err()
      indirect(b, at + 4L * i)
    }
    val typ: Typ = tt match {
      case 2 => // Int: bitWidth(0) is_signed(1)
        val t = typeTable
        val bwPos = field(b, t, 0)
        val bw = if (bwPos < 0) 0 else i32(b, bwPos)
        val sgPos = field(b, t, 1)
        val signed = sgPos >= 0 && u8(b, sgPos) != 0
        if (bw != 8 && bw != 16 && bw != 32 && bw != 64) err()
        Prim((if (signed) "i" else "u") + bw, bw / 8)
      case 3 => // FloatingPoint: precision(0) 0=half 1=single 2=double
        // HALF is the enum's zero value, so flatbuffers OMITS the
        // field for f16 — absent means half, not malformed
        val t = typeTable
        val prPos = field(b, t, 0)
        (if (prPos < 0) 0 else i16(b, prPos)) match {
          case 0 => Prim("f16", 2)
          case 1 => Prim("f32", 4)
          case 2 => Prim("f64", 8)
          case _ => err()
        }
      case 4 => VarBytes("bin")
      case 5 => VarBytes("utf8")
      case 6 => BoolT
      case 12 => // List
        if (depth > 0) err()
        parseField(b, childField(0), depth + 1).typ match {
          case p: Prim => ListT(p, childBool = false, fixed = 0, s"list<${p.label}>")
          case BoolT => ListT(Prim("bool", 0), childBool = true, 0, "list<bool>")
          case _ => err()
        }
      case 16 => // FixedSizeList: listSize(0)
        if (depth > 0) err()
        val lsPos = field(b, typeTable, 0)
        val ls = if (lsPos < 0) err() else i32(b, lsPos)
        if (ls <= 0 || ls > 65536) err()
        parseField(b, childField(0), depth + 1).typ match {
          case p: Prim => ListT(p, childBool = false, ls, s"fsl$ls<${p.label}>")
          case BoolT => ListT(Prim("bool", 0), childBool = true, ls, s"fsl$ls<bool>")
          case _ => err()
        }
      case _ => err() // Null/Decimal/Date/Time/Timestamp/Struct/Union/...: refuse
    }
    FieldSpec(name, typ)
  }

  /** Parse a Schema table: fields(1). */
  private def parseSchema(b: Array[Byte], spos: Long): Vector[FieldSpec] = {
    val fPos = field(b, spos, 1)
    if (fPos < 0) err()
    val (n, at) = vec(b, fPos, 4)
    if (n > MaxFields) err()
    (0L until n).map(i => parseField(b, indirect(b, at + 4 * i), 0)).toVector
  }

  // ---- record batch ---------------------------------------------------

  /** Decode one RecordBatch message body into cells. */
  private def decodeBatch(b: Array[Byte], rbPos: Long, bodyAt: Long,
      bodyLen: Long, fields: Vector[FieldSpec], batchIdx: Int,
      out: scala.collection.mutable.ArrayBuffer[Cell]): Unit = {
    if (field(b, rbPos, 3) >= 0) err() // BodyCompression: refuse
    val lenPos = field(b, rbPos, 0)
    val rows = if (lenPos < 0) 0L else i64(b, lenPos)
    if (rows < 0 || rows > MaxCells) err()
    val nodesPos = field(b, rbPos, 1)
    val bufsPos = field(b, rbPos, 2)
    if (nodesPos < 0 || bufsPos < 0) err()
    val (nNodes, nodesAt) = vec(b, nodesPos, 16)
    val (nBufs, bufsAt) = vec(b, bufsPos, 16)
    var ni = 0L
    var bi = 0L
    def nextNode(): (Long, Long) = {
      if (ni >= nNodes) err()
      val p = nodesAt + 16 * ni; ni += 1
      (i64(b, p), i64(b, p + 8)) // (length, null_count)
    }
    def nextBuf(): (Long, Long) = {
      if (bi >= nBufs) err()
      val p = bufsAt + 16 * bi; bi += 1
      val off = i64(b, p); val len = i64(b, p + 8)
      if (off < 0 || len < 0 || off + len > bodyLen) err()
      (bodyAt + off, len)
    }
    // validity bitmap reader; a zero-length buffer means all-valid
    def valid(buf: (Long, Long), n: Long): Long => Boolean = {
      val (at, len) = buf
      if (len == 0) _ => true
      else { i => if (i / 8 >= len) err() else (u8(b, at + i / 8) >> (i % 8).toInt & 1) == 1 }
    }
    def bitsAt(at: Long, width: Int, i: Long): Long = uN(b, at + i * width, width)
    def boolAt(at: Long, dlen: Long, i: Long): Long = {
      if (i / 8 >= dlen) err()
      (u8(b, at + i / 8) >> (i % 8).toInt & 1).toLong
    }
    if (out.size + rows * fields.size > MaxCells) err()

    for (f <- fields) f.typ match {
      case Prim(label, width) =>
        val (len, _) = nextNode()
        if (len != rows) err()
        val v = valid(nextBuf(), len)
        val (dat, dlen) = nextBuf()
        var i = 0L
        while (i < len) {
          if (v(i)) {
            if ((i + 1) * width > dlen) err()
            out += Cell(batchIdx, f.name, i, None, label, isNull = false,
              Some(bitsAt(dat, width, i)), None)
          } else out += Cell(batchIdx, f.name, i, None, label, isNull = true, None, None)
          i += 1
        }
      case BoolT =>
        val (len, _) = nextNode()
        if (len != rows) err()
        val v = valid(nextBuf(), len)
        val (dat, dlen) = nextBuf()
        var i = 0L
        while (i < len) {
          if (v(i)) out += Cell(batchIdx, f.name, i, None, "bool", isNull = false,
            Some(boolAt(dat, dlen, i)), None)
          else out += Cell(batchIdx, f.name, i, None, "bool", isNull = true, None, None)
          i += 1
        }
      case VarBytes(label) =>
        val (len, _) = nextNode()
        if (len != rows) err()
        val v = valid(nextBuf(), len)
        val (offs, olen) = nextBuf()
        if ((len + 1) * 4 > olen) err()
        val (dat, dlen) = nextBuf()
        var i = 0L
        while (i < len) {
          if (v(i)) {
            val s = u32(b, offs + 4 * i)
            val e = u32(b, offs + 4 * (i + 1))
            if (e < s || e > dlen) err()
            val raw = new Array[Byte]((e - s).toInt)
            System.arraycopy(b, (dat + s).toInt, raw, 0, raw.length)
            val text =
              if (label == "utf8")
                new String(raw, java.nio.charset.StandardCharsets.UTF_8)
              else raw.map(x => f"${x & 0xff}%02x").mkString
            out += Cell(batchIdx, f.name, i, None, label, isNull = false, None, Some(text))
          } else out += Cell(batchIdx, f.name, i, None, label, isNull = true, None, None)
          i += 1
        }
      case ListT(child, childBool, fixed, label) =>
        val (len, _) = nextNode()
        if (len != rows) err()
        val v = valid(nextBuf(), len)
        val (offs, olen) =
          if (fixed == 0) nextBuf() else (0L, 0L)
        if (fixed == 0 && (len + 1) * 4 > olen) err()
        val (clen, _) = nextNode()
        val cv = valid(nextBuf(), clen)
        val (cdat, cdlen) = nextBuf()
        def childCell(row: Long, k: Long, ci: Long): Cell =
          if (!cv(ci))
            Cell(batchIdx, f.name, row, Some(k), child.label, isNull = true, None, None)
          else if (childBool)
            Cell(batchIdx, f.name, row, Some(k), "bool", isNull = false,
              Some(boolAt(cdat, cdlen, ci)), None)
          else {
            if ((ci + 1) * child.width > cdlen) err()
            Cell(batchIdx, f.name, row, Some(k), child.label, isNull = false,
              Some(bitsAt(cdat, child.width, ci)), None)
          }
        var i = 0L
        while (i < len) {
          if (!v(i))
            out += Cell(batchIdx, f.name, i, None, label, isNull = true, None, None)
          else if (fixed > 0) {
            var k = 0L
            while (k < fixed) {
              if (out.size >= MaxCells) err()
              out += childCell(i, k, i * fixed + k); k += 1
            }
          } else {
            val s = u32(b, offs + 4 * i)
            val e = u32(b, offs + 4 * (i + 1))
            if (e < s || e > clen) err()
            var k = 0L
            while (k < e - s) {
              if (out.size >= MaxCells) err()
              out += childCell(i, k, s + k); k += 1
            }
          }
          i += 1
        }
    }
  }

  // ---- message framing ------------------------------------------------

  /** Parse the encapsulated message at `p`: returns (message table
    * position, body position, body length, next position), or None at
    * a clean end-of-stream marker. */
  private def message(b: Array[Byte], p: Long): Option[(Long, Long, Long, Long)] = {
    var q = p
    var metaLen = u32(b, q)
    q += 4
    if (metaLen == 0xffffffffL) { metaLen = u32(b, q); q += 4 } // continuation
    if (metaLen == 0) return None // end-of-stream
    if (metaLen > MaxMetaBytes || q + metaLen > b.length) err()
    val root = q + u32(b, q)
    if (root >= q + metaLen) err()
    val blPos = field(b, root, 3)
    val bodyLen = if (blPos < 0) 0L else i64(b, blPos)
    if (bodyLen < 0 || q + metaLen + bodyLen > b.length) err()
    Some((root, q + metaLen, bodyLen, q + metaLen + bodyLen))
  }

  private def headerOf(b: Array[Byte], msgPos: Long, wantType: Int): Long = {
    val htPos = field(b, msgPos, 1)
    val ht = if (htPos < 0) 0 else u8(b, htPos)
    if (ht != wantType) err() // DictionaryBatch (2) lands here: refuse
    val hPos = field(b, msgPos, 2)
    if (hPos < 0) err()
    indirect(b, hPos)
  }

  // ---- the two framings -----------------------------------------------

  /** FILE format: trailing footer names the schema + batch blocks. */
  private def decodeFile(b: Array[Byte]): Option[Vector[Cell]] = {
    val n = b.length
    if (n < 8 + 10 || !hasMagic(b, n - 6)) err()
    val footerLen = u32(b, n - 10L)
    val footerPos = n - 10L - footerLen
    if (footerLen < 4 || footerPos < 8) err()
    val root = footerPos + u32(b, footerPos)
    // Footer: version(0) schema(1) dictionaries(2) recordBatches(3)
    val dicPos = field(b, root, 2)
    if (dicPos >= 0 && vec(b, dicPos, 24)._1 > 0) err() // dictionary batches: refuse
    val sPos = field(b, root, 1)
    if (sPos < 0) err()
    val fields = parseSchema(b, indirect(b, sPos))
    val rbPos = field(b, root, 3)
    if (rbPos < 0) err()
    val (nb, at) = vec(b, rbPos, 24)
    if (nb > MaxBatches) err()
    val out = scala.collection.mutable.ArrayBuffer.empty[Cell]
    var i = 0L
    while (i < nb) {
      val p = at + 24 * i
      val off = i64(b, p)
      val metaDataLen = i32(b, p + 8)
      val bodyLen = i64(b, p + 16)
      if (off < 0 || metaDataLen < 8 || bodyLen < 0 ||
          off + metaDataLen + bodyLen > n) err()
      val (msgRoot, _, _, _) = message(b, off).getOrElse(err())
      val rb = headerOf(b, msgRoot, 3)
      decodeBatch(b, rb, off + metaDataLen, bodyLen, fields, i.toInt, out)
      i += 1
    }
    Some(out.toVector)
  }

  /** STREAM format: Schema message, then RecordBatch messages, then
    * an end-of-stream marker (or clean EOF). */
  private def decodeStream(b: Array[Byte]): Option[Vector[Cell]] = {
    val (sRoot, _, _, afterSchema) = message(b, 0).getOrElse(err())
    val fields = parseSchema(b, headerOf(b, sRoot, 1))
    val out = scala.collection.mutable.ArrayBuffer.empty[Cell]
    var p = afterSchema
    var batch = 0
    var done = false
    while (!done && p < b.length) {
      message(b, p) match {
        case None => done = true
        case Some((mRoot, bodyAt, bodyLen, next)) =>
          if (batch >= MaxBatches) err()
          val rb = headerOf(b, mRoot, 3)
          decodeBatch(b, rb, bodyAt, bodyLen, fields, batch, out)
          batch += 1
          p = next
      }
    }
    Some(out.toVector)
  }
}
