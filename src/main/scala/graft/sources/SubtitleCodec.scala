package graft.sources

/** WebVTT / SRT subtitle codec — the caption layer of every video
  * corpus (YouTube-style ASR ships WebVTT; movie/TV corpora SRT), and
  * the text half of caption-to-frame alignment (q_caption_align joins
  * these cues to [[Mp4Codec]] sample timestamps — how video-text
  * training pairs are built).
  *
  * VTT per the W3C format: optional BOM, a `WEBVTT` header line,
  * blank-line-separated blocks, NOTE/STYLE/REGION blocks skipped, an
  * optional cue identifier line, `HH:MM:SS.mmm --> HH:MM:SS.mmm`
  * timings (hours optional) with cue settings after the end stamp
  * ignored, multi-line payloads joined with `\n`. SRT: numeric
  * counter lines, comma decimal separators, CRLF tolerated.
  *
  * Refusal contract (the [[GzipCodec]] discipline): whole-file None
  * on a missing VTT header, an unparseable timing line, end ≤ start,
  * cue count over [[MaxCues]], or (SRT) no cue at all. Never throws. */
object SubtitleCodec {

  /** One cue: 0-based index in file order, [startMs, endMs) wall
    * time, payload text (lines joined with `\n`). */
  case class Cue(idx: Int, startMs: Long, endMs: Long, text: String)

  val MaxCues: Int = 100000

  private val VttTime =
    """(?:(\d{1,4}):)?(\d{2}):(\d{2})\.(\d{3})""".r
  private val SrtTime =
    """(\d{1,4}):(\d{2}):(\d{2}),(\d{3})""".r

  private def ms(h: String, m: String, s: String, f: String): Long =
    (if (h == null) 0L else h.toLong * 3600000L) +
      m.toLong * 60000L + s.toLong * 1000L + f.toLong

  private def lines(bytes: Array[Byte]): Array[String] = {
    var text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    if (text.nonEmpty && text.charAt(0) == '\uFEFF') text = text.substring(1)
    text.replace("\r\n", "\n").replace("\r", "\n").split("\n", -1)
  }

  /** Blocks = runs of non-blank lines. */
  private def blocks(ls: Array[String]): Vector[Vector[String]] = {
    val out = Vector.newBuilder[Vector[String]]
    var cur = Vector.newBuilder[String]
    var any = false
    ls.foreach { l =>
      if (l.trim.isEmpty) {
        if (any) { out += cur.result(); cur = Vector.newBuilder; any = false }
      } else { cur += l; any = true }
    }
    if (any) out += cur.result()
    out.result()
  }

  def decodeVtt(bytes: Array[Byte]): Option[Vector[Cue]] = {
    val ls = lines(bytes)
    if (ls.isEmpty || !ls(0).startsWith("WEBVTT")) return None
    // skip the entire HEADER BLOCK, not just the WEBVTT line: spec-
    // valid files may attach metadata lines directly under WEBVTT
    // without a blank line ('WEBVTT\nKind: captions\n\n...', common
    // YouTube-style ASR output) — those lines lack '-->' and would
    // otherwise refuse the whole file. If a (spec-malformed) file
    // glues the first cue into the header block, keep the cue part.
    val all = blocks(ls)
    val bs =
      if (all.isEmpty) Vector.empty[Vector[String]]
      else {
        val cueAt = all(0).indexWhere(_.contains("-->"))
        if (cueAt < 0) all.drop(1)
        else all(0).drop(cueAt) +: all.drop(1)
      }
    val out = Vector.newBuilder[Cue]
    var idx = 0
    var bad = false
    bs.foreach { b =>
      val head = b(0).trim
      if (head.startsWith("NOTE") || head == "STYLE" ||
          head.startsWith("REGION")) {
        () // metadata block: skipped whole
      } else {
        // optional identifier line before the timing line
        val tl = if (b(0).contains("-->")) 0
          else if (b.length > 1 && b(1).contains("-->")) 1
          else -1
        if (tl < 0) bad = true
        else parseTiming(b(tl), vtt = true) match {
          case Some((s, e)) if e > s && idx < MaxCues =>
            out += Cue(idx, s, e, b.drop(tl + 1).mkString("\n"))
            idx += 1
          case _ => bad = true
        }
      }
    }
    if (bad) None else Some(out.result())
  }

  def decodeSrt(bytes: Array[Byte]): Option[Vector[Cue]] = {
    val bs = blocks(lines(bytes))
    if (bs.isEmpty) return None
    val out = Vector.newBuilder[Cue]
    var idx = 0
    var bad = false
    bs.foreach { b =>
      // counter line, then timing, then payload
      val tl = if (b(0).forall(_.isDigit) && b.length > 1 &&
        b(1).contains("-->")) 1
      else if (b(0).contains("-->")) 0
      else -1
      if (tl < 0) bad = true
      else parseTiming(b(tl), vtt = false) match {
        case Some((s, e)) if e > s && idx < MaxCues =>
          out += Cue(idx, s, e, b.drop(tl + 1).mkString("\n"))
          idx += 1
        case _ => bad = true
      }
    }
    if (bad || idx == 0) None else Some(out.result())
  }

  private def parseTiming(line: String, vtt: Boolean): Option[(Long, Long)] = {
    val parts = line.split("-->")
    if (parts.length != 2) return None
    val a = parts(0).trim
    // cue settings may follow the end stamp (VTT): take the first token
    val bTok = parts(1).trim.split("""\s+""")(0)
    (if (vtt) (a, bTok) match {
      case (VttTime(h1, m1, s1, f1), VttTime(h2, m2, s2, f2)) =>
        Some((ms(h1, m1, s1, f1), ms(h2, m2, s2, f2)))
      case _ => None
    }
    else (a, bTok) match {
      case (SrtTime(h1, m1, s1, f1), SrtTime(h2, m2, s2, f2)) =>
        Some((ms(h1, m1, s1, f1), ms(h2, m2, s2, f2)))
      case _ => None
    })
  }
}
