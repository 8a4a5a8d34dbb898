package graft.sources

/** MediaWiki dump parser — Wikipedia's `pages-articles.xml.bz2` is in
  * every serious pretraining mix (The Pile, RedPajama, Dolma all
  * carry a wiki slice), and it ships exactly this shape: a bzip2
  * stream of machine-generated `<mediawiki>` XML with one `<page>`
  * element per article. Composes with [[Bz2Codec]] for the wire
  * format.
  *
  * This is deliberately NOT a general XML parser: dump files are
  * machine-written with a fixed element layout, so the scan walks
  * literal `<page>`/`</page>` spans and pulls the leading `<title>`,
  * `<ns>`, first `<id>` (the page id — revision ids come later),
  * optional `<redirect title="..."/>`, and the revision `<text>`
  * body, decoding the XML character entities MediaWiki escapes
  * content with (`&lt; &gt; &quot; &apos; &amp;` + numeric, amp
  * last). Contract: a payload that is not a mediawiki document
  * refuses whole (None); a structurally broken PAGE inside a valid
  * dump is skipped (per-page degrade). Never throws. */
object WikiXml {

  case class Page(id: Long, ns: Int, title: String, redirect: Option[String],
      text: String)

  val MaxPages: Int = 1 << 20

  /** Parse a decoded dump document. */
  def parse(xml: String): Option[Vector[Page]] = {
    val head = xml.indexOf("<mediawiki")
    if (head < 0 || head > 4096) return None
    val out = Vector.newBuilder[Page]
    var from = head
    var n = 0
    var done = false
    while (!done && n < MaxPages) {
      val s = xml.indexOf("<page>", from)
      if (s < 0) done = true
      else {
        val e = xml.indexOf("</page>", s)
        if (e < 0) done = true // truncated trailing page: skip
        else {
          page(xml.substring(s, e)).foreach { p => out += p; n += 1 }
          from = e + 7
        }
      }
    }
    Some(out.result())
  }

  /** One page span → Page, or None to skip it. */
  private def page(s: String): Option[Page] = {
    def elem(tag: String): Option[String] = {
      val open = s.indexOf(s"<$tag>")
      val openAttr = s.indexOf(s"<$tag ")
      val at = if (open < 0) openAttr
        else if (openAttr < 0) open else math.min(open, openAttr)
      if (at < 0) return None
      val gt = s.indexOf('>', at)
      if (gt < 0) return None
      if (s.charAt(gt - 1) == '/') return Some("") // self-closing
      val close = s.indexOf(s"</$tag>", gt)
      if (close < 0) return None
      Some(s.substring(gt + 1, close))
    }
    val title = elem("title").map(unescape).getOrElse(return None)
    val ns = elem("ns").flatMap(_.trim.toIntOption).getOrElse(return None)
    val id = elem("id").flatMap(_.trim.toLongOption).getOrElse(return None)
    val redirect = {
      val at = s.indexOf("<redirect ")
      if (at < 0) None
      else {
        val a = s.indexOf("title=\"", at)
        val gt = s.indexOf('>', at)
        if (a < 0 || gt < 0 || a > gt) None
        else {
          val b = s.indexOf('"', a + 7)
          if (b < 0 || b > gt) None else Some(unescape(s.substring(a + 7, b)))
        }
      }
    }
    val text = elem("text").map(unescape).getOrElse(return None)
    Some(Page(id, ns, title, redirect, text))
  }

  /** XML character-entity decode — a single LEFT-TO-RIGHT pass (named
    * + numeric), so `&amp;lt;` yields the literal `&lt;` and
    * `&#38;lt;` yields `&lt;` too: sequential replace chains would
    * double-decode both. Unknown entities pass through verbatim. */
  def unescape(s: String): String = {
    if (!s.contains('&')) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      var consumed = false
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi <= i + 10) {
          val body = s.substring(i + 1, semi)
          val rep: String = body match {
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "amp" => "&"
            case b if b.length > 1 && b.charAt(0) == '#' =>
              val hex = b.charAt(1) == 'x' || b.charAt(1) == 'X'
              val digits = b.substring(if (hex) 2 else 1)
              val cp =
                if (digits.isEmpty) -1
                else try Integer.parseInt(digits, if (hex) 16 else 10)
                catch { case _: NumberFormatException => -1 }
              if (cp >= 0 && cp <= 0x10ffff && Character.isValidCodePoint(cp))
                new String(Character.toChars(cp))
              else null
            case _ => null
          }
          if (rep != null) { out.append(rep); i = semi + 1; consumed = true }
        }
      }
      if (!consumed) { out.append(c); i += 1 }
    }
    out.toString
  }
}
