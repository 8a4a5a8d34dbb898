package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GzipCodec, WarcCodec, ZstdCodec}

/** Contract specs for the Common Crawl wire-format codecs: WARC
  * record walk + HTTP payload decode, and the zstd shard envelope.
  * The committed foreign fixtures (tools/warc_golden.py — Python
  * gzip + libzstd bytes) pin cross-writer compatibility; the
  * handwritten cases pin the refusal contract hostile bytes attack. */
class WarcCodecSpec extends AnyFunSuite {

  private def crlf(lines: String*): Array[Byte] =
    lines.mkString("", "\r\n", "\r\n").getBytes("ISO-8859-1")

  private def rec(body: Array[Byte], hdrs: String*): Array[Byte] =
    crlf((Seq("WARC/1.0") ++ hdrs ++ Seq(s"Content-Length: ${body.length}", "")): _*) ++
      body ++ "\r\n\r\n".getBytes

  private val basic = rec("hello block".getBytes,
    "WARC-Type: resource", "WARC-Record-ID: <urn:uuid:1>",
    "WARC-Date: 2026-08-14T00:00:00Z", "WARC-Target-URI: https://x.test/page")

  test("single record parses with headers and exact block") {
    val rs = WarcCodec.parse(basic).get
    assert(rs.length == 1)
    val r = rs.head
    assert(r.warcType == "resource")
    assert(r.targetUri == "https://x.test/page")
    assert(new String(r.block) == "hello block")
  }

  test("multiple records parse in order; idx increments") {
    val two = basic ++ rec("second".getBytes, "WARC-Type: metadata")
    val rs = WarcCodec.parse(two).get
    assert(rs.map(_.idx) == Vector(0, 1))
    assert(rs(1).warcType == "metadata")
    assert(new String(rs(1).block) == "second")
  }

  test("refusals: truncation, bad version, LF-only, bad length, missing trailer") {
    assert(WarcCodec.parse(Array.emptyByteArray).isEmpty)
    assert(WarcCodec.parse(basic.dropRight(1)).isEmpty)       // trailer cut
    assert(WarcCodec.parse(basic.dropRight(20)).isEmpty)      // block cut
    assert(WarcCodec.parse("WARC/2.0\r\n".getBytes ++ basic.drop(10)).isEmpty)
    assert(WarcCodec.parse(new String(basic, "ISO-8859-1")
      .replace("\r\n", "\n").getBytes("ISO-8859-1")).isEmpty) // bare LF
    assert(WarcCodec.parse(new String(basic, "ISO-8859-1")
      .replace("Content-Length: 11", "Content-Length: 99").getBytes("ISO-8859-1")).isEmpty)
    assert(WarcCodec.parse(new String(basic, "ISO-8859-1")
      .replace("Content-Length: 11", "Content-Length: -1").getBytes("ISO-8859-1")).isEmpty)
    // garbage between records refuses the file
    assert(WarcCodec.parse(basic ++ "junk".getBytes ++ basic).isEmpty)
  }

  test("http response: identity, chunked, gzip, chunked+gzip") {
    def resp(body: Array[Byte], hdrs: String*): Array[Byte] =
      crlf((Seq("HTTP/1.1 200 OK", "Content-Type: text/plain") ++ hdrs ++ Seq("")): _*) ++ body
    val payload = ("the rains reached the groundnut basin in July " * 5).getBytes
    val id = WarcCodec.httpResponse(resp(payload)).get
    assert(id.status == 200 && id.contentType == "text/plain")
    assert(id.payload.sameElements(payload))

    def chunk(p: Array[Byte], sizes: Seq[Int]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var pos = 0
      for (s <- sizes if pos < p.length) {
        val n = math.min(s, p.length - pos)
        out.write(f"$n%x\r\n".getBytes); out.write(p, pos, n); out.write("\r\n".getBytes)
        pos += n
      }
      out.write("0\r\n\r\n".getBytes)
      out.toByteArray
    }
    val ch = WarcCodec.httpResponse(
      resp(chunk(payload, Seq(7, 100, 3, 9999)), "Transfer-Encoding: chunked")).get
    assert(ch.payload.sameElements(payload))

    val gz = WarcCodec.httpResponse(
      resp(GzipCodec.encode("", payload), "Content-Encoding: gzip")).get
    assert(gz.payload.sameElements(payload))

    val both = WarcCodec.httpResponse(
      resp(chunk(GzipCodec.encode("", payload), Seq(11, 50, 9999)),
        "Transfer-Encoding: chunked", "Content-Encoding: gzip")).get
    assert(both.payload.sameElements(payload))
  }

  test("http response refusals: non-http, bad chunk, unknown encodings") {
    assert(WarcCodec.httpResponse("not http".getBytes).isEmpty)
    assert(WarcCodec.httpResponse(crlf("HTTP/1.1 2OO OK", "")).isEmpty)
    assert(WarcCodec.httpResponse(
      crlf("HTTP/1.1 200 OK", "Transfer-Encoding: chunked", "") ++
        "zz\r\nbody".getBytes).isEmpty)
    assert(WarcCodec.httpResponse( // chunk overruns body
      crlf("HTTP/1.1 200 OK", "Transfer-Encoding: chunked", "") ++
        "ff\r\nshort\r\n0\r\n\r\n".getBytes).isEmpty)
    assert(WarcCodec.httpResponse(
      crlf("HTTP/1.1 200 OK", "Content-Encoding: br", "") ++ "x".getBytes).isEmpty)
    assert(WarcCodec.httpResponse(
      crlf("HTTP/1.1 200 OK", "Content-Encoding: gzip", "") ++
        "not gzip".getBytes).isEmpty)
  }

  test("committed foreign fixtures parse: record counts and the corrupt-skip") {
    def read(name: String): Array[Byte] =
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(Fixtures.path("q_warc_extract/" + name)))
    val f0 = GzipCodec.decode(read("crawl-00.warc.gz")).get.data
    assert(WarcCodec.parse(f0).get.length == 8)
    val f1 = GzipCodec.decode(read("crawl-01.warc.gz")).get.data
    val rs1 = WarcCodec.parse(f1).get
    assert(rs1.length == 4)
    // the brotli response keeps its record but refuses its payload
    assert(WarcCodec.httpResponse(rs1(1).block).isEmpty)
    assert(WarcCodec.httpResponse(rs1(0).block).exists(_.status == 200))
    assert(WarcCodec.parse(read("crawl-02.warc")).get.length == 2)
    // corrupt-03: gzip ok, WARC length overruns -> refuse
    val f3 = GzipCodec.decode(read("corrupt-03.warc.gz")).get.data
    assert(WarcCodec.parse(f3).isEmpty)
    // corrupt-04: gzip CRC flipped -> gzip layer already refuses
    assert(GzipCodec.decode(read("corrupt-04.warc.gz")).isEmpty)
  }

  test("zstd: round-trip, multi-frame concat, skippable frames") {
    val data = ("zstd shard line\n" * 400).getBytes
    assert(ZstdCodec.decode(ZstdCodec.encode(data)).get.sameElements(data))
    val a = ZstdCodec.encode("first|".getBytes)
    val b = ZstdCodec.encode("second".getBytes(), level = 19)
    assert(new String(ZstdCodec.decode(a ++ b).get) == "first|second")
    val skip = Array[Byte](0x50, 0x2a, 0x4d, 0x18, 4, 0, 0, 0, 9, 9, 9, 9)
    assert(new String(ZstdCodec.decode(skip ++ a ++ skip ++ b).get) == "first|second")
  }

  test("zstd refusals: empty, truncated, trailing garbage, inflate cap") {
    val a = ZstdCodec.encode(("abc" * 1000).getBytes)
    assert(ZstdCodec.decode(Array.emptyByteArray).isEmpty)
    assert(ZstdCodec.decode(a.dropRight(3)).isEmpty)
    assert(ZstdCodec.decode(a ++ "garbage!".getBytes).isEmpty)
    assert(ZstdCodec.decode("NOTZSTDDATA".getBytes).isEmpty)
    assert(ZstdCodec.decode(a, maxOut = 100).isEmpty)
  }

  test("zstd: committed libzstd fixture decodes (cross-writer pin)") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(Fixtures.path("q_jsonl_zst/docs-01.jsonl.zst")))
    val lines = new String(ZstdCodec.decode(bytes).get, "UTF-8")
      .split('\n').filter(_.nonEmpty)
    assert(lines.length == 15)
    assert(lines.head.startsWith("""{"doc_id":2000,"""))
    val corrupt = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(Fixtures.path("q_jsonl_zst/corrupt-03.jsonl.zst")))
    assert(ZstdCodec.decode(corrupt).isEmpty)
  }
}
