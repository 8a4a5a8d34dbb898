package graft

import java.nio.file.{Files, Paths}

import graft.sources.JpegCodec

/** Progressive (SOF2) JPEG decode vs the committed foreign fixtures:
  * the five streams in tools/fixtures/q_jpeg_progressive/ come from
  * the independent from-scratch Python progressive encoder
  * (tools/jpeg_progressive_golden.py — spectral selection +
  * successive approximation in the libjpeg standard-script shape,
  * per-scan Huffman tables, real EOB runs, buffered refinement bits,
  * restart markers), coefficient-roundtrip-verified there by an
  * independent Python progressive decoder. Expected pixels are the
  * shared-integer-spec decode of the baseline sibling carrying the
  * same quantized coefficients, so any scan-assembly bug on either
  * side breaks per-pixel equality. Plus the refusal contract for
  * malformed progressions. */
class JpegProgressiveSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val fixDir = Paths.get(graft.Fixtures.path("q_jpeg_progressive"))

  private def readFix(name: String): Array[Byte] =
    Files.readAllBytes(fixDir.resolve(name))

  private lazy val golden: Map[String, Map[(Int, Int), (Int, Int, Int)]] = {
    val spark = SparkSpec.session
    val rows = spark.read
      .parquet(fixDir.resolve("golden").toString)
      .collect()
    rows.groupBy(_.getString(0)).map { case (name, rs) =>
      name -> rs.map(r =>
        (r.getInt(1), r.getInt(2)) -> ((r.getInt(3), r.getInt(4), r.getInt(5)))).toMap
    }
  }

  private def checkExact(name: String): Unit = {
    val img = JpegCodec.decode(readFix(name + ".jpg"))
      .getOrElse(fail(s"$name refused"))
    val exp = golden(name)
    assert(exp.size == img.width * img.height, s"$name dims")
    var bad = 0
    for (y <- 0 until img.height; x <- 0 until img.width) {
      val got =
        if (img.channels == 1) {
          val v = img.pixels(y * img.width + x) & 0xff; (v, v, v)
        } else {
          val i = (y * img.width + x) * 3
          (img.pixels(i) & 0xff, img.pixels(i + 1) & 0xff, img.pixels(i + 2) & 0xff)
        }
      if (got != exp((y, x))) bad += 1
    }
    assert(bad == 0,
      s"$name: $bad/${exp.size} pixels differ from the baseline-sibling decode")
  }

  test("progressive grayscale 16x12: DC holdback + split AC bands + refinements") {
    val img = JpegCodec.decode(readFix("prog_gray_16x12.jpg")).getOrElse(fail("refused"))
    assert((img.width, img.height, img.channels) == ((16, 12, 1)))
    checkExact("prog_gray_16x12")
  }

  test("progressive RGB 4:4:4 12x10: full libjpeg standard script") {
    val img = JpegCodec.decode(readFix("prog_rgb444_12x10.jpg")).getOrElse(fail("refused"))
    assert((img.width, img.height, img.channels) == ((12, 10, 3)))
    checkExact("prog_rgb444_12x10")
  }

  test("progressive RGB 4:2:0 21x13: interleaved-DC vs non-interleaved-AC geometry") {
    checkExact("prog_rgb420_21x13")
  }

  test("progressive RGB 4:2:2 19x11: horizontal-only subsampling") {
    checkExact("prog_rgb422_19x11")
  }

  test("progressive RGB 4:2:0 48x32 with DRI=2: restarts reset preds and EOB runs") {
    checkExact("prog_rgb420r_48x32")
  }

  test("refusal: truncated progressive stream returns None, never throws") {
    val d = readFix("prog_rgb444_12x10.jpg")
    for (cut <- Seq(d.length / 4, d.length / 2, d.length - 3))
      assert(JpegCodec.decode(d.take(cut)).isEmpty, s"cut=$cut")
  }

  test("refusal: EOI before any scan returns None") {
    val d = readFix("prog_gray_16x12.jpg")
    // SOI + everything up to (excluding) the first SOS, then EOI
    val sos = d.indices.dropRight(1)
      .find(i => (d(i) & 0xff) == 0xff && (d(i + 1) & 0xff) == 0xda)
      .getOrElse(fail("no SOS"))
    assert(JpegCodec.decode(d.take(sos) ++ Array(0xff.toByte, 0xd9.toByte)).isEmpty)
  }

  test("refusal: lossless/sequential-arith rewrites of a progressive frame refuse") {
    // 0xc3 (lossless) and 0xcb (lossless arithmetic) are out of the
    // DCT entry's profile; 0xc9 (sequential arithmetic) refuses this
    // FILE because the progressive scan headers (Ss/Se bands) are
    // illegal in a sequential frame. 0xca is NOT here: progressive
    // arithmetic is in-profile since the QM-coder landed, and a
    // Huffman stream relabeled SOF10 is structurally
    // indistinguishable from arithmetic data (the coder cannot run
    // out of symbols) — it decodes to garbage pixels, exactly as any
    // conforming arithmetic decoder would. The real arithmetic
    // envelope is pinned by JpegArithSpec.
    for (sof <- Seq(0xc3, 0xc9, 0xcb)) {
      val d = readFix("prog_gray_16x12.jpg").clone()
      val i = d.indices.dropRight(1)
        .find(i => (d(i) & 0xff) == 0xff && (d(i + 1) & 0xff) == 0xc2)
        .getOrElse(fail("no SOF2"))
      d(i + 1) = sof.toByte
      assert(JpegCodec.decode(d).isEmpty, f"SOF marker $sof%02x accepted")
    }
  }

  test("refusal: 12-bit precision progressive returns None") {
    val d = readFix("prog_gray_16x12.jpg").clone()
    val i = d.indices.dropRight(1)
      .find(i => (d(i) & 0xff) == 0xff && (d(i + 1) & 0xff) == 0xc2)
      .getOrElse(fail("no SOF2"))
    d(i + 4) = 12 // precision byte of the frame header
    assert(JpegCodec.decode(d).isEmpty)
  }

  test("refusal: corrupted restart sequence in a progressive scan returns None") {
    val d = readFix("prog_rgb420r_48x32.jpg").clone()
    val i = d.indices.dropRight(1)
      .find(i => (d(i) & 0xff) == 0xff && (d(i + 1) & 0xff) == 0xd0)
      .getOrElse(fail("no RST0"))
    d(i + 1) = 0xd4.toByte
    assert(JpegCodec.decode(d).isEmpty)
  }

  test("refusal: single-byte fuzz over a progressive stream never throws") {
    val good = readFix("prog_rgb420_21x13.jpg")
    var i = 0
    while (i < good.length) {
      val c = good.clone(); c(i) = 0xff.toByte
      JpegCodec.decode(c) // any Option is fine; a throw fails the suite
      val e = good.clone(); e(i) = 0x55
      JpegCodec.decode(e)
      i += 2
    }
  }
}
