package graft

import java.nio.file.{Files, Paths}

import graft.sources.JpegCodec

/** Pins [[JpegCodec.decodeLossless]] (SOF3, T.81 process 14) sample-
  * for-sample against the committed fixtures written by the
  * independent Python lossless encoder (`tools/jpeg_lossless_golden
  * .py`) — every predictor 1..7, 8/12/16-bit precision, point
  * transform, 3-component interleave, row-aligned restarts — plus the
  * refusal envelope (subsampled lossless, mid-profile mutations,
  * truncation, and the DCT entry's continued refusal of SOF3). */
class JpegLosslessSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val fixDir = Paths.get("tools/fixtures/q_jpeg_lossless")

  private def readFix(name: String): Array[Byte] =
    Files.readAllBytes(fixDir.resolve(name))

  /** name -> (y, x, c) -> v from the golden parquet (the same bits
    * DuckDB grades q_jpeg_lossless against). */
  private lazy val golden: Map[String, Map[(Int, Int, Int), Int]] = {
    val spark = SparkSpec.session
    spark.read.parquet(fixDir.resolve("golden").toString)
      .collect()
      .groupBy(_.getString(0))
      .map { case (name, rs) =>
        name -> rs.map(r =>
          (r.getInt(1), r.getInt(2), r.getInt(3)) -> r.getInt(4)).toMap
      }
  }

  private def checkExact(name: String, precision: Int, channels: Int): Unit = {
    val img = JpegCodec.decodeLossless(readFix(name + ".jpg"))
      .getOrElse(fail(s"$name refused"))
    assert(img.precision == precision, s"$name precision")
    assert(img.channels == channels, s"$name channels")
    val exp = golden(name)
    assert(exp.size == img.width * img.height * img.channels, s"$name dims")
    var bad = 0
    for (y <- 0 until img.height; x <- 0 until img.width; c <- 0 until channels) {
      val got = img.samples((y * img.width + x) * channels + c)
      if (got != exp((y, x, c))) bad += 1
    }
    assert(bad == 0, s"$name: $bad/${exp.size} samples differ from the source")
  }

  test("8-bit grayscale, predictor 1 (Ra)") { checkExact("gray8-p1", 8, 1) }
  test("8-bit grayscale, predictor 3 (Rc)") { checkExact("gray8-p3", 8, 1) }
  test("8-bit grayscale, predictor 6") { checkExact("gray8-p6", 8, 1) }
  test("12-bit grayscale, predictor 4 — the DICOM shape") {
    checkExact("gray12-p4", 12, 1)
  }
  test("12-bit grayscale, predictor 5, one-row restart intervals") {
    checkExact("gray12-p5-rst", 12, 1)
  }
  test("16-bit grayscale, predictor 7, point transform Pt=2") {
    val img = JpegCodec.decodeLossless(readFix("gray16-p7-pt2.jpg"))
      .getOrElse(fail("refused"))
    assert(img.pointTransform == 2)
    // every emitted sample carries Pt low zero bits
    assert(img.samples.forall(v => (v & 3) == 0))
    checkExact("gray16-p7-pt2", 16, 1)
  }
  test("8-bit RGB interleaved (3 components, one scan), predictor 2") {
    checkExact("rgb8-p2", 8, 3)
  }

  test("refusal: the DCT decode entry still refuses SOF3") {
    assert(JpegCodec.decode(readFix("gray8-p1.jpg")).isEmpty)
  }

  test("refusal: subsampled lossless (h=2) is out of profile") {
    val d = readFix("gray8-p1.jpg").clone()
    val i = d.indexOfSlice(Array[Byte](0xff.toByte, 0xc3.toByte))
    assert(i >= 0, "no SOF3 in fixture")
    // body starts at i+4 (marker + length); hv byte = body + 6 + 1
    d(i + 4 + 7) = 0x21 // h=2, v=1
    assert(JpegCodec.decodeLossless(d).isEmpty)
  }

  test("refusal: predictor selector 0 (no prediction) and 8 are out of range") {
    val orig = readFix("gray8-p1.jpg")
    val sos = orig.indexOfSlice(Array[Byte](0xff.toByte, 0xda.toByte))
    // SOS body: ns(1) + 2*ns + Ss Se AhAl; ns=1 here
    val ssOff = sos + 4 + 1 + 2
    for (bad <- Seq(0, 8)) {
      val d = orig.clone()
      d(ssOff) = bad.toByte
      assert(JpegCodec.decodeLossless(d).isEmpty, s"psel=$bad accepted")
    }
  }

  test("refusal: point transform >= precision") {
    val d = readFix("gray8-p1.jpg").clone()
    val sos = d.indexOfSlice(Array[Byte](0xff.toByte, 0xda.toByte))
    d(sos + 4 + 1 + 2 + 2) = 8 // Al = 8 with P = 8
    assert(JpegCodec.decodeLossless(d).isEmpty)
  }

  test("refusal: truncated entropy data") {
    val d = readFix("gray12-p4.jpg")
    assert(JpegCodec.decodeLossless(d.take(d.length - 12)).isEmpty)
  }

  test("refusal: corrupted restart sequence") {
    val d = readFix("gray12-p5-rst.jpg").clone()
    val i = d.indexOfSlice(Array[Byte](0xff.toByte, 0xd0.toByte))
    assert(i > 0, "no RST0 in fixture")
    d(i + 1) = 0xd3.toByte // wrong modulo-8 index
    assert(JpegCodec.decodeLossless(d).isEmpty)
  }

  test("refusal: a baseline SOF0 stream through the lossless entry") {
    val base = Files.readAllBytes(
      Paths.get("tools/fixtures/q_jpeg_decode/gray_16x12.jpg"))
    assert(JpegCodec.decodeLossless(base).isEmpty)
  }
}
