package graft

import java.nio.file.{Files, Paths}

import graft.sources.JpegCodec

/** Pins [[JpegCodec.decode12]] (SOF1 extended sequential at 12-bit
  * precision, T.81 process 2) sample-for-sample against the committed
  * fixtures written by the independent Python encoder+decoder pair in
  * `tools/jpeg12_golden.py` — grayscale, RGB 4:4:4, RGB 4:2:0 with
  * restart markers, 16-bit Pq=1 quantization tables — plus the
  * refusal envelope (8-bit frames in the 12-bit entry and vice versa,
  * truncation, corrupted restarts). */
class Jpeg12Spec extends org.scalatest.funsuite.AnyFunSuite {

  private val fixDir = Paths.get("tools/fixtures/q_jpeg12")

  private def readFix(name: String): Array[Byte] =
    Files.readAllBytes(fixDir.resolve(name))

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

  private def checkExact(name: String, channels: Int): Unit = {
    val img = JpegCodec.decode12(readFix(name + ".jpg"))
      .getOrElse(fail(s"$name refused"))
    assert(img.channels == channels, s"$name channels")
    val exp = golden(name)
    assert(exp.size == img.width * img.height * img.channels, s"$name dims")
    var bad = 0
    for (y <- 0 until img.height; x <- 0 until img.width; c <- 0 until channels) {
      val got = img.samples((y * img.width + x) * channels + c)
      if (got != exp((y, x, c))) bad += 1
    }
    assert(bad == 0, s"$name: $bad/${exp.size} samples differ from the Python decode")
    assert(img.samples.forall(v => v >= 0 && v <= 4095), s"$name range")
  }

  test("12-bit grayscale 11x9") { checkExact("gray12_11x9", 1) }
  test("12-bit grayscale 17x6 with restart markers") {
    checkExact("gray12_17x6_rst", 1)
  }
  test("12-bit RGB 4:4:4 10x8") { checkExact("rgb12_444_10x8", 3) }
  test("12-bit RGB 4:2:0 37x21 (6 MCUs) with live restarts: chroma edge replication") {
    checkExact("rgb12_420_37x21", 3)
  }

  test("refusal: the 8-bit DCT entry refuses a 12-bit stream") {
    assert(JpegCodec.decode(readFix("gray12_11x9.jpg")).isEmpty)
  }

  test("refusal: the 12-bit entry refuses an 8-bit baseline stream") {
    val base = Files.readAllBytes(
      Paths.get("tools/fixtures/q_jpeg_decode/gray_16x12.jpg"))
    assert(JpegCodec.decode12(base).isEmpty)
  }

  test("refusal: truncated entropy data") {
    val d = readFix("rgb12_444_10x8.jpg")
    assert(JpegCodec.decode12(d.take(d.length - 10)).isEmpty)
  }

  test("refusal: corrupted restart sequence") {
    val d = readFix("gray12_17x6_rst.jpg").clone()
    val i = d.indexOfSlice(Array[Byte](0xff.toByte, 0xd0.toByte))
    assert(i > 0, "no RST0 in fixture")
    d(i + 1) = 0xd5.toByte
    assert(JpegCodec.decode12(d).isEmpty)
  }

  test("hostile bytes never throw: truncation + fuzz sweep") {
    val f = readFix("rgb12_420_37x21.jpg")
    (0 until f.length by 5).foreach(k => JpegCodec.decode12(f.take(k)))
    var j = 0
    while (j < f.length) {
      val m = f.clone(); m(j) = (m(j) ^ 0x5c).toByte
      JpegCodec.decode12(m)
      JpegCodec.decodeLossless(m)
      j += 1
    }
  }
}
