package graft

import java.nio.file.{Files, Paths}

import graft.sources.JpegCodec

/** Pins [[JpegCodec.decode]]'s arithmetic-coded paths (SOF9 extended
  * sequential + SOF10 progressive, T.81 processes 3 and 6) pixel-for-
  * pixel against the committed fixtures ENCODED BY LIBJPEG ITSELF
  * (`tools/jpeg_arith_ref.c` via `tools/jpeg_arith_golden.py`; golden
  * pixels derive from libjpeg's own jpeg_read_coefficients decode
  * through the shared integer spec) — grayscale, 4:4:4 / 4:2:2 /
  * 4:2:0, restart re-init, non-default DAC conditioning, and the full
  * progressive script with DC/AC refinement — plus the refusal
  * envelope (lossless-arithmetic SOF11 stays refused, truncation,
  * corrupted restarts, hostile-byte fuzz). */
class JpegArithSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val fixDir = Paths.get("tools/fixtures/q_jpeg_arith")

  private def readFix(name: String): Array[Byte] =
    Files.readAllBytes(fixDir.resolve(name))

  private lazy val golden: Map[String, Map[(Int, Int), (Int, Int, Int)]] = {
    val spark = SparkSpec.session
    spark.read.parquet(fixDir.resolve("golden").toString)
      .collect()
      .groupBy(_.getString(0))
      .map { case (name, rs) =>
        name -> rs.map(r => (r.getInt(1), r.getInt(2)) ->
          ((r.getInt(3), r.getInt(4), r.getInt(5)))).toMap
      }
  }

  private def checkExact(name: String, channels: Int): Unit = {
    val img = JpegCodec.decode(readFix(name + ".jpg"))
      .getOrElse(fail(s"$name refused"))
    assert(img.channels == channels, s"$name channels")
    val exp = golden(name)
    assert(exp.size == img.width * img.height, s"$name dims")
    var bad = 0
    for (y <- 0 until img.height; x <- 0 until img.width) {
      val (er, eg, eb) = exp((y, x))
      val (gr, gg, gb) =
        if (channels == 1) {
          val v = img.pixels(y * img.width + x) & 0xff; (v, v, v)
        } else {
          val i = (y * img.width + x) * 3
          (img.pixels(i) & 0xff, img.pixels(i + 1) & 0xff, img.pixels(i + 2) & 0xff)
        }
      if ((gr, gg, gb) != ((er, eg, eb))) bad += 1
    }
    assert(bad == 0, s"$name: $bad/${exp.size} pixels differ from the libjpeg-derived golden")
  }

  test("sequential arithmetic grayscale 23x17") {
    checkExact("arith-seq-gray-01", 1)
  }
  test("sequential arithmetic RGB 4:4:4 20x14") {
    checkExact("arith-seq-444-02", 3)
  }
  test("sequential arithmetic RGB 4:2:0 35x29 (odd dims)") {
    checkExact("arith-seq-420-03", 3)
  }
  test("sequential arithmetic 4:2:0 with RSTn re-init + statistics reset") {
    checkExact("arith-seq-420-rst-04", 3)
  }
  test("sequential arithmetic with non-default DAC conditioning (U=3, Kx=12)") {
    checkExact("arith-seq-cond-05", 1)
  }
  test("sequential arithmetic RGB 4:2:2 21x13") {
    checkExact("arith-seq-422-06", 3)
  }
  test("progressive arithmetic grayscale (DC+AC first, DC+AC refinement)") {
    checkExact("arith-prog-gray-07", 1)
  }
  test("progressive arithmetic RGB 4:2:0 (interleaved DC, per-band AC scans)") {
    checkExact("arith-prog-420-08", 3)
  }
  test("progressive arithmetic 4:4:4 with restarts in every scan") {
    checkExact("arith-prog-444-rst-09", 3)
  }

  test("refusal: lossless entry refuses arithmetic DCT frames") {
    assert(JpegCodec.decodeLossless(readFix("arith-seq-gray-01.jpg")).isEmpty)
    assert(JpegCodec.decode12(readFix("arith-seq-gray-01.jpg")).isEmpty)
  }

  test("refusal: lossless arithmetic (SOF11) stays out of profile") {
    // rewrite the SOF9 marker to SOF11: frame shape is plausible but
    // the process is genuinely unimplemented — must refuse, not decode
    val d = readFix("arith-seq-gray-01.jpg").clone()
    val i = d.indexOfSlice(Array[Byte](0xff.toByte, 0xc9.toByte))
    assert(i >= 0, "no SOF9 in fixture")
    d(i + 1) = 0xcb.toByte
    assert(JpegCodec.decode(d).isEmpty)
  }

  test("refusal: truncated entropy data") {
    val d = readFix("arith-seq-420-03.jpg")
    assert(JpegCodec.decode(d.take(d.length - 10)).isEmpty)
  }

  test("refusal: corrupted restart sequence") {
    val d = readFix("arith-seq-420-rst-04.jpg").clone()
    val i = d.indexOfSlice(Array[Byte](0xff.toByte, 0xd0.toByte))
    assert(i > 0, "no RST0 in fixture")
    d(i + 1) = 0xd4.toByte
    assert(JpegCodec.decode(d).isEmpty)
  }

  test("refusal: malformed DAC (L > U) and bad AC Kx") {
    val d = readFix("arith-seq-gray-01.jpg").clone()
    val i = d.indexOfSlice(Array[Byte](0xff.toByte, 0xcc.toByte))
    assert(i > 0, "no DAC in fixture")
    // DAC body: (Tc<<4|Tb, Cs) pairs; first pair is the DC table —
    // force Cs = 0x1f (L=15 > U=1)
    d(i + 5) = 0x1f.toByte
    assert(JpegCodec.decode(d).isEmpty)
  }

  test("hostile bytes never throw: truncation + fuzz sweep") {
    val seq = readFix("arith-seq-420-rst-04.jpg")
    val prog = readFix("arith-prog-420-08.jpg")
    (0 until seq.length by 5).foreach(k => JpegCodec.decode(seq.take(k)))
    (0 until prog.length by 5).foreach(k => JpegCodec.decode(prog.take(k)))
    Seq(seq, prog).foreach { f =>
      var j = 0
      while (j < f.length) {
        val m = f.clone(); m(j) = (m(j) ^ 0x5c).toByte
        JpegCodec.decode(m)
        j += 1
      }
    }
  }
}
