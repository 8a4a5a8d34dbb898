package graft

import graft.expressions.Fp16

/** IEEE binary16 conversion: EXHAUSTIVE identity over all 65 536 half
  * bit patterns, exhaustive nearest-neighbor (RNE) verification of
  * the encoder against the decoder's own value lattice, canonical
  * test vectors, and the Catalyst expression surface end-to-end
  * through whole-stage codegen. */
class Fp16Spec extends SparkSpec {

  test("encode(decode(h)) is the identity on ALL 65536 half patterns (NaNs map to NaNs)") {
    var h = 0
    while (h < 0x10000) {
      val f = Fp16.halfToFloat(h)
      val back = Fp16.floatToHalf(f)
      val isNan = (h & 0x7c00) == 0x7c00 && (h & 0x3ff) != 0
      if (isNan)
        // the JVM may quieten signaling NaN bit patterns in float
        // registers, so payload identity is not portable — NaN-ness is
        assert((back & 0x7c00) == 0x7c00 && (back & 0x3ff) != 0,
          f"pattern $h%04x -> $f -> $back%04x lost NaN-ness")
      else assert(back == h, f"pattern $h%04x -> $f -> $back%04x")
      h += 1
    }
  }

  test("canonical vectors: exact values, subnormals, inf, nan, rounding") {
    assert(Fp16.floatToHalf(0.0f) == 0x0000)
    assert(Fp16.floatToHalf(-0.0f) == 0x8000)
    assert(Fp16.floatToHalf(1.0f) == 0x3c00)
    assert(Fp16.floatToHalf(-2.0f) == 0xc000)
    assert(Fp16.floatToHalf(0.5f) == 0x3800)
    assert(Fp16.floatToHalf(65504.0f) == 0x7bff) // max finite half
    assert(Fp16.floatToHalf(65520.0f) == 0x7c00) // rounds to inf
    assert(Fp16.floatToHalf(Float.PositiveInfinity) == 0x7c00)
    assert(Fp16.floatToHalf(Float.NegativeInfinity) == 0xfc00)
    assert((Fp16.floatToHalf(Float.NaN) & 0x7c00) == 0x7c00)
    assert((Fp16.floatToHalf(Float.NaN) & 0x03ff) != 0)
    // smallest subnormal half = 2^-24
    assert(Fp16.halfToFloat(0x0001) == math.pow(2, -24).toFloat)
    assert(Fp16.floatToHalf(math.pow(2, -24).toFloat) == 0x0001)
    // below half of the smallest subnormal underflows to zero
    assert(Fp16.floatToHalf(math.pow(2, -26).toFloat) == 0x0000)
    // smallest normal = 2^-14
    assert(Fp16.halfToFloat(0x0400) == math.pow(2, -14).toFloat)
    // 1/3 rounds to 0x3555 (classic RNE vector)
    assert(Fp16.floatToHalf((1.0f / 3.0f)) == 0x3555)
  }

  test("encoder is exhaustively round-to-nearest-even against the half lattice") {
    // For every finite positive half h, midpoints between h and h+1
    // must round to the EVEN neighbor; values just off the midpoint
    // must round toward the nearer one. Doubles hold the midpoints
    // exactly (halfs have <= 11 significant bits).
    var h = 0
    while (h < 0x7bff) { // up to just below max finite
      val lo = Fp16.halfToFloat(h).toDouble
      val hi = Fp16.halfToFloat(h + 1).toDouble
      val mid = (lo + hi) / 2.0
      val even = if ((h & 1) == 0) h else h + 1
      assert(Fp16.floatToHalf(mid.toFloat) == even, f"mid of $h%04x")
      // nudge by 1/8 of the gap: float holds it exactly for these
      // magnitudes (3 extra bits), so the nearer-neighbor check is exact
      val q = (hi - lo) / 8.0
      assert(Fp16.floatToHalf((mid - q).toFloat) == h, f"below mid of $h%04x")
      assert(Fp16.floatToHalf((mid + q).toFloat) == h + 1, f"above mid of $h%04x")
      h += 1
    }
  }

  test("bf16: encode(decode(h)) identity on all 65536 patterns; exhaustive RNE") {
    import graft.expressions.Bf16
    var h = 0
    while (h < 0x10000) {
      val f = Bf16.bf16ToFloat(h)
      val back = Bf16.floatToBf16(f)
      val isNan = (h & 0x7f80) == 0x7f80 && (h & 0x7f) != 0
      if (isNan) assert((back & 0x7f80) == 0x7f80 && (back & 0x7f) != 0, f"$h%04x")
      else assert(back == h, f"pattern $h%04x -> $f -> $back%04x")
      h += 1
    }
    // midpoint RNE over finite positives (stop before inf)
    h = 0
    while (h < 0x7f7f) {
      val lo = Bf16.bf16ToFloat(h)
      val hi = Bf16.bf16ToFloat(h + 1)
      if (!lo.isNaN && !hi.isNaN && !hi.isInfinite) {
        // the midpoint is exactly a float (one extra mantissa bit fits)
        val mid = java.lang.Float.intBitsToFloat((h << 16) | 0x8000)
        val even = if ((h & 1) == 0) h else h + 1
        assert(Bf16.floatToBf16(mid) == even, f"mid of $h%04x")
      }
      h += 1
    }
    assert(Bf16.floatToBf16(Float.MaxValue) == 0x7f80) // rounds to inf
    assert(Bf16.floatToBf16(1.0f) == 0x3f80)
    assert(Bf16.floatToBf16(-2.0f) == 0xc000)
  }

  test("catalyst surface: fp16_pack/fp16_vec round-trip through codegen") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Seq(0.0f, 1.0f, -0.5f, 0.33325195f)),
      (2L, Seq(65504.0f, -65504.0f, 6.1035156e-5f, 5.9604645e-8f)),
      (3L, Seq.empty[Float])
    ).toDF("id", "v")
      .withColumn("packed", expr("fp16_pack(v)"))
      .withColumn("back", expr("fp16_vec(packed)"))
    val rows = df.select("id", "v", "packed", "back").collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val packed = r.getAs[Array[Byte]](2)
      val back = r.getSeq[Float](3)
      assert(packed.length == 2 * v.length)
      // all listed inputs are exactly representable halfs
      assert(back == v, s"id=${r.getLong(0)}: $v -> $back")
    }
    // truncated buffer: trailing odd byte ignored, no task failure
    val t = Seq(Tuple1(Array[Byte](0x00, 0x3c, 0x55))).toDF("b")
      .selectExpr("fp16_vec(b) AS v").as[Seq[Float]].head()
    assert(t == Seq(1.0f))
  }
}
