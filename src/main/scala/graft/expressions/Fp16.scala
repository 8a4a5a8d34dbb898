package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

/** IEEE 754 binary16 (half precision) pack/unpack — THE wire format
  * large-scale embedding stores actually use: a 100 TB vector lake at
  * fp32 is 2× the bytes of the same lake at fp16, and the training
  * stacks that consume it (safetensors, GGUF, faiss fp16 indexes)
  * read packed little-endian half arrays. These helpers implement
  * the conversion in pure integer bit math (Java 17 predates
  * `Float.float16ToFloat`), with round-to-nearest-even on encode —
  * Fp16Spec proves encode∘decode is the identity on ALL 65 536 half
  * bit patterns and that encode picks the nearest representable
  * neighbor (exhaustive RNE check), so the pair is spec-complete,
  * not sampled. The Catalyst expressions below keep the conversion
  * inside whole-stage codegen via static calls (the
  * [[CosineSimilarity]] discipline).
  */
object Fp16 {

  /** half bits (low 16 of the Int) → float. Total: every pattern maps
    * (subnormals exactly, NaN payloads preserved in the high bits). */
  def halfToFloat(h0: Int): Float = {
    val h = h0 & 0xffff
    val sign = (h >>> 15) << 31
    val exp = (h >>> 10) & 0x1f
    val man = h & 0x3ff
    val bits =
      if (exp == 0) {
        if (man == 0) sign
        else {
          // subnormal: normalize into a float's larger exponent range
          var e = 0
          var m = man
          while ((m & 0x400) == 0) { m <<= 1; e += 1 }
          sign | ((127 - 15 + 1 - e) << 23) | ((m & 0x3ff) << 13)
        }
      } else if (exp == 0x1f) sign | 0x7f800000 | (man << 13)
      else sign | ((exp - 15 + 127) << 23) | (man << 13)
    java.lang.Float.intBitsToFloat(bits)
  }

  /** float → half bits, round-to-nearest-even; overflow → ±inf,
    * NaN keeps its high payload bits (never collapses to inf). */
  def floatToHalf(f: Float): Int = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val e = (bits >>> 23) & 0xff
    val m = bits & 0x7fffff
    if (e == 0xff)
      return if (m != 0) {
        // NaN: keep the high payload bits; if they all truncate away,
        // set the quiet bit so the result stays a NaN, not an inf
        val payload = m >>> 13
        sign | 0x7c00 | (if (payload == 0) 0x200 else payload)
      } else sign | 0x7c00 // inf
    val exp = e - 127 + 15
    if (exp >= 0x1f) return sign | 0x7c00 // overflow → inf
    if (exp <= 0) {
      // subnormal half (or underflow to zero): shift the implicit-1
      // mantissa right and round; a carry rolls into the smallest
      // normal, which is exactly the RNE result
      if (exp < -10) return sign
      val man = m | 0x800000
      val shift = 14 - exp
      val half = man >>> shift
      val rem = man & ((1 << shift) - 1)
      val halfway = 1 << (shift - 1)
      val r = if (rem > halfway || (rem == halfway && (half & 1) == 1)) half + 1 else half
      return sign | r
    }
    val half = (exp << 10) | (m >>> 13)
    val rem = m & 0x1fff
    val r = if (rem > 0x1000 || (rem == 0x1000 && (half & 1) == 1)) half + 1 else half
    // a mantissa carry increments the exponent field arithmetically;
    // 0x7bff + 1 = 0x7c00 = inf, the correct RNE overflow
    sign | r
  }

  /** Packed little-endian half array → float array (catalyst form).
    * A trailing odd byte is ignored (skip-not-kill: a truncated
    * buffer degrades to a shorter vector, never a task failure). */
  def decode(packed: Array[Byte]): ArrayData = {
    val n = packed.length / 2
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = halfToFloat((packed(2 * i) & 0xff) | ((packed(2 * i + 1) & 0xff) << 8))
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Float array (catalyst form) → packed little-endian half bytes.
    * Null elements pack as zero. */
  def encode(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) 0 else floatToHalf(arr.getFloat(i))
      out(2 * i) = (h & 0xff).toByte
      out(2 * i + 1) = ((h >>> 8) & 0xff).toByte
      i += 1
    }
    out
  }
}

/** bfloat16 — the TRAINING-side 16-bit format (fp32's exponent range,
  * 8 mantissa bits): decode is a plain high-half shift, encode is RNE
  * via the carry-propagating rounding add. Same exhaustive-proof
  * discipline as [[Fp16]] (Fp16Spec sweeps all 65 536 bf16 patterns
  * and the RNE midpoints). */
object Bf16 {
  /** bf16 bits (low 16 of the Int) → float: high half of fp32. */
  def bf16ToFloat(h: Int): Float =
    java.lang.Float.intBitsToFloat((h & 0xffff) << 16)

  /** float → bf16 bits, round-to-nearest-even; NaN keeps its high
    * payload bits (quiet bit forced if they truncate away). */
  def floatToBf16(f: Float): Int = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    if ((bits & 0x7f800000) == 0x7f800000 && (bits & 0x7fffff) != 0) {
      val h = bits >>> 16
      return if ((h & 0x7f) == 0) h | 0x40 else h // keep NaN-ness
    }
    // RNE: add 0x7fff + lsb-of-result; the carry propagates through
    // mantissa into exponent, and FLT_MAX rounds to inf correctly
    (bits + 0x7fff + ((bits >>> 16) & 1)) >>> 16
  }

  def decode(packed: Array[Byte]): ArrayData = {
    val n = packed.length / 2
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = bf16ToFloat((packed(2 * i) & 0xff) | ((packed(2 * i + 1) & 0xff) << 8))
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  def encode(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) 0 else floatToBf16(arr.getFloat(i))
      out(2 * i) = (h & 0xff).toByte
      out(2 * i + 1) = ((h >>> 8) & 0xff).toByte
      i += 1
    }
    out
  }
}

/** `bf16_vec(binary)` → `ARRAY<FLOAT>`: unpack little-endian bf16. */
case class Bf16ToFloats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bf16_vec expects BINARY input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "bf16_vec"
  override protected def nullSafeEval(input: Any): Any =
    Bf16.decode(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Bf16.decode($c)")
  override protected def withNewChildInternal(newChild: Expression): Bf16ToFloats =
    copy(child = newChild)
}

/** `bf16_pack(array<float>)` → `BINARY`: RNE pack to bf16. */
case class FloatsToBf16(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bf16_pack expects ARRAY<FLOAT> input, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bf16_pack"
  override protected def nullSafeEval(input: Any): Any =
    Bf16.encode(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Bf16.encode($c)")
  override protected def withNewChildInternal(newChild: Expression): FloatsToBf16 =
    copy(child = newChild)
}

/** `fp16_vec(binary)` → `ARRAY<FLOAT>`: unpack little-endian halfs. */
case class Fp16ToFloats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"fp16_vec expects BINARY input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "fp16_vec"
  override protected def nullSafeEval(input: Any): Any =
    Fp16.decode(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Fp16.decode($c)")
  override protected def withNewChildInternal(newChild: Expression): Fp16ToFloats =
    copy(child = newChild)
}

/** `fp16_pack(array<float>)` → `BINARY`: pack to little-endian halfs
  * with round-to-nearest-even. */
case class FloatsToFp16(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"fp16_pack expects ARRAY<FLOAT> input, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "fp16_pack"
  override protected def nullSafeEval(input: Any): Any =
    Fp16.encode(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Fp16.encode($c)")
  override protected def withNewChildInternal(newChild: Expression): FloatsToFp16 =
    copy(child = newChild)
}
