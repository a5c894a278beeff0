package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (the FAISS IndexPQ family, Jégou et al.
  * 2011, "Product quantization for nearest neighbor search"): a
  * dim-vector splits into `m` subvectors of dim/m; each subvector is
  * quantized to the id of its nearest codebook entry, so a vector
  * compresses to m small integers (m bytes at ≤256 codes — 64× smaller
  * than 64 float64s). Search computes one per-query lookup table of
  * subspace distances (m × codes entries), then scores any candidate
  * with m table lookups instead of a dim-element kernel — the layout
  * that lets a 100 TB corpus's ANN index live in memory.
  *
  * The codebook here is an embedded constant (driver-collected seeded
  * sample, row-major [code][dim]) shared by all three kernels; loops are
  * tight primitive Java shared verbatim by eval and codegen
  * ([[PqKernels]]), all inside whole-stage codegen.
  */
object PqKernels {

  /** Per-subspace argmin codes. Strict `<` keeps the FIRST minimum, so
    * exact-tie subvectors take the smallest code — the same order the
    * SQL twin's `row_number() OVER (ORDER BY dist, code)` induces. */
  def encode(v: ArrayData, cb: Array[Double], m: Int, dim: Int): ArrayData = {
    val codesN = cb.length / dim
    val d = dim / m
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < codesN) {
        var acc = 0.0
        var j = 0
        while (j < d) {
          val diff = v.getDouble(s * d + j) - cb(c * dim + s * d + j)
          acc += diff * diff
          j += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Per-query distance lookup table, flat s-major [s][code]. */
  def lut(q: ArrayData, cb: Array[Double], m: Int, dim: Int): ArrayData = {
    val codesN = cb.length / dim
    val d = dim / m
    val out = new Array[Double](m * codesN)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < codesN) {
        var acc = 0.0
        var j = 0
        while (j < d) {
          val diff = q.getDouble(s * d + j) - cb(c * dim + s * d + j)
          acc += diff * diff
          j += 1
        }
        out(s * codesN + c) = acc
        c += 1
      }
      s += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Asymmetric distance: m table lookups summed in ascending-s order
    * (the SQL twin adds its per-s terms left-associatively in the same
    * order, so the doubles are bit-identical and ADC ranks agree). */
  def adc(codes: ArrayData, lutArr: ArrayData): Double = {
    val m = codes.numElements()
    val codesN = lutArr.numElements() / m
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += lutArr.getDouble(s * codesN + codes.getInt(s))
      s += 1
    }
    acc
  }
}

private[expressions] trait PqCodebookExpression extends UnaryExpression {
  def codebook: Array[Double]
  def m: Int
  def dim: Int
  require(dim % m == 0, s"m=$m must divide dim=$dim")
  require(codebook.length % dim == 0,
    s"codebook length ${codebook.length} must be a multiple of dim=$dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.catalogString}")
  }

  protected def kernelName: String

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PqKernels.$kernelName($c, $cbRef, $m, $dim);")
  }
}

/** `pq_encode(emb)` → array<int> of m per-subspace codes. */
case class PqEncode(child: Expression, codebook: Array[Double], m: Int, dim: Int)
    extends PqCodebookExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def kernelName: String = "encode"
  override def nullSafeEval(input: Any): Any =
    PqKernels.encode(input.asInstanceOf[ArrayData], codebook, m, dim)
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_lut(qemb)` → array<double> of m×codes subspace distances. */
case class PqLut(child: Expression, codebook: Array[Double], m: Int, dim: Int)
    extends PqCodebookExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def kernelName: String = "lut"
  override def nullSafeEval(input: Any): Any =
    PqKernels.lut(input.asInstanceOf[ArrayData], codebook, m, dim)
  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** `pq_adc(codes, lut)` → double asymmetric distance. */
case class PqAdcDist(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<int>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    PqKernels.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.PqKernels.adc($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcDist = copy(left = newLeft, right = newRight)
}
