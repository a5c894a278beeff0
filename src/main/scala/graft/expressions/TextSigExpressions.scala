package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native signature expressions for near-duplicate detection.
  *
  * Two design rules, both learned the hard way (see git history):
  *  - signature generation must be a one-pass kernel. Higher-order-function
  *    formulations are evaluated interpreted and Catalyst's project
  *    collapsing inlines the shingle subtree into all `numPerm` permutation
  *    lambdas — O(tokens²·perms) per row;
  *  - `doGenCode` must emit a static call into [[Kernels]] rather than
  *    extending CodegenFallback, which would kick the whole stage out of
  *    whole-stage codegen.
  */
/** The min-wise hash family behind every signature kernel, pinned to an
  * oracle-recomputable contract: base hash = md5_number_lower(feature)
  * mod P, permutations = (a_j·h + b_j) mod P with P = 2^61 − 1. The
  * Mersenne modulus keeps every value in [0, P) — positive as a signed
  * JVM long AND as a SQL UBIGINT, so min/ordering agree across engines —
  * and makes the 128-bit modular product one fold (2^64 ≡ 8 mod P) on
  * the JVM while staying a plain HUGEINT `%` in SQL. */
private[graft] object SigUtil {
  /** 2^61 − 1: modulus of the affine min-wise family. */
  val P: Long = (1L << 61) - 1

  /** Feature base hash in [0, P): `md5_number_lower(s) % P` exactly. */
  def baseHash(s: UTF8String): Long =
    java.lang.Long.remainderUnsigned(Kernels.md5LowerOf(s), P)

  /** (a·h + b) mod P for a, b, h in [0, P): 128-bit product folded via
    * 2^64 ≡ 8 (mod P). multiplyHigh is exact here — both operands are
    * < 2^61, hence non-negative as signed longs. */
  def permHash(a: Long, b: Long, h: Long): Long = {
    val hi = java.lang.Math.multiplyHigh(a, h) // < 2^58
    val lo = a * h                             // wrapped low 64 bits
    var m = (lo & P) + (lo >>> 61)             // lo mod P, ≤ P + 6
    if (m >= P) m -= P
    var x = (hi << 3) + m                      // ≡ product (mod P), < 2^62
    x = (x & P) + (x >>> 61)
    if (x >= P) x -= P
    x += b
    if (x >= P) x -= P
    x
  }

  /** Deterministic per-permutation affine coefficients, themselves md5-
    * derived so the oracle can embed the identical literals. */
  def coefA(j: Int): Long =
    java.lang.Long.remainderUnsigned(Kernels.md5LowerOf(UTF8String.fromString("a:" + j)), P - 1) + 1
  def coefB(j: Int): Long =
    java.lang.Long.remainderUnsigned(Kernels.md5LowerOf(UTF8String.fromString("b:" + j)), P)
}

private[expressions] abstract class KernelExpression extends UnaryExpression {
  /** Java expression computing the kernel from the child variable. */
  protected def kernelCall(c: String): String

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${kernelCall(c)};")
}

/** Distinct word n-shingles over a token array (docs shorter than n
  * collapse to a single shingle), built in one pass. */
case class WordShingles(child: Expression, n: Int) extends KernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.wordShingles(input.asInstanceOf[ArrayData], n)
  override protected def kernelCall(c: String): String =
    s"graft.expressions.Kernels.wordShingles($c, $n)"
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** ALL word n-shingles in position order (duplicates kept) — the
  * positional variant of [[WordShingles]] for span-level statistics. */
case class WordShinglesAll(child: Expression, n: Int) extends KernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.wordShinglesAll(input.asInstanceOf[ArrayData], n)
  override protected def kernelCall(c: String): String =
    s"graft.expressions.Kernels.wordShinglesAll($c, $n)"
  override protected def withNewChildInternal(newChild: Expression): WordShinglesAll =
    copy(child = newChild)
}

/** Distinct character n-grams of a string (code-point semantics). */
case class CharShingles(child: Expression, n: Int) extends KernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_shingles expects string, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    Kernels.charShingles(input.asInstanceOf[UTF8String], n)
  override protected def kernelCall(c: String): String =
    s"graft.expressions.Kernels.charShingles($c, $n)"
  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

/** MinHash signature: each shingle hashed once, `numPerm` permutations via
  * affine transforms of that base hash (standard one-hash MinHash). */
case class MinHashSig(child: Expression, numPerm: Int) extends KernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.minhashSig(input.asInstanceOf[ArrayData], numPerm)
  override protected def kernelCall(c: String): String =
    s"graft.expressions.Kernels.minhashSig($c, $numPerm)"
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Fused MinHash → LSH band keys: the (bands × rowsPerBand)-perm signature
  * folded to one 64-bit key per band, in one pass (fused so a separate sig
  * expression can't be re-inlined once per band). */
case class MinHashBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends KernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.minhashBandKeys(input.asInstanceOf[ArrayData], bands, rowsPerBand)
  override protected def kernelCall(c: String): String =
    s"graft.expressions.Kernels.minhashBandKeys($c, $bands, $rowsPerBand)"
  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

/** 64-bit SimHash packed into one long: per token, the 64 bits of one
  * md5 hash vote ±1 per position; sign of each sum is the sig bit. */
case class SimHashSig(child: Expression) extends KernelExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Kernels.simhashSig(input.asInstanceOf[ArrayData])
  override protected def kernelCall(c: String): String =
    s"graft.expressions.Kernels.simhashSig($c)"
  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

/** MinHash Jaccard estimate: the fraction of agreeing permutation minima
  * of two signatures — the classic unbiased estimator, SE =
  * √(J(1−J)/numPerm) (≈0.035 at 128 perms, J=0.8). Lets LSH verification
  * run on kilobyte signatures instead of re-shuffling raw shingle sets. */
case class MinHashJaccard(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> signatures, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    if (n == 0) 0.0 else {
      var eq = 0
      var i = 0
      while (i < n) { if (x.getLong(i) == y.getLong(i)) eq += 1; i += 1 }
      eq.toDouble / n
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val eq = ctx.freshName("eq")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $eq = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $eq++;
         |}
         |${ev.value} = $n == 0 ? 0.0 : (double) $eq / $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MinHashJaccard =
    copy(left = newLeft, right = newRight)
}

/** Winnowing fingerprints (Schleimer et al., SIGMOD'03): rolling k-gram
  * hashes, per-window minima, distinct sorted minima set — one pass. */
/** Winnow fingerprints as struct(fps_csv, n_fps) — the md5-signature
  * payload of doc_fingerprint, computed in one kernel pass so the
  * projection stays inside whole-stage codegen (no interpreted HOFs). */
case class WinnowMeta(child: Expression, k: Int, w: Int) extends KernelExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("fps_csv", StringType, nullable = false),
    StructField("n_fps", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_meta expects string, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    Kernels.winnowMeta(input.asInstanceOf[UTF8String], k, w)
  override protected def kernelCall(c: String): String =
    s"graft.expressions.Kernels.winnowMeta($c, $k, $w)"
  override protected def withNewChildInternal(newChild: Expression): WinnowMeta =
    copy(child = newChild)
}

case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends KernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    Kernels.winnowFingerprints(input.asInstanceOf[UTF8String], k, w)
  override protected def kernelCall(c: String): String =
    s"graft.expressions.Kernels.winnowFingerprints($c, $k, $w)"
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** One BPE merge application over a symbol array — see
  * [[Kernels.bpeMergeStep]] for the single-pass/greedy-fold equivalence
  * the oracle's list_reduce replay relies on. `left`/`right` are the
  * training loop's per-iteration winning pair (plain Scala strings, not
  * child expressions: they are decided driver-side between jobs), shipped
  * into generated code as reference objects. */
case class BpeMerge(child: Expression, left: String, right: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge expects array<string>, got ${other.catalogString}")
  }
  @transient private lazy val l = UTF8String.fromString(left)
  @transient private lazy val r = UTF8String.fromString(right)
  override def nullSafeEval(input: Any): Any =
    Kernels.bpeMergeStep(input.asInstanceOf[ArrayData], l, r)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val lRef = ctx.addReferenceObj("bpeLeft", l)
      val rRef = ctx.addReferenceObj("bpeRight", r)
      s"${ev.value} = graft.expressions.Kernels.bpeMergeStep($c, $lRef, $rRef);"
    })
  override protected def withNewChildInternal(newChild: Expression): BpeMerge =
    copy(child = newChild)
}
