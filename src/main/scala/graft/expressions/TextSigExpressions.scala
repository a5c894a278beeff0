package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native signature kernels for near-duplicate detection.
  *
  * The higher-order-function formulations (transform × aggregate ×
  * array_min) are interpreted per element and — worse — Catalyst's project
  * collapsing inlines the shingle subtree into all `numPerm` permutation
  * lambdas, turning signature generation into O(tokens² · perms) per row.
  * These expressions are single-pass tight loops: each shingle is hashed
  * once (XXH64), permutations are cheap affine transforms. Signature
  * generation over 100 TB stays pure scan work.
  */
private[expressions] object SigUtil {
  def hash(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
  /** Deterministic per-permutation affine coefficients. */
  def coefA(j: Int): Long = java.lang.Long.rotateLeft(0x9E3779B97F4A7C15L * (2 * j + 1), j) | 1L
  def coefB(j: Int): Long = java.lang.Long.rotateLeft(0xC2B2AE3D27D4EB4FL * (j + 1), j * 7 % 63)

  /** Byte offset of every code point (plus the end offset), in one pass —
    * repeated substringSQL would re-walk from the start each call,
    * turning n-gram extraction O(chars²). */
  def codePointOffsets(bytes: Array[Byte]): Array[Int] = {
    val offs = new mutable.ArrayBuffer[Int](bytes.length + 1)
    var i = 0
    while (i < bytes.length) {
      offs += i
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs += bytes.length
    offs.toArray
  }
}

/** Distinct word n-shingles over a token array (docs shorter than n
  * collapse to a single shingle), built in one pass. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects array<string>, got ${other.catalogString}")
  }
  private val space = UTF8String.fromString(" ")
  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val out = new mutable.LinkedHashSet[UTF8String]
    if (m < n) {
      val all = new Array[UTF8String](m)
      var i = 0
      while (i < m) { all(i) = toks.getUTF8String(i); i += 1 }
      out += UTF8String.concatWs(space, all: _*)
    } else {
      var i = 0
      while (i <= m - n) {
        val w = new Array[UTF8String](n)
        var j = 0
        while (j < n) { w(j) = toks.getUTF8String(i + j); j += 1 }
        out += UTF8String.concatWs(space, w: _*)
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Distinct character n-grams of a string (code-point semantics). */
case class CharShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_shingles expects string, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes // one materialization; slices below are zero-copy
    val offs = SigUtil.codePointOffsets(bytes)
    val m = offs.length - 1
    val out = new mutable.LinkedHashSet[UTF8String]
    if (m < n) out += s
    else {
      var i = 0
      while (i <= m - n) {
        out += UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i))
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

/** MinHash signature: each shingle hashed once, `numPerm` permutations via
  * affine transforms of that base hash (standard one-hash MinHash). */
case class MinHashSig(child: Expression, numPerm: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.catalogString}")
  }
  private lazy val as: Array[Long] = Array.tabulate(numPerm)(SigUtil.coefA)
  private lazy val bs: Array[Long] = Array.tabulate(numPerm)(SigUtil.coefB)
  override def nullSafeEval(input: Any): Any = {
    val sh = input.asInstanceOf[ArrayData]
    val m = sh.numElements()
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < m) {
      if (!sh.isNullAt(i)) {
        val h = SigUtil.hash(sh.getUTF8String(i), 42L)
        var j = 0
        while (j < numPerm) {
          val p = as(j) * h + bs(j)
          if (p < sig(j)) sig(j) = p
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Fused MinHash → LSH band keys: computes the (bands × rowsPerBand)-perm
  * signature and folds each band's rows into one 64-bit key, all in one
  * pass. Fused because Catalyst's project collapsing would otherwise
  * re-evaluate a separate signature expression once per band lambda. */
case class MinHashBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with CodegenFallback {
  private val numPerm = bands * rowsPerBand
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_band_keys expects array<string>, got ${other.catalogString}")
  }
  private lazy val as: Array[Long] = Array.tabulate(numPerm)(SigUtil.coefA)
  private lazy val bs: Array[Long] = Array.tabulate(numPerm)(SigUtil.coefB)
  override def nullSafeEval(input: Any): Any = {
    val sh = input.asInstanceOf[ArrayData]
    val m = sh.numElements()
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < m) {
      if (!sh.isNullAt(i)) {
        val h = SigUtil.hash(sh.getUTF8String(i), 42L)
        var j = 0
        while (j < numPerm) {
          val p = as(j) * h + bs(j)
          if (p < sig(j)) sig(j) = p
          j += 1
        }
      }
      i += 1
    }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var k = 0x9E3779B97F4A7C15L * (b + 1)
      var r = 0
      while (r < rowsPerBand) {
        k = java.lang.Long.rotateLeft(k ^ sig(b * rowsPerBand + r), 27) * 0xC2B2AE3D27D4EB4FL
        r += 1
      }
      keys(b) = k
      b += 1
    }
    new GenericArrayData(keys)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

/** Winnowing fingerprints (Schleimer et al., SIGMOD'03): rolling k-gram
  * hashes, per-window minima, distinct sorted minima set — one pass. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val offs = SigUtil.codePointOffsets(bytes)
    val m = offs.length - 1
    val grams: Array[Long] =
      if (m < k) Array(SigUtil.hash(s, 42L))
      else Array.tabulate(m - k + 1)(i =>
        XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + offs(i),
          offs(i + k) - offs(i), 42L))
    val mins =
      if (grams.length <= w) Array(grams.min)
      else Array.tabulate(grams.length - w + 1) { i =>
        var mn = grams(i)
        var j = 1
        while (j < w) { if (grams(i + j) < mn) mn = grams(i + j); j += 1 }
        mn
      }
    val distinct = mins.distinct
    java.util.Arrays.sort(distinct)
    new GenericArrayData(distinct)
  }
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** 64-bit SimHash packed into one long: per token, the 64 bits of one
  * XXH64 hash vote ±1 per position; sign of each sum is the sig bit. */
case class SimHashSig(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects array<string>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val acc = new Array[Int](64)
    var i = 0
    while (i < m) {
      if (!toks.isNullAt(i)) {
        val h = SigUtil.hash(toks.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (acc(b) >= 0) sig |= (1L << b); b += 1 }
    sig
  }
  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}
