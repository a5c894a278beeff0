package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** One-pass feature-hashing text embedding (the hashing trick):
  * each token hashes to a slot (xxhash64, seed 42) with a ±1 sign
  * (seed 77); the accumulated vector is L2-normalized.
  *
  * This replaces a ~64-dim nested higher-order-function formulation whose
  * interpreted lambdas cost O(3·dim·tokens) virtual calls per row (and
  * made materializing embeddings pathological). Here: O(tokens + dim) tight
  * JVM loop, constant-size expression tree, embarrassingly parallel — the
  * encoder stays a pure scan at 100 TB.
  *
  * Stand-in for the reference's external sentence-transformer
  * (/root/reference/src/embedding/embedder.py:22-30); deterministic, so the
  * oracle-side pipeline and every test can rely on byte-stable output.
  */
case class FeatureHashEmbed(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"feature_hash_embed expects array<string> tokens, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val acc = new Array[Double](dim)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        if (t.numBytes > 0) { // empty tokens (e.g. split of "") carry no signal
          val slot = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
          val sign = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 77L)
          val idx = java.lang.Math.floorMod(slot, dim.toLong).toInt
          acc(idx) += (if ((sign & 1L) == 0L) 1.0 else -1.0)
        }
      }
      i += 1
    }
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += acc(j) * acc(j); j += 1 }
    if (ss > 0.0) {
      val inv = 1.0 / java.lang.Math.sqrt(ss)
      j = 0
      while (j < dim) { acc(j) *= inv; j += 1 }
    }
    new GenericArrayData(acc)
  }

  override protected def withNewChildInternal(newChild: Expression): FeatureHashEmbed =
    copy(child = newChild)
}
