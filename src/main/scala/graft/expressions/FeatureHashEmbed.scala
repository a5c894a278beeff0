package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}

/** One-pass feature-hashing text embedding (the hashing trick):
  * each token MD5-hashes to a slot with a ±1 sign; the accumulated
  * vector is L2-normalized.
  *
  * The per-token hash is pinned to the oracle engine's md5_number
  * contract (slot = little-endian uint64 of digest bytes 8..15 mod dim;
  * sign = digest byte 0's LSB — see [[Kernels.featureHashCounts]]), so a
  * plain-SQL oracle can rebuild the embedding token-for-token from the
  * raw tables and hash-verify every derived statistic.
  *
  * Replaces a nested higher-order-function formulation whose interpreted
  * lambdas cost O(3·dim·tokens) virtual calls per row. The kernel is a
  * tight JVM loop ([[Kernels.featureHashEmbed]]) invoked statically from
  * generated code, so embedding stages stay inside whole-stage codegen —
  * a pure scan at 100 TB.
  *
  * Stand-in for the reference's external sentence-transformer
  * (/root/reference/src/embedding/embedder.py:22-30); deterministic, so
  * the oracle-side pipeline and every test can rely on byte-stable output.
  */
case class FeatureHashEmbed(child: Expression, dim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"feature_hash_embed expects array<string> tokens, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Kernels.featureHashEmbed(input.asInstanceOf[ArrayData], dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Kernels.featureHashEmbed($c, $dim);")

  override protected def withNewChildInternal(newChild: Expression): FeatureHashEmbed =
    copy(child = newChild)
}

/** The pre-normalization integer slot counts behind [[FeatureHashEmbed]]:
  * counts(slot) = Σ ±1 over tokens hashing there. Integer-exact, so
  * consumers that must agree bit-for-bit with a SQL oracle (embedding
  * signatures, similarity ranks) derive their floats from these counts
  * with a single, mirrored float expression instead of an
  * order-sensitive float accumulation. */
case class FeatureHashCounts(child: Expression, dim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"feature_hash_counts expects array<string> tokens, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Kernels.featureHashCounts(input.asInstanceOf[ArrayData], dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Kernels.featureHashCounts($c, $dim);")

  override protected def withNewChildInternal(newChild: Expression): FeatureHashCounts =
    copy(child = newChild)
}

/** One-pass derived statistics of the feature-hash embedding:
  * struct(sum_abs, sum_sq, counts_csv) — see [[Kernels.featureHashMeta]].
  * Exists so embed_text's projection needs no higher-order functions and
  * stays inside whole-stage codegen. */
case class FeatureHashMeta(child: Expression, dim: Int) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("sum_abs", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("counts_csv", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"feature_hash_meta expects array<string> tokens, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Kernels.featureHashMeta(input.asInstanceOf[ArrayData], dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Kernels.featureHashMeta($c, $dim);")

  override protected def withNewChildInternal(newChild: Expression): FeatureHashMeta =
    copy(child = newChild)
}
