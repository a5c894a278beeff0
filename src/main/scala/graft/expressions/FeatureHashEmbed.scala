package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** One-pass feature-hashing text embedding (the hashing trick):
  * each token hashes to a slot (xxhash64, seed 42) with a ±1 sign
  * (seed 77); the accumulated vector is L2-normalized.
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
