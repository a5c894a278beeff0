package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5_number_lower(s)` as a codegen'd scalar: the little-endian uint64
  * of MD5 digest bytes 8..15 — bit-for-bit the oracle engine's function
  * of the same name, so any selection/bucketing decision made on this
  * value (split assignment, sample membership, batch membership) can be
  * replayed in plain SQL. Returned as the SIGNED 64-bit reinterpretation;
  * mirror unsigned-mod semantics with `pmod(x, m)` on the Spark side and
  * `((CAST(md5_number_lower(s) AS BIGINT) % m) + m) % m` on the oracle
  * side. MD5 here is a deterministic mixer, not a security primitive. */
case class Md5Lower(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_number_lower expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Kernels.md5LowerOf(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Kernels.md5LowerOf($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Lower =
    copy(child = newChild)
}

/** Per-row ASCII char-entropy statistics — see [[Kernels.charEntropy]].
  * A native kernel, not higher-order functions: HOFs evaluate interpreted
  * and the per-distinct-char filter-count was O(len·|alphabet|)/row. */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_ascii", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_distinct", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("h", org.apache.spark.sql.types.DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Kernels.charEntropy(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Kernels.charEntropy($c);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** UNSIGNED `md5_number_lower(s) mod m` — the selection predicate form.
  * The kernel's remainderUnsigned matches the oracle's native UBIGINT
  * `%` exactly, so neither side needs signed-reinterpretation gymnastics
  * (a DuckDB CAST(ubigint AS BIGINT) raises on values ≥ 2^63 rather
  * than reinterpreting). */
case class Md5LowerMod(child: Expression, m: Long) extends UnaryExpression {

  require(m > 0, s"modulus must be positive, got $m")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_number_lower_mod expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.remainderUnsigned(
      Kernels.md5LowerOf(input.asInstanceOf[UTF8String]), m)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = java.lang.Long.remainderUnsigned(" +
        s"graft.expressions.Kernels.md5LowerOf($c), ${m}L);")

  override protected def withNewChildInternal(newChild: Expression): Md5LowerMod =
    copy(child = newChild)
}
