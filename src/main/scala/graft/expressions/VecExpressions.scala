package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst kernels over array<double> columns: dense-vector
  * scoring, plus sorted-array search ([[BucketIndex]], the quantile
  * bucketing primitive behind the distributed percentile rank).
  *
  * Higher-order-function lambdas (`aggregate(zip_with(...))`) are evaluated
  * interpreted, one closure call per element — that made similarity search
  * the hot spot (a 64-dim dot via HOFs costs ~130 virtual calls/row). These
  * expressions compile to a tight primitive loop inside whole-stage codegen:
  * the scoring stage stays scan-shaped and ~100× cheaper per row, which is
  * the difference between an ANN sweep being compute-bound or launch-bound
  * at 100 TB.
  */
abstract class VecBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
}

/** Dot product of two array<double> columns (shorter length wins). */
case class VecDot(left: Expression, right: Expression) extends VecBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($i) * $b.getDouble($i); }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance — FAISS IndexFlatL2's metric. */
case class VecL2Sq(left: Expression, right: Expression) extends VecBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

/** Unit-L2-normalized copy of an array<double> (zero vector stays zero).
  *
  * Replaces the interpreted `transform(a, x => x / sqrt(dot(a,a)))` HOF,
  * which re-evaluated the whole norm subtree per element — O(dim²) work per
  * row and a CodegenFallback on the corpus side of every ANN scan. Here the
  * norm is computed once and the division loop is primitive, all inside
  * whole-stage codegen.
  */
case class VecL2Normalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    val nrm = math.sqrt(s)
    val out = new Array[Double](n)
    if (nrm > 0.0) { i = 0; while (i < n) { out(i) = x.getDouble(i) / nrm; i += 1 } }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { double $v = $a.getDouble($i); $s += $v * $v; }
         |double $nrm = java.lang.Math.sqrt($s);
         |double[] $out = new double[$n];
         |if ($nrm > 0.0) {
         |  for (int $i = 0; $i < $n; $i++) { $out[$i] = $a.getDouble($i) / $nrm; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecL2Normalize =
    copy(child = newChild)
}

/** Upper-bound binary search of a double against a sorted bounds array:
  * returns the count of bounds <= value, i.e. the index of the value's
  * bucket among len(bounds)+1 quantile buckets. NaN routes to the LAST
  * bucket, matching Spark's sort order (NaN is greatest), so bucket
  * assignment is always consistent with an `ORDER BY value` within the
  * bucket — the invariant the distributed rank in
  * `Relational.valuePercentiles` is built on. O(log B) per row, inside
  * whole-stage codegen.
  */
case class BucketIndex(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, array<double>), got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(v: Any, b: Any): Any =
    BucketIndex.upperBound(b.asInstanceOf[ArrayData], v.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b) =>
      s"${ev.value} = graft.expressions.BucketIndex.upperBound($b, $v);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BucketIndex =
    copy(left = newLeft, right = newRight)
}

object BucketIndex {
  def upperBound(bounds: ArrayData, v: Double): Int = {
    if (v != v) return bounds.numElements() // NaN: greatest in Spark ordering
    var lo = 0
    var hi = bounds.numElements()
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (bounds.getDouble(m) <= v) lo = m + 1 else hi = m
    }
    lo
  }
}

/** 2-D Morton (Z-order) key: interleaves the low 16 bits of two bucket
  * indexes — `left` on even bit positions, `right` on odd — into one
  * long sort key. Sorting by the interleaved key clusters rows that are
  * close in BOTH dimensions into the same files, so a 2-D range query
  * prunes files on footer min/max stats in both dimensions; a linear
  * sort clusters only its leading column (see `IO.writeZOrdered`). */
case class BitInterleave(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, int), got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    BitInterleave.morton(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.BitInterleave.morton($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BitInterleave =
    copy(left = newLeft, right = newRight)
}

object BitInterleave {
  /** Spread the low 16 bits of x to the even bit positions (the standard
    * Morton spread via parallel-prefix masks). */
  def spread(x0: Int): Long = {
    var x = x0.toLong & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }
  def morton(a: Int, b: Int): Long = spread(a) | (spread(b) << 1)
}

/** Validity gate for similarity vectors: exact index dimension, every
  * element non-NULL and finite. A corrupt embedding (NaN/Inf element,
  * NULL cell, truncated or empty list) crashes the ML k-means fit and
  * poisons distance ranks, so the scan filters it out — and this kernel
  * keeps that filter inside whole-stage codegen (an `forall` lambda would
  * drop the whole corpus scan out of codegen, the exact regression
  * PlanShapeSpec pins against). Works on the RAW array<float> column so
  * the float→double cast only pays for vectors that survive.
  */
case class VecIsValid(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return java.lang.Boolean.FALSE
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return java.lang.Boolean.FALSE
      val v = if (elemIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
        return java.lang.Boolean.FALSE
      i += 1
    }
    java.lang.Boolean.TRUE
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val ok = ctx.freshName("ok")
      val v = ctx.freshName("v")
      val getter = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |boolean $ok = $a.numElements() == $dim;
         |for (int $i = 0; $ok && $i < $dim; $i++) {
         |  if ($a.isNullAt($i)) { $ok = false; } else {
         |    double $v = $getter;
         |    if (Double.isNaN($v) || Double.isInfinite($v)) { $ok = false; }
         |  }
         |}
         |${ev.value} = $ok;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecIsValid =
    copy(child = newChild)
}
