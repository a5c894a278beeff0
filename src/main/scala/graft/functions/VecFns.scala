package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import graft.expressions.{VecDot, VecL2Normalize, VecL2Sq}

/** Dense-vector math over `array<double>` columns. The hot kernels (dot,
  * squared L2) are native codegen'd Catalyst expressions
  * ([[graft.expressions.VecDot]] / [[VecL2Sq]]) — a tight primitive loop in
  * whole-stage codegen instead of interpreted higher-order-function
  * lambdas; everything composes as ordinary Columns.
  *
  * Re-expresses the distance kernels of the reference's FAISS index
  * (/root/reference/src/vector_db/faiss_db.py:49-62, IndexFlatL2).
  */
object VecFns {
  /** Cast a float-array embedding to double for stable accumulation. */
  def toDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; a zero vector (junk embedding) scores 0.0 against
    * everything — the raw quotient would be 0/0, which under ANSI mode
    * (Spark 4 default) is a DIVIDE_BY_ZERO error, and with ANSI off a NaN
    * that sorts ABOVE every real similarity and passes `>= thr` checks.
    * The conditional evaluates the division only when the denominator is
    * nonzero (If branches are lazy in eval and codegen), and NULL inputs
    * still propagate as NULL through the otherwise branch. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Squared L2 — what FAISS IndexFlatL2 returns as `distance`. */
  def l2sq(a: Column, b: Column): Column =
    Bridge.column(VecL2Sq(Bridge.expression(a), Bridge.expression(b)))

  /** Unit-normalize, native one-pass kernel (zero vector stays zero). */
  def l2Normalize(a: Column): Column =
    Bridge.column(VecL2Normalize(Bridge.expression(a)))
}
