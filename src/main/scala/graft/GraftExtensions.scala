package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.IntegerType
import graft.expressions._

/** Exposes graft's native kernels as SQL functions.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build (the
  *    SparkSessionExtensions route);
  *  - [[GraftFunctions.register]] on a live session.
  *
  * After either: `SELECT vec_dot(a, b)`, `simhash_sig(tokens)`, … work in
  * plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
        b))
    }
}

object GraftFunctions {
  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => VecDot(es(0), es(1))),
    "vec_l2sq" -> (es => VecL2Sq(es(0), es(1))),
    "vec_l2_normalize" -> (es => VecL2Normalize(es(0))),
    "feature_hash_embed" -> (es => FeatureHashEmbed(es(0), intArg(es(1), "dim"))),
    "word_shingles" -> (es => WordShingles(es(0), intArg(es(1), "n"))),
    "char_shingles" -> (es => CharShingles(es(0), intArg(es(1), "n"))),
    "minhash_sig" -> (es => MinHashSig(es(0), intArg(es(1), "numPerm"))),
    "minhash_band_keys" -> (es =>
      MinHashBandKeys(es(0), intArg(es(1), "bands"), intArg(es(2), "rowsPerBand"))),
    "minhash_jaccard" -> (es => MinHashJaccard(es(0), es(1))),
    "simhash_sig" -> (es => SimHashSig(es(0))),
    "winnow_fingerprints" -> (es =>
      WinnowFingerprints(es(0), intArg(es(1), "k"), intArg(es(2), "w"))),
    "md5_number_lower" -> (es => Md5Lower(es(0))),
    "bucket_index" -> (es => BucketIndex(es(0), es(1))),
    "bit_interleave" -> (es => BitInterleave(es(0), es(1))))

  /** Register every graft function on a live session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => Bridge.registerFunction(spark, name, b) }
}
