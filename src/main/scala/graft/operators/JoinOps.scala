package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for hostile key distributions at scale.
  *
  * AQE's skew-join split handles most skew automatically; these utilities
  * cover the cases it can't: a priori known hot keys in a shuffle join
  * (salting) and repeated large-to-large joins on a stable key (bucketing,
  * see IO + spec — co-located scans, no exchange at read time).
  */
object JoinOps {

  /** Skew-salted inner equi-join. The left (big, skewed) side gets a
    * random-but-deterministic salt in [0, saltFactor); the right side is
    * replicated saltFactor times. One hot key then spreads over
    * `saltFactor` reducers instead of melting one. Use when the right side
    * is too big to broadcast but small enough to replicate.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Pre-aggregate-then-join: collapse the fact side to one row per key
    * before joining a per-key dimension — the shuffle carries |keys| rows
    * instead of |facts|. `aggs` must be decomposable aggregates. */
  def aggThenJoin(fact: DataFrame, dim: DataFrame, key: String,
      aggs: Seq[Column]): DataFrame =
    fact.groupBy(key).agg(aggs.head, aggs.tail: _*).join(dim, key)
}
