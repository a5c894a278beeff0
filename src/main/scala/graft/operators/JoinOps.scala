package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** As-of join (LEFT): for each left row, the latest right row at or
    * before (`strict`: strictly before) the left row's time, per key —
    * right's non-key columns arrive as one struct column `payloadName`
    * (NULL when no right row qualifies).
    *
    * Spark-first formulation: no range join, no per-key collect. Both
    * sides union (right's payload rides a nullable struct), one hash
    * shuffle on the key, one spillable partition-local time sort, then a
    * running `last(payload, ignoreNulls)` window carries the newest right
    * payload forward onto each left row — O(n log n) in partition size
    * with merge-join memory behavior, at any scale. Tie order at equal
    * timestamps is encoded in `__o` (right-before-left for inclusive,
    * left-before-right for strict).
    *
    * `right` must be unique per (key, rightTime) — pre-aggregate ties
    * (e.g. `groupBy(key, t).agg(max(...))`) or the carried payload at a
    * tied timestamp is sort-order dependent.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payloadName: String,
      strict: Boolean = false): DataFrame = {
    Seq(payloadName, "__t", "__o").foreach { c =>
      require(!left.columns.contains(c), s"left already has a column named $c")
    }
    val payload = struct(right.columns.filterNot(_ == key).map(col).toIndexedSeq: _*)
    // NULL keys never match in a SQL equi/ASOF join — drop NULL-key right
    // rows so NULL-key left rows see an empty partition and get a NULL
    // payload, not each other's. NULL right times would sort NULLS FIRST
    // and masquerade as an infinitely-old match — SQL's ts >= rt is never
    // true for NULL, so drop those too.
    val r = right.where(col(key).isNotNull && col(rightTime).isNotNull)
      .select(col(key), col(rightTime).as("__t"),
        payload.as(payloadName)).withColumn("__o", lit(if (strict) 1 else 0))
    val l = left.withColumn("__t", col(leftTime))
      .withColumn("__o", lit(if (strict) 0 else 1))
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__o"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(payloadName, last(col(payloadName), ignoreNulls = true).over(w))
      .where(col("__o") === lit(if (strict) 0 else 1))
      .drop("__t", "__o")
  }
}
