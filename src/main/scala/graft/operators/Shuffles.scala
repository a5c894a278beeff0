package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Partitioning helpers shared by the kernel-heavy operators. */
object Shuffles {

  /** Entity-distinct with kernel-grade parallelism.
    *
    * A plain `.distinct()` rides an ENSURE_REQUIREMENTS exchange, which
    * AQE coalesces by shuffle BYTES. Signature/embedding corpora are tiny
    * in bytes but heavy in downstream kernel CPU (minhash permutations,
    * winnow grams, feature-hash counts), so byte-based coalescing
    * serializes exactly the projections that need fan-out: locally a
    * single-split corpus file collapses the whole kernel stage — and the
    * session-persisted signature base built from it — onto ONE core; on a
    * cluster any corpus below ~advisoryPartitionSize × parallelism does
    * the same. Repartitioning on the full entity row with an EXPLICIT
    * partition count fixes both sides of that: user-specified counts are
    * exempt from AQE coalescing, and the hash partitioning satisfies the
    * distinct's clustering requirement, so the plan still carries exactly
    * ONE exchange (pinned by PlanShapeSpec). The shuffle itself is not
    * added cost — the distinct already required it.
    */
  def distinctEntities(df: DataFrame): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartition(n, df.columns.map(col).toIndexedSeq: _*).distinct()
  }
}
