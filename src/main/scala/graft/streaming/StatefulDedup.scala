package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, md5}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** fp is Option: a NULL text fingerprints to NULL, and that is a REAL
  * group — the batch groupBy keeps it (the NULL-probe contract). doc_id
  * is the corpus key and non-null by schema. */
case class DedupDoc(fp: Option[String], doc_id: Long, n_chars: Option[Long])

/** Per-fingerprint state: the running keep-first winner, the copy
  * count, and the min char length — three scalars per DISTINCT
  * fingerprint, never per-row growth. */
case class DedupState(first_doc_id: Long, n_copies: Long,
    n_chars: Option[Long])

case class DedupOut(fp: Option[String], first_doc_id: Long, n_copies: Long,
    n_chars: Option[Long])

/** Continuous exact deduplication — the streaming twin of
  * [[graft.operators.TextOps.dedupExact]] (the sessionize /
  * sessionize_stateful pairing): documents arrive as a stream, state is
  * keyed by the md5 content fingerprint, and each trigger emits the
  * group's RUNNING verdict (keep-first winner, copy count, min length) —
  * the live "have I seen this document before" filter an ingestion
  * pipeline asks per batch.
  *
  * NoTimeout is deliberate: exact dedup is a property of the whole
  * stream, so a fingerprint's state must persist (three scalars per
  * DISTINCT document — state is bounded by content cardinality, which is
  * exactly what the operator exists to bound). The fold (min, count,
  * min) is order-insensitive per key group ACROSS triggers for min/min;
  * n_copies counts deliveries, the same at-least-once semantics the
  * batch count(*) has — a byte-identical replayed row increments both.
  * Batch mode sees each fingerprint whole in one invocation, producing
  * exactly the batch groupBy's row — verified against the SAME SQL
  * oracle as dedup_exact. */
object StatefulDedup {

  def fromDocuments(documents: DataFrame): Dataset[DedupDoc] = {
    import documents.sparkSession.implicits._
    documents.select(md5(col("text").cast("binary")).as("fp"),
      col("doc_id"), col("n_chars")).as[DedupDoc]
  }

  def apply(docs: Dataset[DedupDoc]): Dataset[DedupOut] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState[DedupState, DedupOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Option[String], it: Iterator[DedupDoc],
            state: GroupState[DedupState]) =>
          var first = state.getOption.map(_.first_doc_id)
            .getOrElse(Long.MaxValue)
          var n = state.getOption.map(_.n_copies).getOrElse(0L)
          var chars = state.getOption.flatMap(_.n_chars)
          it.foreach { d =>
            if (d.doc_id < first) first = d.doc_id
            n += 1
            chars = (chars, d.n_chars) match {
              case (Some(a), Some(b)) => Some(math.min(a, b))
              case (a, b) => a.orElse(b) // SQL min ignores NULLs
            }
          }
          state.update(DedupState(first, n, chars))
          Iterator.single(DedupOut(key, first, n, chars))
      }
  }
}
