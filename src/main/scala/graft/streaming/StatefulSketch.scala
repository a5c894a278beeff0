package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String

/** ALL fields Option (the SessEvent nullability note): NULL user_id /
  * props rows are real events — they count, they just don't sketch. */
case class SketchEvent(level: Option[String], user: Option[String],
    props: Option[String])

/** Per-group HLL state: one 4096-byte register array per sketched
  * column plus the exact event count — ~8 KB per DISTINCT event_type,
  * which is the entire point of carrying a sketch instead of a key set
  * in streaming state (a distinct-user set would grow without bound;
  * the registers never do). */
case class SketchState(users: Array[Byte], props: Array[Byte], n: Long)

case class SketchOut(event_type: Option[String], n_users_approx: Long,
    n_props_approx: Long, n_events: Long)

/** Continuous approximate distinct counts — the streaming twin of
  * [[graft.operators.Sketches.approxDistinctCounts]] (the
  * sessionize / sessionize_stateful pairing): per event_type, the SAME
  * deterministic md5-family HLL registers updated incrementally in
  * `flatMapGroupsWithState` state, emitting the running estimate each
  * trigger — the live "distinct users right now" dashboard tile.
  *
  * NoTimeout is deliberate: cardinality is a property of the whole
  * stream, so registers must persist (they are 8 KB per group forever,
  * not per-key growth). Register updates commute and are idempotent
  * (max per register), so at-least-once replays and out-of-order
  * arrival cannot change the converged estimate — the sketch form of
  * the engine's at-least-once contract. Batch mode sees each group
  * whole in one invocation, producing exactly
  * [[graft.operators.Sketches.approxDistinctCounts]]'s registers and
  * estimate — verified against the SAME SQL oracle. The estimate math
  * here is the column pipeline's literal-for-literal Scala twin (same
  * JVM log, same left-associated constant), so the two batch paths are
  * bit-identical, not approximately equal. */
object StatefulSketch {

  private val M = graft.operators.Sketches.HllM // 4096
  private val RhoW = 1L << 50

  def fromEvents(events: DataFrame): Dataset[SketchEvent] = {
    import events.sparkSession.implicits._
    events.select(
      col("event_type").as("level"),
      col("user_id").cast("string").as("user"),
      col("props").cast("string").as("props")).as[SketchEvent]
  }

  /** Update a register array in place with one value — the row form of
    * [[graft.operators.Sketches]]' hllRegister columns (same kernel,
    * same salted draw, same bin-length rho). */
  private def observe(regs: Array[Byte], s: String): Unit = {
    val b = java.lang.Long.remainderUnsigned(
      graft.expressions.Kernels.md5LowerOf(UTF8String.fromString(s)), M.toLong).toInt
    val w = java.lang.Long.remainderUnsigned(
      graft.expressions.Kernels.md5LowerOf(UTF8String.fromString("rho:" + s)), RhoW)
    // bitlen(w) = 64 - nlz(w) = length(bin(w)); rho = 51 - bitlen
    val rho = if (w == 0L) 51 else 51 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (rho > regs(b)) regs(b) = rho.toByte
  }

  /** The estimator, literal-for-literal the hllEstimate column pipeline
    * (exact integer z2, then one constant chain, one divide, one ln). */
  private def estimate(regs: Array[Byte]): Long = {
    var z2 = 0L
    var vz = 0L
    var i = 0
    while (i < M) {
      val mx = regs(i).toInt
      if (mx == 0) { vz += 1; z2 += (1L << 51) } else z2 += (1L << (51 - mx))
      i += 1
    }
    // all-zero registers (no value ever sketched — e.g. a group whose
    // column is always NULL): z2 would be m·2^51 = 2^63, one past the
    // int64 bound the occupied case guarantees (2^50·(8192−k) < 2^63
    // needs k ≥ 1). The column pipeline never reaches this state (its
    // group-by emits no row and the caller coalesces to 0) — return the
    // same 0 explicitly instead of leaning on wraparound accidents.
    if (vz == M) return 0L
    val eraw = 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0 *
      2251799813685248.0 / z2.toDouble
    val e = if (vz > 0 && eraw <= 10240.0)
      4096.0 * math.log(4096.0 / vz.toDouble) else eraw
    math.floor(e).toLong
  }

  def apply(events: Dataset[SketchEvent]): Dataset[SketchOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.level)
      .flatMapGroupsWithState[SketchState, SketchOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Option[String], it: Iterator[SketchEvent],
            state: GroupState[SketchState]) =>
          val st = state.getOption.getOrElse(
            SketchState(new Array[Byte](M), new Array[Byte](M), 0L))
          var n = st.n
          it.foreach { e =>
            n += 1
            e.user.foreach(observe(st.users, _))
            e.props.foreach(observe(st.props, _))
          }
          state.update(SketchState(st.users, st.props, n))
          Iterator.single(SketchOut(key,
            estimate(st.users), estimate(st.props), n))
      }
  }
}
