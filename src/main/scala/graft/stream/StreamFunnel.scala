package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** One funnel event on the wire. */
case class FunnelEvent(user_id: Long, event_type: String, ts_sec: Long)

/** Emitted when a user ADVANCES to `step` (1-based) at `ts_sec`. */
case class FunnelAdvance(user_id: Long, step: Int, step_name: String, ts_sec: Long)

/** Streaming conversion funnel — the continuous-ingest twin of the
  * batch `a28_funnel` query: per user, track progression through an
  * ordered step list (each step within `windowSec` of the previous)
  * and emit an advancement row the moment a user reaches a new step.
  * Dashboards count `step = k` rows for a live funnel; `step = last`
  * is the realtime conversion trigger.
  *
  * Scale shape: ONE shuffle on user_id into `transformWithState`;
  * state per user is (current step, last-step timestamp) — constant
  * bytes, TTL-evictable, no event buffering. Within a micro-batch the
  * iterator is sorted by event time; ACROSS batches a late event
  * cannot retro-advance a funnel (at-arrival semantics — the standard
  * streaming-funnel trade; the batch twin is the exact form and the
  * nightly reconciliation).
  */
object StreamFunnel {

  /** `stateTtl=None` → TimeMode.None for deterministic
    * `processAllAvailable()` tests (house convention); production
    * passes the funnel horizon so abandoned funnels evict. */
  def funnelScreen(events: DataFrame, userCol: String, typeCol: String,
      tsSecCol: String, steps: Seq[String], windowSec: Long,
      stateTtl: Option[java.time.Duration] = Some(java.time.Duration.ofDays(7))): Dataset[FunnelAdvance] = {
    require(steps.nonEmpty && steps.distinct.length == steps.length,
      s"steps must be non-empty and distinct: $steps")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(col(userCol).cast("long").as("user_id"),
        col(typeCol).cast("string").as("event_type"),
        graft.Tables.tsSec(col(tsSecCol)).as("ts_sec"))
      .as[FunnelEvent]
    val timeMode =
      if (stateTtl.isDefined) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    typed.groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(steps.toArray, windowSec, stateTtl),
        timeMode, OutputMode.Append())
  }

  /** (steps completed so far, timestamp of the latest completed step). */
  case class FunnelState(step: Int, lastTs: Long)

  class FunnelProcessor(steps: Array[String], windowSec: Long,
      ttl: Option[java.time.Duration])
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, FunnelEvent, FunnelAdvance] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FunnelState]("funnelState",
        org.apache.spark.sql.Encoders.product[FunnelState],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(user: Long, in: Iterator[FunnelEvent],
        tv: TimerValues): Iterator[FunnelAdvance] = {
      val prev = if (state.exists()) state.get() else FunnelState(0, Long.MinValue)
      var s = prev
      val out = Vector.newBuilder[FunnelAdvance]
      // event-time order within the batch (cross-batch late events are
      // at-arrival by design — see scaladoc)
      in.toArray.sortBy(e => (e.ts_sec, e.event_type)).foreach { e =>
        if (s.step < steps.length && e.event_type == steps(s.step) &&
            (s.step == 0 || (e.ts_sec > s.lastTs && e.ts_sec <= s.lastTs + windowSec))) {
          s = FunnelState(s.step + 1, e.ts_sec)
          out += FunnelAdvance(user, s.step, steps(s.step - 1), e.ts_sec)
        }
      }
      // write only on change: a user who never matches step 1 stores
      // NOTHING (no per-user bloat for non-funnel traffic), and TTL
      // refreshes only on progress, so abandoned funnels really evict
      if (s != prev) state.update(s)
      out.result().iterator
    }
  }
}
