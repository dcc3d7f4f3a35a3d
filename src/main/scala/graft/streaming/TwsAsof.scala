package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** One row of the unioned probe/state stream feeding the streaming
  * as-of join: `tag` 0 = state, 1 = probe; `ts` is the event time in
  * whole seconds and `event_time` its timestamp form (the watermark
  * column).
  */
case class AsofInput(key: Long, tag: Int, id: Long, ts: Long,
    event_time: java.sql.Timestamp)

case class AsofOut(key: Long, probe_id: Long, probe_ts: Long,
    state_id: Option[Long], state_ts: Option[Long])

/** Streaming keyed as-of join on `transformWithState` — the
  * event-time-correct form of [[graft.operators.AsofJoin.keyed]] for
  * two live streams: every probe is answered with the latest state
  * at-or-before its timestamp, INCLUDING states that arrive in a
  * later micro-batch (out of order but not late).
  *
  * Correctness shape: a probe cannot be resolved before the watermark
  * passes its timestamp — until then an earlier state may still
  * legally arrive. So probes buffer in per-key state, one timer per
  * key fires at the earliest pending probe's ts+1, and resolution
  * happens from the timer callback once the watermark has passed.
  * State is pruned to the single latest state before the watermark
  * plus any states at-or-after it (an older state can never again be
  * "latest at-or-before" any future probe), so per-key state is
  * bounded by the in-flight window, not the stream's history.
  */
class AsofProcessor extends StatefulProcessor[Long, AsofInput, AsofOut] {

  @transient private var states: ListState[(Long, Long)] = _ // (ts, id)
  @transient private var pending: ListState[(Long, Long)] = _ // (ts, probe_id)
  @transient private var timer: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    states = getHandle.getListState[(Long, Long)](
      "states", Encoders.product[(Long, Long)], TTLConfig.NONE)
    pending = getHandle.getListState[(Long, Long)](
      "pending", Encoders.product[(Long, Long)], TTLConfig.NONE)
    timer = getHandle.getValueState[Long](
      "timer", Encoders.scalaLong, TTLConfig.NONE)
  }

  private def armTimer(atMs: Long): Unit = {
    if (!timer.exists() || timer.get() != atMs) {
      if (timer.exists()) getHandle.deleteTimer(timer.get())
      getHandle.registerTimer(atMs)
      timer.update(atMs)
    }
  }

  override def handleInputRows(key: Long, rows: Iterator[AsofInput],
      tv: TimerValues): Iterator[AsofOut] = {
    var minPending = if (timer.exists()) timer.get() - 1L else Long.MaxValue
    var sawState = false
    rows.foreach { r =>
      if (r.tag == 0) { states.appendValue((r.ts, r.id)); sawState = true }
      else {
        pending.appendValue((r.ts, r.id))
        minPending = math.min(minPending, r.ts * 1000L)
      }
    }
    // fire strictly AFTER the watermark passes the probe ts: an
    // equal-ts state is not late and may still arrive
    if (minPending != Long.MaxValue) armTimer(minPending + 1L)
    // prune whenever states were appended, NOT only when no probe is
    // pending: one far-future probe would otherwise pin the timer and
    // let state-only batches grow the list unboundedly until the
    // watermark reaches it. The threshold is min(watermark, earliest
    // pending probe) rather than the bare watermark — a just-ripe
    // probe's timer fires AFTER this batch's input rows, so pruning
    // at the watermark alone could discard the pre-watermark state
    // that probe still needs. Every pending probe has ts >= the
    // threshold, and the latest state before the threshold dominates
    // all earlier ones for it, so this is always safe.
    if (sawState)
      pruneStates(math.min(tv.getCurrentWatermarkInMs(), minPending))
    Iterator.empty
  }

  /** Keep the single latest state before the watermark plus everything
    * at-or-after it — an older state can never again be the "latest
    * at-or-before" answer for any resolvable probe.
    */
  private def pruneStates(wm: Long): Unit = {
    val st = states.get().toArray.sortBy(identity)
    val (before, after) = st.partition(_._1 * 1000L < wm)
    val kept = (before.lastOption.toSeq ++ after).distinct.toArray
    states.clear()
    if (kept.nonEmpty) states.put(kept)
  }

  override def handleExpiredTimer(key: Long, tv: TimerValues,
      expired: ExpiredTimerInfo): Iterator[AsofOut] = {
    val wm = tv.getCurrentWatermarkInMs()
    val st = states.get().toArray.sortBy(identity) // (ts, id): max id last per ts
    val (ripe, stillPending) = pending.get().toArray
      .partition { case (ts, _) => ts * 1000L < wm }
    val out = ripe.sortBy(identity).map { case (pts, pid) =>
      val latest = st.view.filter(_._1 <= pts).lastOption
      AsofOut(key, pid, pts, latest.map(_._2), latest.map(_._1))
    }
    pruneStates(wm)
    pending.clear()
    if (stillPending.nonEmpty) pending.put(stillPending)
    timer.clear()
    if (stillPending.nonEmpty)
      armTimer(stillPending.map(_._1).min * 1000L + 1L)
    out.iterator
  }
}

object TwsAsof {

  /** Streaming keyed as-of over a pre-unioned probe/state stream (the
    * caller tags the two sources — see AsofInput). Requires the
    * RocksDB state store provider, like every transformWithState
    * operator.
    */
  def asofKeyed(input: Dataset[AsofInput],
      watermarkDelay: String = "10 seconds"): Dataset[AsofOut] = {
    val spark = input.sparkSession
    import spark.implicits._
    input
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.key)
      .transformWithState(new AsofProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
