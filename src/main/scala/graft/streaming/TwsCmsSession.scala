package graft.streaming

import graft.functions.TextHash
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** SESSION-windowed CMS counters on `transformWithState` — the
  * frequency leg of the session-sketch family (r18 VERDICT #8),
  * completing the KMV ([[KmvSessionProcessor]]) / quantile pair:
  * "hot items per user session", where a session closes on a
  * >`gapSeconds` quiet gap.
  *
  * One state row per OPEN session per user: the session's identity
  * (start second — `user|start` needs no counter, so closed-session
  * state drops outright), the latest event second, and the session's
  * SPARSE CMS cells — (i·width + bucket) → count pairs, ≤
  * depth · min(distinct items, width) entries, so carried state is
  * open_sessions × counter size no matter how long the stream runs
  * (the session-KMV state bound with cells instead of k-mins). On
  * close the session emits its cells; the probe finalizes OUTSIDE the
  * stream against exact top candidates (the
  * [[graft.llm.SketchOps.cmsTopCandidatesKeyed]] demo-twin pattern —
  * production would feed candidates from the stream or a sample), so
  * the entry's output is hash-identical to the batch keyed form.
  *
  * The bucket hash is plain [[TextHash.fnv1a64]] of `i ++ item`
  * masked to 63 bits mod width — bit-identical to the Catalyst
  * `cmsBuckets` kernel, so stream cells == batch cells cell-for-cell.
  *
  * Session-boundary ordering contract: identical to
  * [[KmvSessionProcessor]] (per-key event-time-ordered arrival across
  * micro-batches for exact parity; late events degrade safely — the
  * frontier and the session identity never regress).
  */
case class CmsSessState(sessionStart: Long, lastSec: Long,
    cellKeys: Array[Long], cellCnts: Array[Long], maxEventMs: Long,
    timerAt: Long)

case class CmsSessOut(user_id: Long, session_start: Long, cell: Long,
    cnt: Long)

class CmsSessionProcessor(gapSeconds: Long, depth: Int, width: Int)
    extends StatefulProcessor[Long, KmvSessEvent, CmsSessOut] {

  @transient private var st: ValueState[CmsSessState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[CmsSessState]("cmssess",
      Encoders.product[CmsSessState], TTLConfig.NONE)

  private def cellsOf(item: String): Array[Long] =
    Array.tabulate(depth) { i =>
      val b = (TextHash.fnv1a64(s"$i$item") & Long.MaxValue) % width
      i.toLong * width + b
    }

  private def emit(key: Long, s: CmsSessState): Iterator[CmsSessOut] =
    s.cellKeys.iterator.zip(s.cellCnts.iterator).map { case (c, n) =>
      CmsSessOut(key, s.sessionStart, c, n)
    }

  private def empty(maxEventMs: Long, timerAt: Long) =
    CmsSessState(Long.MinValue, Long.MinValue, Array.empty, Array.empty,
      maxEventMs, timerAt)

  override def handleInputRows(key: Long, rows: Iterator[KmvSessEvent],
      tv: TimerValues): Iterator[CmsSessOut] = {
    val sorted = rows.toArray.sortBy(e => (e.ts, e.event_id))
    var cur = if (st.exists()) st.get()
      else empty(Long.MinValue, Long.MinValue)
    val closed = scala.collection.mutable.ArrayBuffer.empty[CmsSessOut]
    var maxEventMs = cur.maxEventMs
    // mutable sparse cells for this fold
    val cells = scala.collection.mutable.LongMap.empty[Long]
    def load(s: CmsSessState): Unit = {
      cells.clear()
      s.cellKeys.iterator.zip(s.cellCnts.iterator)
        .foreach { case (c, n) => cells(c) = n }
    }
    def snap(s: CmsSessState): CmsSessState = {
      val ks = cells.keys.toArray.sorted
      s.copy(cellKeys = ks, cellCnts = ks.map(cells))
    }
    load(cur)
    for (e <- sorted) {
      if (e.event_time != null)
        maxEventMs = math.max(maxEventMs, e.event_time.getTime)
      if (cur.lastSec != Long.MinValue && e.ts - cur.lastSec > gapSeconds) {
        closed ++= emit(key, snap(cur))
        cur = empty(maxEventMs, cur.timerAt)
        cells.clear()
      }
      val start = if (cur.sessionStart == Long.MinValue) e.ts
        else cur.sessionStart
      cellsOf(e.item).foreach(c => cells(c) = cells.getOrElse(c, 0L) + 1L)
      // frontier regression guard — the KmvSessionProcessor contract
      cur = cur.copy(sessionStart = start,
        lastSec = math.max(cur.lastSec, e.ts))
    }
    cur = snap(cur)
    val base = if (maxEventMs == Long.MinValue)
      tv.getCurrentWatermarkInMs() else maxEventMs
    val at = math.max(base + gapSeconds * 1000L,
      tv.getCurrentWatermarkInMs() + 1L)
    if (cur.timerAt != at) {
      if (cur.timerAt != Long.MinValue) getHandle.deleteTimer(cur.timerAt)
      getHandle.registerTimer(at)
    }
    st.update(cur.copy(maxEventMs = maxEventMs, timerAt = at))
    closed.iterator
  }

  override def handleExpiredTimer(key: Long, tv: TimerValues,
      expired: ExpiredTimerInfo): Iterator[CmsSessOut] = {
    val out = if (st.exists() && st.get().cellKeys.nonEmpty)
      emit(key, st.get()).toArray.iterator
    else Iterator.empty
    st.clear()
    out
  }
}

object TwsCmsSession {

  /** Requires the RocksDB state store provider (the
    * `transformWithState` operator's contract). Input must carry an
    * `event_time` timestamp column; the watermark gates the session
    * timers. */
  def sessionCounters(events: Dataset[KmvSessEvent], gapSeconds: Long,
      depth: Int, width: Int, watermarkDelay: String = "10 seconds")
      : Dataset[CmsSessOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("event_time", watermarkDelay)
      .as[KmvSessEvent]
      .groupByKey(_.user_id)
      .transformWithState(new CmsSessionProcessor(gapSeconds, depth, width),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
