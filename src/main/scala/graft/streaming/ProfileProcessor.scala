package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
  MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  TTLConfig, ValueState}

/** Per-user running profile on Spark 4's `transformWithState` API — the
  * successor to `mapGroupsWithState`: typed state handles (`ValueState`
  * here; list/map state and timers for richer processors) managed by the
  * operator, RocksDB-backed, with per-state TTL available through
  * `TTLConfig`. Same accumulation semantics as the engine's
  * mapGroupsWithState profile query (st_mapgroups_state), so the same
  * oracle pins both APIs to one result.
  *
  * Input rows are (user, epoch second, cents); state and output carry
  * (n events, total cents, first sec, last sec) with the total emitted
  * in dollars. Emissions are cumulative per batch (update mode) — the
  * reader keeps the latest per key.
  */
class ProfileProcessor extends StatefulProcessor[
    Long, (Long, Long, Long), (Long, Long, Double, Long, Long)] {

  /** TTL for the profile state; NONE here, overridden by the TTL
    * variant. TTL-expired state reads as absent, so an expired user's
    * profile restarts from zero — the state-store-bounding behavior an
    * unbounded key space needs without explicit timers.
    */
  protected def ttl: TTLConfig = TTLConfig.NONE

  @transient private var state: ValueState[(Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long, Long, Long)]("profile",
      Encoders.product[(Long, Long, Long, Long)], ttl)

  override def handleInputRows(user: Long,
      rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Double, Long, Long)] = {
    val prev =
      if (state.exists()) state.get()
      else (0L, 0L, Long.MaxValue, Long.MinValue)
    val next = rows.foldLeft(prev) { case ((n, tot, f, l), (_, sec, cents)) =>
      (n + 1, tot + cents, math.min(f, sec), math.max(l, sec))
    }
    state.update(next)
    Iterator((user, next._1, next._2 / 100.0, next._3, next._4))
  }
}

/** The same profile with a per-state TTL (`TTLConfig`): state untouched
  * for `ttlMs` of processing time reads as absent and the profile
  * restarts — how a per-user processor over an unbounded key space keeps
  * its RocksDB store finite without registering explicit timers. TTL
  * state requires `TimeMode.ProcessingTime`.
  */
class TtlProfileProcessor(ttlMs: Long) extends ProfileProcessor {
  override protected def ttl: TTLConfig =
    TTLConfig(java.time.Duration.ofMillis(ttlMs))
}

/** Explicit TIMERS on the new API — the transformWithState form of
  * ProcessingTimeTimeout eviction: users below `split` re-arm a
  * processing-time timer on every input batch; when the timer fires with
  * the user idle, [[handleExpiredTimer]] emits the COMPLETE final
  * profile flagged expired and clears the state. Timers from earlier
  * batches that fire after the eviction find no state and emit nothing,
  * so the eviction row is emitted exactly once. Requires
  * `TimeMode.ProcessingTime`.
  */
class TimerEvictProcessor(split: Long) extends StatefulProcessor[
    Long, (Long, Long), (Long, Long, Double, Boolean)] {

  @transient private var state: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long)]("profile",
      Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Double, Boolean)] = {
    val prev = if (state.exists()) state.get() else (0L, 0L)
    val next = rows.foldLeft(prev) { case ((n, tot), (_, c)) =>
      (n + 1, tot + c)
    }
    state.update(next)
    // arm eviction ONLY for the idle (low) half — an armed, never-firing
    // timer would keep the bounded harness spinning
    if (user < split)
      getHandle.registerTimer(
        timerValues.getCurrentProcessingTimeInMs() + 1L)
    Iterator((user, next._1, next._2 / 100.0, false))
  }

  override def handleExpiredTimer(user: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo)
      : Iterator[(Long, Long, Double, Boolean)] =
    if (!state.exists()) Iterator.empty // already evicted by a prior timer
    else {
      val (n, tot) = state.get()
      state.clear()
      Iterator((user, n, tot / 100.0, true))
    }
}

/** `MapState` shape of the new API — the per-key sub-keyed accumulator:
  * each user's state is a map event_type → (count, cents sum), updated
  * point-wise per input row (only the touched sub-keys are read/written —
  * on RocksDB a map entry is its own store key, so a user with thousands
  * of types pays per-entry I/O, not a full-value rewrite like a Map held
  * in `ValueState` would). Emits one row per (user, type) present in the
  * map after each batch; update-mode readers keep the latest per pair.
  */
class TypeCountsProcessor extends StatefulProcessor[
    Long, (Long, String, Long), (Long, String, Long, Long)] {

  @transient private var counts: MapState[String, (Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, (Long, Long)]("type_counts",
      Encoders.STRING, Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(user: Long,
      rows: Iterator[(Long, String, Long)],
      timerValues: TimerValues): Iterator[(Long, String, Long, Long)] = {
    rows.foreach { case (_, tpe, cents) =>
      val (n, tot) =
        if (counts.containsKey(tpe)) counts.getValue(tpe) else (0L, 0L)
      counts.updateValue(tpe, (n + 1, tot + cents))
    }
    counts.iterator().map { case (tpe, (n, tot)) => (user, tpe, n, tot) }
  }
}

/** `ListState` shape of the new API: each user keeps their top-`k`
  * events by (cents desc, sec asc) as a BOUNDED list — the per-key
  * leaderboard/recent-items state every feed pipeline carries. The list
  * is pruned to `k` on every batch, so state size is k items per key at
  * any input volume, and the kept set is a pure function of the event
  * MULTISET (order-of-arrival independent — batch boundaries and shuffle
  * order cannot change it), which is what lets a closed-form oracle pin
  * the result. Emits (user, kept count, kept cents sum, best sec).
  */
class TopEventsProcessor(k: Int) extends StatefulProcessor[
    Long, (Long, Long, Long), (Long, Long, Long, Long)] {

  @transient private var top: ListState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    top = getHandle.getListState[(Long, Long)]("top",
      Encoders.product[(Long, Long)], TTLConfig.NONE)

  /** (cents, sec) ranked: more cents first, earlier sec breaks ties. */
  private def rank(e: (Long, Long)): (Long, Long) = (-e._1, e._2)

  override def handleInputRows(user: Long,
      rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    val prev = if (top.exists()) top.get().toSeq else Seq.empty
    val next = (prev ++ rows.map { case (_, sec, cents) => (cents, sec) })
      .sortBy(rank).take(k)
    top.put(next.toArray)
    Iterator((user, next.size.toLong, next.map(_._1).sum, next.head._2))
  }
}
