package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ExpiredTimerInfo, TTLConfig, ValueState}

/** Stale-job WATCHDOG on `transformWithState` TIMERS — the V2-API
  * facility neither [[StatusProcessorV2]] nor the drift monitor
  * exercises. O15's stale-skip is a batch-side anti-join (q10): it
  * removes stale work from the NEXT dequeue, but nothing in the engine
  * produced a positive ALERT when a triggered job failed to reach a
  * terminal status within a deadline — the reference silently loses such
  * jobs (its scheduler simply never revisits a stuck in-flight request;
  * `/root/reference/src/services/ingestService.js:111-148` has no
  * timeout branch at all). This processor closes that gap with the
  * state-store-native mechanism:
  *
  *   - the per-key decision is the (t, terminal)-LEXICOGRAPHIC MAXIMUM
  *     over the prior state and the batch's events — deterministic in
  *     any arrival order (a stable sort alone left equal-t winners to
  *     shuffle order), with the terminal event winning a timestamp tie,
  *     so a revival must carry a STRICTLY newer t than the finish it
  *     revives past;
  *   - a winning NON-terminal event (re)arms a processing-time timer at
  *     `now + timeoutMs`, deleting the previously armed one — exactly
  *     one live timer per key, O(1) state; a LOSING batch of events
  *     STRICTLY older than the recorded decision (pure redeliveries —
  *     normal under at-least-once sources) changes nothing, and in
  *     particular does not extend a live deadline. A non-terminal event
  *     that TIES a live watch's lastT is the one ambiguous case (a
  *     coarse clock can stamp a genuinely new heartbeat with the same
  *     millisecond as the recorded one, indistinguishable from a
  *     redelivery): it EXTENDS the deadline — wrongly extending on a
  *     redelivered liveness signal is harmless, while ignoring a real
  *     heartbeat fires a false alert on an active job (round-14
  *     advisor) — but the extension is BOUNDED (round-15 advisor): the
  *     deadline never passes `armAt + 2·timeoutMs`, where `armAt` is
  *     when the recorded t FIRST won. Unbounded tie extension let a
  *     source that perpetually replays the same (key, t) heartbeat
  *     suppress a hung job's alert forever; with the cap, replay buys
  *     at most one extra timeout window past the last genuine progress,
  *     after which the watch fires. The residual tradeoff is explicit:
  *     a live job whose event clock stands still for TWO full timeout
  *     windows is indistinguishable from replay and will alert — a
  *     heartbeat mechanism must advance its timestamp at least that
  *     often. Tombstones ignore the tie either way: resurrection still
  *     needs a strictly newer t;
  *   - a winning terminal event leaves a TOMBSTONE (state kept, timer
  *     re-pointed at `now + timeoutMs` as a cleanup deadline): a
  *     finished job never alerts, and a redelivered OLDER non-terminal
  *     event cannot resurrect the watch and fire a false alert for a
  *     completed job — the hole plain clear-on-terminal leaves open.
  *     The tombstone holds for one timeout window (which also bounds
  *     state): a source replaying events older than that window needs a
  *     proportionally larger `timeoutMs`;
  *   - an EXPIRED timer on a live watch fires [[TimeoutMonitor.Alert]]
  *     once, carrying the last observed activity and the deadline that
  *     passed, and clears the state — so a later revival of the key
  *     starts a fresh watch rather than resurrecting the old one; an
  *     expired tombstone clears silently.
  *
  * Timers live in the state store (RocksDB at scale) and survive
  * restarts with the checkpoint — the watchdog keeps its promises across
  * a crash, unlike a driver-side `setTimeout` (which is precisely the
  * reference's scheduling primitive and precisely what dies with its
  * process).
  */
object TimeoutMonitor {

  /** One row per observed job event; `terminal` ends the watch. */
  case class WatchEvent(key: String, t: Long, terminal: Boolean)

  /** (last activity, armed deadline, terminal tombstone?, first-arm
    * processing time) — the whole per-key state. `done = true` means the
    * deadline is a tombstone cleanup, not a watch. `armAt` is the
    * processing time at which `lastT` first won the decision: it anchors
    * the tie-extension cap (deadline ≤ armAt + 2·timeoutMs) and resets
    * only on a STRICTLY newer event — replayed ties cannot move it.
    */
  case class WatchState(lastT: Long, deadline: Long, done: Boolean,
    armAt: Long)

  case class Alert(key: String, last_t: Long, deadline_ms: Long)

  class TimeoutProcessorV2(timeoutMs: Long)
      extends StatefulProcessor[String, WatchEvent, Alert] {

    @transient private var st: ValueState[WatchState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("watch", Encoders.product[WatchState],
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[WatchEvent],
        timerValues: TimerValues): Iterator[Alert] = {
      // the winner is the (t, terminal)-lexicographic max over prior
      // state and batch — see the object scaladoc: deterministic in any
      // arrival order; terminal wins a timestamp tie; a job that
      // finishes and is re-triggered within one micro-batch (terminal,
      // then a LATER non-terminal event) keeps its watch — an exists()
      // here would clear the state and let the revived job hang silently
      def rank(term: Boolean) = if (term) 1 else 0
      val win = rows.maxBy(e => (e.t, rank(e.terminal)))
      val prior = Option(st.get())
      val priorHolds = prior.exists(s =>
        Ordering[(Long, Int)].gteq(
          (s.lastT, rank(s.done)), (win.t, rank(win.terminal))))
      if (!priorHolds) {
        // the batch advances the decision: the old timer (watch or
        // tombstone cleanup) is obsolete either way. A strictly newer
        // winner also re-anchors armAt — genuine progress resets the
        // tie-extension budget.
        prior.foreach(s => getHandle.deleteTimer(s.deadline))
        val now = timerValues.getCurrentProcessingTimeInMs
        val deadline = now + timeoutMs
        getHandle.registerTimer(deadline)
        st.update(WatchState(win.t, deadline, win.terminal, now))
      } else prior.foreach { s =>
        // losing batch. STRICTLY older events are pure redeliveries and
        // change nothing; but a non-terminal event TYING a live watch's
        // lastT may be a genuinely new heartbeat under a coarse clock
        // (see scaladoc) — extend the deadline rather than risk a false
        // alert on an active job, CAPPED at armAt + 2·timeoutMs so a
        // perpetually-replayed heartbeat cannot suppress the alert
        // forever (round-15 advisor). armAt is NOT re-anchored: only a
        // strictly newer t is progress. A tombstone stays untouched
        // either way: resurrection needs a strictly newer t.
        if (!s.done && !win.terminal && win.t == s.lastT) {
          val now = timerValues.getCurrentProcessingTimeInMs
          val deadline =
            math.min(now + timeoutMs, s.armAt + 2L * timeoutMs)
          if (deadline > s.deadline) {
            getHandle.deleteTimer(s.deadline)
            getHandle.registerTimer(deadline)
            st.update(WatchState(s.lastT, deadline, done = false, s.armAt))
          }
        }
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Alert] = {
      // a tombstone expiry is silent cleanup; only a live watch alerts
      val out = Option(st.get()).filter(!_.done).map(s =>
        Alert(key, s.lastT, expiredTimerInfo.getExpiryTimeInMs)).iterator
      st.clear()
      out
    }
  }

  /** Wire the watchdog onto an event stream (append output; requires the
    * RocksDB provider at scale and `TimeMode.ProcessingTime` — timers are
    * a processing-time facility).
    */
  def watch(events: Dataset[WatchEvent], timeoutMs: Long): Dataset[Alert] = {
    require(timeoutMs >= 1, s"timeoutMs must be positive, got $timeoutMs")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .transformWithState(new TimeoutProcessorV2(timeoutMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
