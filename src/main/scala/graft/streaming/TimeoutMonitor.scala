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
  *   - every NON-terminal event (re)arms a processing-time timer at
  *     `now + timeoutMs`, deleting the previously armed one — exactly
  *     one live timer per key, O(1) state (last event time + armed
  *     deadline);
  *   - a terminal event disarms the timer and clears the state — a
  *     completed job can never alert;
  *   - an EXPIRED timer fires [[TimeoutMonitor.Alert]] once, carrying
  *     the last observed activity and the deadline that passed, and
  *     clears the state — so a later revival of the key starts a fresh
  *     watch rather than resurrecting the old one.
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

  /** (last activity, armed deadline) — the whole per-key state. */
  case class WatchState(lastT: Long, deadline: Long)

  case class Alert(key: String, last_t: Long, deadline_ms: Long)

  class TimeoutProcessorV2(timeoutMs: Long)
      extends StatefulProcessor[String, WatchEvent, Alert] {

    @transient private var st: ValueState[WatchState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("watch", Encoders.product[WatchState],
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[WatchEvent],
        timerValues: TimerValues): Iterator[Alert] = {
      // disarm whatever was pending — the new batch decides what's next
      Option(st.get()).foreach(s => getHandle.deleteTimer(s.deadline))
      val evs = rows.toSeq.sortBy(_.t)
      // terminality is decided by the LAST event in event-time order: a
      // job that finishes and is re-triggered within one micro-batch
      // (terminal followed by a later non-terminal event) must keep its
      // watch — an exists() here would clear the state and let the
      // revived job hang silently until its next event
      if (evs.last.terminal) {
        st.clear() // done: a finished job never alerts
      } else {
        val deadline = timerValues.getCurrentProcessingTimeInMs + timeoutMs
        getHandle.registerTimer(deadline)
        st.update(WatchState(evs.last.t, deadline))
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Alert] = {
      val out = Option(st.get()).map(s =>
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
