package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming CUSUM drift monitoring — [[graft.operators.EventTime.cusum]]'s
  * recurrence as LIVE keyed state instead of a batch window pass. The
  * batch form derives the per-key mean internally; a stream cannot (the
  * mean would drift with the thing being monitored), so the caller pins
  * the reference `mu` — the classical control-chart contract: target from
  * history, monitor against it (same reason q225's scaled form exists:
  * no division, BIGINTs only, here trivially so since mu is a constant).
  *
  * Per key: `S := max(0, S + x − mu − k)` folds over arriving
  * observations, one BIGINT of state per key in the state store —
  * `mapGroupsWithState` economics, bounded regardless of stream length.
  * Each observation emits its post-update S and alarm flag; the state
  * survives restarts through the checkpoint, so a kill-and-resume
  * continues the SAME accumulation (asserted against the batch recurrence
  * in `ScaleSpec`).
  *
  * Ordering: observations are folded in (t, x) order WITHIN a
  * micro-batch — a TOTAL order, because the `max(0, ·)` clamp makes the
  * recurrence order-sensitive and a sort on t alone leaves equal-t ties
  * to nondeterministic shuffle arrival order, which would break the
  * asserted kill-and-resume replay parity (equal (t, x) duplicates
  * commute through the fold, so the pair suffices). Across batches the
  * fold follows arrival order (exactly the state-store contract every
  * keyed stateful operator has). An upstream watermark+sort stage
  * tightens this when out-of-order arrival matters.
  */
object DriftMonitor {

  case class Obs(key: String, t: Long, x: Long)
  case class CusumState(s: Long)
  case class Alarm(key: String, t: Long, x: Long, s: Long, alarm: Boolean)

  /** The sequential CUSUM fold over one micro-batch — ONE copy shared by
    * both API twins, so the correctness-critical recurrence (and the
    * deterministic (t, x) fold order above) cannot drift between them.
    */
  private def cusumFold(key: String, s0: Long, rows: Iterator[Obs],
      mu: Long, k: Long, h: Long): (Long, Seq[Alarm]) = {
    var s = s0
    val out = rows.toSeq.sortBy(e => (e.t, e.x)).map { e =>
      s = math.max(0L, s + e.x - mu - k)
      Alarm(key, e.t, e.x, s, s >= h)
    }
    (s, out)
  }

  def monitor(events: Dataset[Obs], mu: Long, k: Long, h: Long)
      : Dataset[Alarm] = {
    require(h >= 1, s"alarm threshold h must be >= 1, got $h")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Obs], state: GroupState[CusumState]) =>
          val (s, out) = cusumFold(key,
            state.getOption.map(_.s).getOrElse(0L), it, mu, k, h)
          state.update(CusumState(s))
          out.iterator
      }
  }

  /** The same fold on Spark 4's `transformWithState` — the modern keyed-
    * state API twin (typed state handle, native per-state TTL, RocksDB-
    * backed), mirroring the [[StatusProcessorV2]]/[[StatusStateMachine]]
    * pairing so both status tracking AND drift monitoring carry both
    * APIs. Kill-and-resume parity with the batch recurrence is asserted
    * for BOTH in `ScaleSpec`.
    */
  class DriftProcessorV2(mu: Long, k: Long, h: Long,
      ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, Obs, Alarm] {

    @transient private var sState: ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sState = getHandle.getValueState("cusum",
        Encoders.product[CusumState], ttl)

    override def handleInputRows(key: String, rows: Iterator[Obs],
        timerValues: TimerValues): Iterator[Alarm] = {
      // a TTL-evicted key reads as null → the fold restarts at S = 0 (an
      // idle metric's accumulated drift is stale evidence by definition)
      val (s, out) = cusumFold(key,
        Option(sState.get()).map(_.s).getOrElse(0L), rows, mu, k, h)
      sState.update(CusumState(s))
      out.iterator
    }
  }

  /** [[monitor]] on the transformWithState API (unbounded state). */
  def monitorV2(events: Dataset[Obs], mu: Long, k: Long, h: Long)
      : Dataset[Alarm] = {
    require(h >= 1, s"alarm threshold h must be >= 1, got $h")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .transformWithState(new DriftProcessorV2(mu, k, h),
        TimeMode.None(), OutputMode.Append())
  }

  /** Production form with BOUNDED state: native per-state TTL counted
    * from each key's last update — an actively-monitored metric never
    * expires; an idle one is dropped store-side without a per-key timer
    * (requires `TimeMode.ProcessingTime`, same contract as
    * [[StatusProcessorV2.trackWithTtl]]).
    */
  def monitorV2WithTtl(events: Dataset[Obs], mu: Long, k: Long, h: Long,
      ttl: java.time.Duration): Dataset[Alarm] = {
    require(h >= 1, s"alarm threshold h must be >= 1, got $h")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .transformWithState(new DriftProcessorV2(mu, k, h, TTLConfig(ttl)),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
