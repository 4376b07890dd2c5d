package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming MISRA–GRIES heavy hitters on `transformWithState` — the
  * q157 batch sketch as LIVE keyed state: per group (source, tenant,
  * shard…), a bounded `capacity`-counter summary of the item stream,
  * emitted after every fold. The deterministic-decrement MG guarantee
  * carries over verbatim: after N items, any item with true count
  * > N/(capacity+1) is IN the sketch, and each estimate undercounts by
  * at most N/(capacity+1) — bounded state for an unbounded stream, the
  * property a naive per-item count lacks.
  *
  * Determinism: within a micro-batch the items fold in (item asc) sorted
  * order, so the sketch after any batch is a pure function of the batch
  * SEQUENCE — kill-and-resume from the checkpoint replays to the
  * identical sketch (asserted in ScaleSpec), even though MG itself is an
  * order-dependent algorithm.
  *
  * State is one ValueState row per group holding ≤ `capacity` (item,
  * count) pairs — O(groups · capacity), RocksDB-resident at scale; the
  * emitted rows are the full sketch per touched group PLUS a zero-
  * estimate RETRACTION for every item the batch's decrements evicted
  * (Update mode): an upsert sink keyed (group, item) would otherwise pin
  * evicted items at their stale estimates forever, and `est = 0` is
  * exactly MG's statement that the item left the summary. With the
  * retractions, downstream sinks really do hold the latest summary.
  */
object StreamingHeavyHitters {

  /** One observed (group, item) occurrence. */
  case class ItemEvent(group: String, item: String)

  /** The whole per-group state: the MG counter table. */
  case class MgState(items: Map[String, Long])

  /** Sketch row: MG estimate for `item` (undercounts by ≤ N/(cap+1)). */
  case class Estimate(group: String, item: String, est: Long)

  /** The sequential MG fold — shared by the processor and the ScaleSpec
    * reference so the two cannot drift.
    */
  def mgFold(state: Map[String, Long], item: String,
      capacity: Int): Map[String, Long] =
    state.get(item) match {
      case Some(c) => state.updated(item, c + 1)
      case None if state.size < capacity => state.updated(item, 1L)
      case None =>
        state.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  /** One micro-batch through the sketch — ONE copy shared by both API
    * twins so the sorted-fold determinism AND the emit discipline cannot
    * drift between them: sorted fold (the sketch is a pure function of
    * the batch sequence, not of partition-internal row order), then the
    * live sketch rows plus zero-estimate retractions for the items this
    * batch's decrements evicted (see the object scaladoc).
    */
  private def mgBatch(key: String, start: Map[String, Long],
      rows: Iterator[ItemEvent], capacity: Int)
      : (Map[String, Long], Iterator[Estimate]) = {
    val folded = rows.map(_.item).toSeq.sorted
      .foldLeft(start)((m, it) => mgFold(m, it, capacity))
    val live = folded.toSeq.sortBy(_._1)
      .map { case (it, c) => Estimate(key, it, c) }
    val evicted = (start.keySet -- folded.keySet).toSeq.sorted
      .map(it => Estimate(key, it, 0L))
    (folded, (live ++ evicted).iterator)
  }

  class MgProcessor(capacity: Int)
      extends StatefulProcessor[String, ItemEvent, Estimate] {

    @transient private var st: ValueState[MgState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("mg", Encoders.product[MgState],
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ItemEvent],
        timerValues: TimerValues): Iterator[Estimate] = {
      val start = Option(st.get()).map(_.items).getOrElse(Map.empty)
      val (folded, out) = mgBatch(key, start, rows, capacity)
      st.update(MgState(folded))
      out
    }
  }

  /** Wire the sketch onto an item stream (Update output). */
  def track(events: Dataset[ItemEvent], capacity: Int): Dataset[Estimate] = {
    require(capacity >= 1, s"capacity must be positive, got $capacity")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.group)
      .transformWithState(new MgProcessor(capacity),
        TimeMode.None(), OutputMode.Update())
  }

  /** The legacy-API twin (`flatMapGroupsWithState`) — the same sorted
    * per-batch [[mgFold]] against the same `MgState`, so the two APIs
    * cannot drift (parity asserted in ScaleSpec, like the status machine
    * and drift monitor twins). MG needs no TTL or timers (bounded state
    * is the algorithm's own guarantee), so `NoTimeout` loses nothing —
    * the only semantics the new API adds here is its TTLConfig plumbing,
    * which [[track]] also leaves off.
    */
  def trackLegacy(events: Dataset[ItemEvent],
      capacity: Int): Dataset[Estimate] = {
    require(capacity >= 1, s"capacity must be positive, got $capacity")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[ItemEvent],
            state: GroupState[MgState]) => {
          val start = state.getOption.map(_.items).getOrElse(Map.empty)
          val (folded, out) = mgBatch(key, start, rows, capacity)
          state.update(MgState(folded))
          out
        })
  }
}
