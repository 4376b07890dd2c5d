package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.Status

/** A batch status-change event (the stream the scheduler emits). */
final case class BatchEvent(
    ingestion_id: String,
    batch_id: String,
    status: String,
    ts: Timestamp)

/** Live rollup row per ingestion request. */
final case class IngestionStatus(
    ingestion_id: String,
    n_batches: Long,
    n_completed: Long,
    status: String)

/** The status state machine (O13/O14/O17) on Spark's NATIVE keyed state:
  * `mapGroupsWithState` over batch-status events, keyed by ingestion_id.
  * State per key is just (batch_id → latest status) — the rollup lattice
  * (all yet_to_start → yet_to_start, all completed → completed, else
  * triggered; reference `/root/reference/src/services/ingestService.js:15-35`)
  * is recomputed on every update and emitted downstream.
  *
  * This is the per-key complement to IngestPipeline's global scheduler: keyed
  * state scales horizontally (state store partitions by key, no global
  * coordination), which is exactly what a 100 TB status table needs.
  *
  * Two entry points: `track` (no eviction — bounded replays/tests) and
  * `trackWithEviction` (watermark + event-time timeout — the PRODUCTION
  * shape: an unbounded stream would otherwise grow keyed state forever, the
  * reference's own leak, `/root/reference/src/services/ingestService.js:3`,
  * which we explicitly do not copy).
  */
object StatusStateMachine {

  private[graft] type BatchMap = Map[String, (String, Long)]

  /** Forward order of the status lattice, injective so any two distinct
    * statuses compare decisively: a transition whose timestamp TIES the
    * recorded one (common under coarse scheduler clocks — triggered and
    * completed can share a millisecond) must still advance, and the
    * winner must not depend on shuffle arrival order.
    */
  private[graft] def statusRank(s: String): Int = s match {
    case Status.YetToStart => 0
    case Status.Triggered  => 1
    case Status.Completed  => 2
    case Status.Failed     => 3 // terminal tiebreak: failure outranks
    case _                 => -1 // unknown never beats a known status
  }

  /** Merge new events into per-batch state. A late or redelivered OLDER
    * event (normal under at-least-once sources) cannot regress an already
    * advanced status; at EQUAL timestamps the lattice-forward status wins.
    * The winner per batch_id is the (ts, rank)-lexicographic maximum, so
    * the fold converges to the same state in ANY arrival order — the
    * property kill-and-resume replay parity rests on (a stable sort alone
    * left equal-ts winners to nondeterministic shuffle order). A
    * redelivered identical event ties on both keys and is a no-op.
    */
  private[graft] def merge(prior: BatchMap, evs: Seq[BatchEvent]): BatchMap =
    evs.foldLeft(prior) { (acc, e) =>
      val ts = e.ts.getTime
      acc.get(e.batch_id) match {
        case Some((seenSt, seenTs)) if seenTs > ts ||
          (seenTs == ts && statusRank(seenSt) >= statusRank(e.status)) => acc
        case _ => acc + (e.batch_id -> (e.status, ts))
      }
    }

  /** The rollup lattice over merged per-batch state
    * (`/root/reference/src/services/ingestService.js:15-35`). */
  private[graft] def rollup(id: String, merged: BatchMap): IngestionStatus = {
    val st = merged.values.map(_._1).toSeq
    val overall =
      if (st.isEmpty || st.forall(_ == Status.YetToStart)) Status.YetToStart
      else if (st.forall(_ == Status.Completed)) Status.Completed
      else Status.Triggered
    IngestionStatus(id, merged.size.toLong,
      st.count(_ == Status.Completed).toLong, overall)
  }

  def track(events: Dataset[BatchEvent]): Dataset[IngestionStatus] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.ingestion_id)
      .mapGroupsWithState[BatchMap, IngestionStatus](
        GroupStateTimeout.NoTimeout) {
        (id: String, evs: Iterator[BatchEvent], state: GroupState[BatchMap]) =>
          val merged = merge(state.getOption.getOrElse(Map.empty), evs.toSeq)
          state.update(merged)
          rollup(id, merged)
      }
  }

  /** Production form with BOUNDED state: a key whose newest event is older
    * than `retentionMs` behind the watermark is evicted (state removed, no
    * tombstone emitted). A later event for an evicted key starts FRESH state
    * — it cannot resurrect the evicted rollup, the correct reading for
    * long-dead requests (the alternative, resurrecting a partial lattice,
    * would emit a wrong n_batches forever after).
    *
    * The timeout is event-time based: eviction advances with the data clock
    * (watermark over `ts` with `watermarkDelay` lateness), so replaying old
    * data neither evicts early nor pins state forever — processing-time TTL
    * would do both. Requires update output mode downstream.
    */
  def trackWithEviction(events: Dataset[BatchEvent], watermarkDelay: String,
      retentionMs: Long): Dataset[IngestionStatus] = {
    require(retentionMs > 0, s"retentionMs must be positive, got $retentionMs")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.ingestion_id)
      .flatMapGroupsWithState[BatchMap, IngestionStatus](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (id: String, evs: Iterator[BatchEvent], state: GroupState[BatchMap]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = evs.toSeq
            val merged = merge(state.getOption.getOrElse(Map.empty), batch)
            state.update(merged)
            // retention clock = newest event EVER MERGED for the key (not
            // just this micro-batch, which could be a stale redelivery);
            // clamp above the watermark — Spark rejects timeouts at/behind it
            val newest = merged.values.map(_._2).max
            state.setTimeoutTimestamp(
              math.max(newest + retentionMs, state.getCurrentWatermarkMs() + 1))
            Iterator.single(rollup(id, merged))
          }
      }
  }
}
