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

  private[streaming] type BatchMap = Map[String, (String, Long)]

  /** Merge new events into per-batch state. A late or redelivered OLDER
    * event (normal under at-least-once sources) cannot regress an already
    * advanced status — only strictly newer events win.
    */
  private[streaming] def merge(prior: BatchMap, evs: Seq[BatchEvent]): BatchMap =
    evs.sortBy(_.ts.getTime).foldLeft(prior) { (acc, e) =>
      acc.get(e.batch_id) match {
        case Some((_, seenTs)) if seenTs >= e.ts.getTime => acc
        case _ => acc + (e.batch_id -> (e.status, e.ts.getTime))
      }
    }

  /** The rollup lattice over merged per-batch state
    * (`/root/reference/src/services/ingestService.js:15-35`). */
  private[streaming] def rollup(id: String, merged: BatchMap): IngestionStatus = {
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
