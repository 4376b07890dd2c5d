package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

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
  * coordination), which is exactly what a 100 TB status table needs. Use
  * update output mode; add a watermark + `GroupStateTimeout` for eviction in
  * unbounded production streams.
  */
object StatusStateMachine {

  def track(events: Dataset[BatchEvent]): Dataset[IngestionStatus] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.ingestion_id)
      // state keeps (status, eventTimeMs) per batch so a LATE or redelivered
      // older event (normal under at-least-once sources) cannot regress an
      // already-advanced status — only strictly newer events win.
      .mapGroupsWithState[Map[String, (String, Long)], IngestionStatus](
        GroupStateTimeout.NoTimeout) {
        (id: String, evs: Iterator[BatchEvent],
            state: GroupState[Map[String, (String, Long)]]) =>
          val merged = evs.toSeq.sortBy(_.ts.getTime)
            .foldLeft(state.getOption.getOrElse(Map.empty[String, (String, Long)])) {
              (acc, e) =>
                acc.get(e.batch_id) match {
                  case Some((_, seenTs)) if seenTs >= e.ts.getTime => acc
                  case _ => acc + (e.batch_id -> (e.status, e.ts.getTime))
                }
            }
          state.update(merged)
          val st = merged.values.map(_._1).toSeq
          val overall =
            if (st.isEmpty || st.forall(_ == Status.YetToStart)) Status.YetToStart
            else if (st.forall(_ == Status.Completed)) Status.Completed
            else Status.Triggered
          IngestionStatus(id, merged.size.toLong,
            st.count(_ == Status.Completed).toLong, overall)
      }
  }
}
