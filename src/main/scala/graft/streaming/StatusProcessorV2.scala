package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.model.Status

/** The status state machine on Spark 4's `transformWithState` API — the
  * modern successor to mapGroupsWithState (typed per-key state handles,
  * native TTL, RocksDB-backed). Same rollup lattice as
  * [[StatusStateMachine]] with the same late-event protection: per-batch
  * state is (status, eventTimeMs) and only strictly newer events win.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`), which is also the right store at
  * 100 TB: state lives off-heap and spills to disk per partition.
  */
class StatusProcessorV2
    extends StatefulProcessor[String, BatchEvent, IngestionStatus] {

  @transient private var batches: ValueState[Map[String, (String, Long)]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    implicit val enc: Encoder[Map[String, (String, Long)]] =
      Encoders.kryo[Map[String, (String, Long)]]
    batches = getHandle.getValueState("batches", enc, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[BatchEvent],
      timerValues: TimerValues): Iterator[IngestionStatus] = {
    val merged = rows.toSeq.sortBy(_.ts.getTime)
      .foldLeft(Option(batches.get()).getOrElse(Map.empty[String, (String, Long)])) {
        (acc, e) =>
          acc.get(e.batch_id) match {
            case Some((_, seenTs)) if seenTs >= e.ts.getTime => acc
            case _ => acc + (e.batch_id -> (e.status, e.ts.getTime))
          }
      }
    batches.update(merged)
    val st = merged.values.map(_._1).toSeq
    val overall =
      if (st.isEmpty || st.forall(_ == Status.YetToStart)) Status.YetToStart
      else if (st.forall(_ == Status.Completed)) Status.Completed
      else Status.Triggered
    Iterator.single(IngestionStatus(key, merged.size.toLong,
      st.count(_ == Status.Completed).toLong, overall))
  }
}

object StatusProcessorV2 {
  /** Wire the processor onto a batch-event stream (update output mode). */
  def track(events: Dataset[BatchEvent]): Dataset[IngestionStatus] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.ingestion_id)
      .transformWithState(new StatusProcessorV2,
        TimeMode.None(), OutputMode.Update())
  }
}
