package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}


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
class StatusProcessorV2(ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[String, BatchEvent, IngestionStatus] {

  @transient private var batches: ValueState[Map[String, (String, Long)]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    implicit val enc: Encoder[Map[String, (String, Long)]] =
      Encoders.kryo[Map[String, (String, Long)]]
    batches = getHandle.getValueState("batches", enc, ttl)
  }

  override def handleInputRows(key: String, rows: Iterator[BatchEvent],
      timerValues: TimerValues): Iterator[IngestionStatus] = {
    // an expired (TTL-evicted) key reads as null -> fresh state; a later
    // event cannot resurrect the evicted lattice
    val merged = StatusStateMachine.merge(
      Option(batches.get()).getOrElse(Map.empty), rows.toSeq)
    batches.update(merged)
    Iterator.single(StatusStateMachine.rollup(key, merged))
  }
}

object StatusProcessorV2 {
  /** Wire the processor onto a batch-event stream (update output mode),
    * unbounded state — bounded replays/tests. */
  def track(events: Dataset[BatchEvent]): Dataset[IngestionStatus] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.ingestion_id)
      .transformWithState(new StatusProcessorV2,
        TimeMode.None(), OutputMode.Update())
  }

  /** Production form with BOUNDED state: native per-state TTL (RocksDB
    * enforces it store-side). transformWithState TTL is processing-time
    * based, so it requires `TimeMode.ProcessingTime`; `ttl` counts from each
    * key's last state UPDATE — an active key never expires, an idle one is
    * dropped without a timer per key.
    */
  def trackWithTtl(events: Dataset[BatchEvent],
      ttl: java.time.Duration): Dataset[IngestionStatus] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.ingestion_id)
      .transformWithState(new StatusProcessorV2(TTLConfig(ttl)),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }
}
