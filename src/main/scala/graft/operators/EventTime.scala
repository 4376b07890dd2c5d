package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowing operators — tumbling/sliding/session over an
  * event-time column. These are thin, typed wrappers over Spark's native
  * `window`/`session_window` (already watermark-compatible in streaming);
  * the value added is a fixed output contract (start/end/n/sum) shared by
  * batch queries, the streaming pipeline, and the oracles.
  */
object EventTime {

  /** Tumbling or sliding window aggregation. One shuffle on
    * (window, keys); with slide < duration each event lands in
    * duration/slide windows (generated row-locally before the shuffle).
    */
  def windowedAgg(df: DataFrame, ts: String, duration: String, slide: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(ts), duration, slide).as("w") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("w.start"))
      .withColumn("window_end", col("w.end"))
      .drop("w")

  /** Session windows per key with a fixed inactivity gap: session ends when
    * `gap` passes with no event; session end = last event + gap (Spark
    * semantics: an event at exactly session end opens a NEW session).
    * In batch mode this shuffles once on the keys then sorts within
    * partitions; in streaming it runs on the session-window state store.
    */
  def sessionize(df: DataFrame, ts: String, gap: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(ts), gap).as("w") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("w.start"))
      .withColumn("session_end", col("w.end"))
      .drop("w")
}
