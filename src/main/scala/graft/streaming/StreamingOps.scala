package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.GrepEngine
import graft.engine.GrepEngine.{Mode, Substring}

/** Structured Streaming counterparts of the batch operators (SURVEY.md
  * §7.2 M3). The transforms are the SAME declarative plans as the batch
  * versions — on a streaming DataFrame Spark plans them as incremental
  * stateful aggregations instead; nothing is reimplemented. Excluded
  * from the DuckDB oracle set (not SQL-expressible there); driven by
  * memory-source/memory-sink tests in StreamingSpec.
  *
  * Scale notes: state is partitioned by the aggregation key exactly like
  * the batch shuffle; watermarks bound state size for event-time windows
  * (without one, a windowed aggregation's state grows forever at 100 TB/
  * day ingest). Sinks should be idempotent or transactional; file/kafka
  * sinks give exactly-once with checkpointing.
  */
object StreamingOps {

  /** Streaming grep: distinct matching lines with occurrence counts,
    * continuously updated. Identical semantics to the reference's one
    * query, unbounded input. Use outputMode("update"/"complete") — a
    * global aggregate without watermark cannot append.
    */
  def grepFreq(lines: DataFrame, lineCol: String, pattern: String,
               mode: Mode = Substring): DataFrame =
    GrepEngine.grepFreq(lines, lineCol, pattern, mode)

  /** Text-directory streaming source: each new file dropped into `dir`
    * becomes a micro-batch of lines — the streaming upgrade of the
    * reference's whole-file ingestion.
    */
  def textDirStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.text(dir)

  /** Event-time tumbling-window counts per event type with a watermark —
    * the streaming counterpart of [[graft.operators.Relational.eventsDaily]].
    * The watermark lets Spark finalize + emit windows (append mode) and
    * garbage-collect their state once event time passes window end +
    * `watermark`; late rows behind the watermark are dropped.
    */
  def windowedEventCounts(events: DataFrame, tsCol: String = "ts",
                          watermark: String = "10 minutes",
                          windowLen: String = "15 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
}
