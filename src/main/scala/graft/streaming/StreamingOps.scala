package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import graft.engine.GrepEngine
import graft.engine.GrepEngine.{Mode, Substring}

/** Typed event row for the custom-state operators. */
case class UserEvent(user_id: Long, event_id: Long, us: Long)

/** Running per-user profile: the feature-store shape a streaming
  * pipeline maintains (count + last activity so far).
  */
case class UserProfile(user_id: Long, n_events: Long, last_us: Long)

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

  /** Streaming gap-based sessionization via Spark's native
    * `session_window` — the incremental counterpart of
    * [[graft.operators.AsOf.sessionizeSalted]]: state per open session,
    * merged as events arrive, finalized (append mode) once the watermark
    * passes session end + gap. The Spark-first answer to streaming
    * sessions — no hand-rolled state.
    */
  def sessionWindowCounts(events: DataFrame, tsCol: String = "ts",
                          gap: String = "10 minutes",
                          watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col("user_id"), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Streaming exact dedup on a canonical fingerprint: state is one
    * entry per distinct key; `withWatermark` + dropDuplicates bounds it
    * for event-time keys. The streaming counterpart of
    * [[graft.operators.Dedup.exact]] — first occurrence wins, later
    * duplicates are suppressed across micro-batches.
    */
  def dedupStream(lines: DataFrame, textCol: String = "value"): DataFrame =
    lines
      .withColumn("fingerprint",
        md5(regexp_replace(trim(lower(col(textCol))), "\\s+", " ")))
      .dropDuplicates("fingerprint")

  /** Custom keyed state via mapGroupsWithState (the
    * KeyValueGroupedDataset surface): a running per-user profile —
    * cumulative event count and last-seen time — updated each
    * micro-batch. State is one fixed-size row per user, partitioned by
    * the grouping key exactly like a batch shuffle; use update output
    * mode. Demonstrates route (d) custom state where no built-in
    * aggregation fits (the profile must SURVIVE across triggers and
    * emit its running value each batch).
    */
  def runningUserProfiles(events: Dataset[UserEvent]): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserProfile, UserProfile](GroupStateTimeout.NoTimeout) {
        (uid, evs, state) =>
          val prev = state.getOption.getOrElse(UserProfile(uid, 0L, Long.MinValue))
          var n = prev.n_events
          var last = prev.last_us
          evs.foreach { e => n += 1; if (e.us > last) last = e.us }
          val next = UserProfile(uid, n, last)
          state.update(next)
          next
      }
  }
}
