package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming grep accumulates line frequencies across micro-batches") {
    val ms = MemoryStream[String]
    val q = StreamingOps.grepFreq(ms.toDF(), "value", "spark")
      .writeStream.format("memory").queryName("sg").outputMode("complete").start()
    try {
      ms.addData("spark rules", "no match here", "spark rules")
      q.processAllAvailable()
      val r1 = spark.table("sg").as[(String, Long)].collect().toMap
      assert(r1 === Map("spark rules" -> 2L))
      // second micro-batch updates existing state incrementally
      ms.addData("spark rules", "spark anew")
      q.processAllAvailable()
      val r2 = spark.table("sg").as[(String, Long)].collect().toMap
      assert(r2 === Map("spark rules" -> 3L, "spark anew" -> 1L))
    } finally q.stop()
  }

  test("windowed counts: watermark finalizes windows and drops late rows") {
    val ms = MemoryStream[(Timestamp, String)]
    val events = ms.toDF().toDF("ts", "event_type")
    val q = StreamingOps.windowedEventCounts(events)
      .writeStream.format("memory").queryName("wc").outputMode("append").start()
    try {
      ms.addData(
        (ts("2024-01-01 10:00:10"), "a"),
        (ts("2024-01-01 10:05:00"), "a"),
        (ts("2024-01-01 10:07:00"), "b"))
      q.processAllAvailable()
      // nothing emitted yet: watermark (max 10:07 - 10m) hasn't passed
      // the 10:00-10:15 window end
      assert(spark.table("wc").count() === 0)
      // an event far ahead advances the watermark past the window
      ms.addData((ts("2024-01-01 11:00:00"), "c"))
      q.processAllAvailable()
      val emitted = spark.table("wc")
        .select(col("window_start").cast("string"), col("event_type"), col("n"))
        .as[(String, String, Long)].collect().toSet
      assert(emitted === Set(
        ("2024-01-01 10:00:00", "a", 2L),
        ("2024-01-01 10:00:00", "b", 1L)))
      // a row behind the watermark is dropped, not resurrected
      ms.addData((ts("2024-01-01 10:01:00"), "a"))
      q.processAllAvailable()
      assert(spark.table("wc").count() === emitted.size)
    } finally q.stop()
  }

  test("file source → file sink with checkpoint: restart is exactly-once") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("graft-stream")
    val in = Files.createDirectories(root.resolve("in"))
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    def addFile(name: String, lines: Seq[String]): Unit =
      Files.write(in.resolve(name), lines.asJava)
    // stateless grep filter: file sink supports append, and the sink's
    // metadata log + source checkpoint give exactly-once across restarts
    def start() = StreamingOps.textDirStream(spark, in.toString)
      .filter(col("value").contains("spark"))
      .writeStream.format("text")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()

    addFile("a.txt", Seq("spark one", "noise", "spark two"))
    val q1 = start()
    q1.processAllAvailable(); q1.stop() // "kill" after the first batch
    // data lands while the query is DOWN; restart must pick it up from
    // the checkpoint without reprocessing file a
    addFile("b.txt", Seq("spark three", "more noise"))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    // a third restart with nothing new must emit nothing (no dupes)
    val q3 = start()
    q3.processAllAvailable(); q3.stop()
    val got = spark.read.text(out).as[String].collect().sorted.toSeq
    assert(got === Seq("spark one", "spark three", "spark two"),
      "exactly the matching lines, each exactly once, across restarts")
  }

  test("same transform runs in batch mode over the events table") {
    val batch = StreamingOps.windowedEventCounts(
      Tables.events(spark, TestSpark.sf0001), windowLen = "1 day")
    val viaDaily = graft.operators.Relational.eventsDaily(spark, TestSpark.sf0001)
    // per-day totals agree between the windowed transform and the batch
    // daily aggregate (windows are UTC-aligned days)
    val w = batch.groupBy(to_date(col("window_start")).as("day"))
      .agg(sum("n").as("n")).as[(String, Long)].collect().toMap
    val d = viaDaily.groupBy(col("day")).agg(sum("n_events").as("n"))
      .as[(String, Long)].collect().toMap
    assert(w === d)
  }
}
