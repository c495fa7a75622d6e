package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Session-local job profiler for optimization triage: runs ONE named
  * query to the noop sink with a listener that prints every Spark job's
  * wall time and first call site — the "where do the seconds go" view
  * the disabled UI would otherwise provide. Not part of any harness.
  *
  * Usage: `sbt 'runMain graft.ProfileJobs <query> [reps]'` (sf from
  * SPARK_GRAFT_SF_DIR, cores from SPARK_GRAFT_CPUS like Bench).
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileJobs <query> [reps]")
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val fn = SparkEntry.queries(name)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    var log = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (log && s != null)
          println(f"[job] ${je.jobId}%4d ${(System.nanoTime() - s._1) / 1e9}%7.3f s  ${s._2}")
      }
    })
    (0 until reps).foreach { r =>
      spark.catalog.clearCache(); System.gc()
      log = r == reps - 1 // print only the last (warm) rep
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[rep $r] total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
