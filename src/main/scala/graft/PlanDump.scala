package graft

import java.nio.file.{Files, Paths}

/** Per-query formatted-plan dump for the optimization rounds'
  * before/after evidence: writes `.explain("formatted")` of each named
  * query to `<outDir>/<query>_<suffix>.txt` — the judge checks plan
  * claims (Exchange counts, join strategies, pushdown) against these
  * files without running Spark.
  *
  * Usage: `sbt 'runMain graft.PlanDump <outDir> <suffix> <q1,q2,...>'`
  * (sf0.001 like [[Plans]] — plan shape is scale-independent). A
  * checkpointed composition additionally dumps one file per checkpoint
  * segment (`<query>_<stage>_<suffix>.txt`), the [[Plans]] hook.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <suffix> <q1,q2,...>")
    val Array(outDir, suffix, list) = args
    val names = list.split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"no such queries: ${unknown.mkString(", ")}")
    val sfDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val segments = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      operators.Pipeline.stagePlanHook = Some((stage, sdf) =>
        segments += ((stage, sdf.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))))
      val df = try SparkEntry.queries(name)(spark, sfDir)
        finally operators.Pipeline.stagePlanHook = None
      segments.foreach { case (stage, p) =>
        Files.writeString(Paths.get(outDir, s"${name}_${stage}_$suffix.txt"), p)
      }
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      spark.catalog.clearCache()
    }
    println(s"[plandump] wrote ${names.length} plans to $outDir (suffix $suffix)")
    spark.stop()
  }
}
