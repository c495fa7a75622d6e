package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM (codegen compiler, parquet readers, shuffle machinery)
    // so the first measured query isn't charged for one-time session cost
    spark.range(1000000).selectExpr("id % 7 AS k").groupBy("k").count()
      .write.mode("overwrite").format("noop").save()
    Tables.documents(spark, sfDir).limit(100).write.mode("overwrite").format("noop").save()
    // (name -> (seconds, error)); a failed query must NEVER pass for a
    // fast one — its error is logged and reported in the JSON line.
    val results: Map[String, (Double, Option[String])] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // noop sink materializes every result column (count() would let
        // Spark prune final projections and under-measure them)
        val err = try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          None
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            Some(e.getClass.getSimpleName)
        }
        name -> (((System.nanoTime() - t0) / 1e9, err))
      }
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    // queries stays strictly {"name": seconds} for the driver; failures
    // are reported in a parallel "query_errors" object
    val qs = results.map { case (k, (sec, _)) => s""""${esc(k)}":$sec""" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, (_, Some(e))) => s""""${esc(k)}":"${esc(e)}"""" }
      .mkString("{", ",", "}")
    val total = results.values.map(_._1).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"query_errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
