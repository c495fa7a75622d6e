package graft

import graft.operators.Multimodal
import graft.functions.ByteHistogram
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  val sf = TestSpark.sf0001

  test("asset view carries binary payload and typed metadata struct") {
    val schema = Multimodal.assets(spark, sf).schema
    assert(schema("payload").dataType === BinaryType)
    assert(schema("mime").dataType === StringType)
    val meta = schema("meta").dataType.asInstanceOf[StructType]
    assert(meta("width").dataType === IntegerType)
    assert(meta("duration_ms").dataType === LongType)
  }

  test("byte histogram features equal a driver-side reimplementation") {
    val rows = Multimodal.features(Multimodal.assets(spark, sf))
      .join(Tables.documents(spark, sf), col("asset_id") === col("doc_id"))
      .select(col("text"), col("features")).as[(String, Seq[Float])]
      .limit(20).collect()
    rows.foreach { case (text, got) =>
      val bytes = text.getBytes("UTF-8")
      val want = new Array[Int](16)
      bytes.foreach(b => want((b & 0xFF) / 16) += 1)
      got.zipWithIndex.foreach { case (f, i) =>
        assert(math.abs(f - want(i).toFloat / bytes.length) < 1e-6f)
      }
      assert(math.abs(got.sum - 1.0f) < 1e-4f, "histogram must be L1-normalized")
    }
  }

  test("empty payload yields zero features, not NaN") {
    val out = Seq(Array.empty[Byte]).toDF("payload")
      .select(ByteHistogram.byteHistogram(col("payload"), 16))
      .as[Seq[Float]].head
    assert(out.forall(_ === 0.0f))
  }

  test("histogram expression participates in whole-stage codegen") {
    val plan = Multimodal.features(Multimodal.assets(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("bytehistogramexpr") && l.contains("*(")), s"plan:\n$plan")
  }

  test("metadata-only queries over stored assets prune the binary payload scan") {
    import org.apache.spark.sql.functions._
    // persist the asset table (payload + meta struct) as parquet — the
    // at-rest layout a multimodal corpus has in production
    val path = "target/roundtrip/parquet_assets/sf0001"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
      operators.Multimodal.assets(spark, TestSpark.sf0001)
        .write.mode("overwrite").parquet(path)
    val q = spark.read.parquet(path)
      .groupBy(col("mime"))
      .agg(sum(col("meta.duration_ms")).as("total_ms"))
    q.collect()
    val scanLine = q.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    // nested schema pruning: the scan must read mime + meta.duration_ms
    // and must NOT touch the (dominant-size) binary payload — at 100 TB
    // metadata queries over a media corpus are only viable if the bytes
    // stay unread
    assert(scanLine.contains("duration_ms"), s"pruned nested field missing: $scanLine")
    assert(!scanLine.contains("payload"), s"payload must be pruned: $scanLine")
    assert(!scanLine.contains("width"), s"unused nested fields must be pruned: $scanLine")
  }

  test("feature output drops the payload column (no media bytes downstream)") {
    val cols = Multimodal.features(Multimodal.assets(spark, sf)).columns.toSet
    assert(!cols.contains("payload"))
  }

  test("resize pooling preserves mass and halves dimensionality") {
    val pooled = Multimodal.features(Multimodal.assets(spark, sf))
      .select(Multimodal.resizeFeatures(col("features"), 16, 4).as("p"))
      .as[Seq[Float]].limit(50).collect()
    pooled.foreach { p =>
      assert(p.length === 4)
      assert(math.abs(p.sum - 1.0f) < 1e-4f, "sum-pooling preserves L1 mass")
    }
  }

  test("frame sampling fans out >=1 bounded frame per asset") {
    val frames = Multimodal.sampleFrames(Multimodal.assets(spark, sf), 64, 128)
    val n = Tables.documents(spark, sf).count()
    val perAsset = frames.groupBy("asset_id").count()
    assert(perAsset.count() === n, "every asset yields frames")
    val maxLen = frames.select(max(length(col("frame")))).as[Int].head
    assert(maxLen <= 64)
  }

  test("feature near-dups equal driver-side brute force, no cartesian plan") {
    val df = Multimodal.featureNearDups(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect()
    val hist = texts.map { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      val h = new Array[Float](16)
      bytes.foreach(b => h((b & 0xFF) / 16) += 1)
      id -> h.map(_ / bytes.length.max(1))
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
    }
    val want = (for {
      (a, ha) <- hist; (b, hb) <- hist if a < b && cos(ha, hb) >= 0.999
    } yield (a, b)).toSet
    val got = df.as[(Long, Long)].collect().toSet
    assert(got === want)
  }
}
