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

  // ---- real image decode (r19): golden-pixel specs per format ----

  private type Stats = (String, Int, Int, Int, Seq[Int], Seq[Int], Seq[Int])

  private def decodeOne(payload: Array[Byte]): Option[Stats] = {
    val rows = Seq(Tuple1(payload)).toDF("payload")
      .select(graft.functions.ImageDecode.imageStats(col("payload")).as("s"))
      .filter(col("s").isNotNull)
      .select("s.format", "s.width", "s.height", "s.channels",
        "s.ch_min", "s.ch_max", "s.ch_mean")
      .as[Stats].collect()
    rows.headOption
  }

  // 2x2 RGB golden pixels shared by the P6 / BMP / PNG tests:
  // (10,20,30) (40,50,60) / (70,80,90) (250,0,128)
  private val goldenPix = Seq(
    Seq(10, 20, 30), Seq(40, 50, 60), Seq(70, 80, 90), Seq(250, 0, 128))
  private val goldenStats =
    ("?", 2, 2, 3, Seq(10, 0, 30), Seq(250, 80, 128), Seq(92, 37, 77))

  test("P6 decode: golden pixels, header comments, trailing bytes tolerated") {
    val header = "P6\n# a comment\n 2\t2 #inline\n255\n".getBytes("US-ASCII")
    val raster = goldenPix.flatten.map(_.toByte).toArray
    val junk = "trailing".getBytes("US-ASCII")
    val got = decodeOne(header ++ raster ++ junk)
    assert(got === Some(goldenStats.copy(_1 = "ppm")))
  }

  test("P5 decode: grayscale golden pixels") {
    val p = "P5\n3 1\n255\n".getBytes("US-ASCII") ++
      Array(0, 128, 255).map(_.toByte)
    assert(decodeOne(p) ===
      Some(("pgm", 3, 1, 1, Seq(0), Seq(255), Seq(127))))
  }

  test("BMP decode: 24-bit bottom-up with row padding, BGR reordered to RGB") {
    // hand-assembled BITMAPINFOHEADER file: 2x2, rowSize 8 (2 pad bytes)
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit =
      (0 to 3).foreach(i => out.write((v >> (8 * i)) & 0xFF))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write('B'); out.write('M'); le32(54 + 16) // file size
    le32(0); le32(54)                             // reserved, data offset
    le32(40); le32(2); le32(2)                    // header size, w, h (bottom-up)
    le16(1); le16(24); le32(0); le32(16)          // planes, bpp, compression, image size
    le32(2835); le32(2835); le32(0); le32(0)      // ppm resolution, palette counts
    // pixel rows bottom-up, BGR, 2 pad bytes each: row1 = golden row 2
    Seq(Seq(2, 3), Seq(0, 1)).foreach { rowIdx =>
      rowIdx.foreach { i =>
        val Seq(r, g, b) = goldenPix(i); out.write(b); out.write(g); out.write(r)
      }
      out.write(0); out.write(0)
    }
    assert(decodeOne(out.toByteArray) === Some(goldenStats.copy(_1 = "bmp")))
  }

  test("PNG decode: a genuine ImageIO round-trip recovers the golden pixels") {
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    Seq((0, 0, 0), (1, 0, 1), (0, 1, 2), (1, 1, 3)).foreach { case (x, y, i) =>
      val Seq(r, g, b) = goldenPix(i)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", buf))
    assert(decodeOne(buf.toByteArray) === Some(goldenStats.copy(_1 = "png")))
  }

  test("undecodable payloads are NULL, not errors") {
    assert(decodeOne("not an image at all".getBytes("US-ASCII")) === None)
    // truncated P6: header promises 192 raster bytes, delivers 3
    assert(decodeOne("P6\n8 8\n255\nabc".getBytes("US-ASCII")) === None)
    // 16-bit netpbm (maxval > 255) is out of the supported subset
    assert(decodeOne(("P5\n1 1\n65535\n  ").getBytes("US-ASCII")) === None)
    // PNG magic with a corrupt body must not throw
    val corrupt = Array(0x89, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2, 3, 4)
      .map(_.toByte)
    assert(decodeOne(corrupt) === None)
  }

  /** Minimal 54-byte BMP header with attacker-controlled w/h fields. */
  private def bmpHeader(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = (0 to 3).foreach(i => out.write((v >> (8 * i)) & 0xFF))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write('B'); out.write('M'); le32(54); le32(0); le32(54)
    le32(40); le32(w); le32(h)
    le16(1); le16(24); le32(0); le32(0)
    le32(2835); le32(2835); le32(0); le32(0)
    out.toByteArray
  }

  test("crafted BMP headers refuse as NULL instead of reading out of bounds") {
    // width > ~715M overflows w*3 in Int: a negative rowSize would slip
    // past the bounds check and the scan would throw (ADVICE r19)
    assert(decodeOne(bmpHeader(0x30000000, 2)) === None)
    // math.abs(Int.MinValue) stays negative: a zero-pixel bogus row
    // must not be emitted
    assert(decodeOne(bmpHeader(2, 0x80000000)) === None)
    assert(decodeOne(bmpHeader(2, Int.MaxValue)) === None) // plain overrun
  }

  test("crafted AVI avih width refuses as NULL instead of reading out of bounds") {
    val good = graft.functions.VideoDecode.wrap(
      "bytes".getBytes("US-ASCII"), 8, 8, 1, 40000)
    // patch the avih width field (RIFF 12 + LIST hdr 8 + 'hdrl' 4 +
    // 'avih'+size 8 + 32 into the body = offset 64) to an Int-overflow
    // width; the DIB frame bounds check must refuse in Long
    val w = 0x30000000
    (0 to 3).foreach(j => good(64 + j) = ((w >> (8 * j)) & 0xFF).toByte)
    val rows = Seq(Tuple1(good)).toDF("payload")
      .select(graft.functions.VideoDecode.videoStats(col("payload")).as("s"))
      .filter(col("s").isNotNull).collect()
    assert(rows.isEmpty)
  }

  test("q_mm_decode equals an independent re-derivation from the raw text") {
    // driver spelling scalarizes the channel arrays to CSV (r20)
    val got = Multimodal.imageDecodeStats(spark, sf)
      .select(col("asset_id"), col("format"), col("width"), col("height"),
        col("channels"), col("ch_min"), col("ch_max"), col("ch_mean"))
      .as[(Long, String, Int, Int, Int, String, String, String)]
      .collect().toSeq.sortBy(_._1)
      .map(t => (t._1, t._2, t._3, t._4, t._5,
        t._6.split(",").toSeq.map(_.toInt),
        t._7.split(",").toSeq.map(_.toInt),
        t._8.split(",").toSeq.map(_.toInt)))
    assert(got.nonEmpty)
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    got.foreach { case (id, fmt, w, h, c, mins, maxs, means) =>
      val text = texts(id)
      assert(text.forall(_ < 128), s"fixture doc $id not ASCII; spec assumes 1 byte/char")
      val padded =
        if (text.length >= 192) text.substring(0, 192)
        else text + ("x" * (192 - text.length))
      val n = if (id % 2 == 0) 192 else 64
      val bytes = padded.getBytes("UTF-8").take(n).map(_ & 0xFF)
      val cc = if (id % 2 == 0) 3 else 1
      assert((fmt, w, h, c) === (if (id % 2 == 0) "ppm" else "pgm", 8, 8, cc))
      (0 until cc).foreach { ch =>
        val samples = bytes.indices.collect { case i if i % cc == ch => bytes(i) }
        assert(mins(ch) === samples.min, s"doc $id ch $ch min")
        assert(maxs(ch) === samples.max, s"doc $id ch $ch max")
        assert(means(ch) === samples.map(_.toLong).sum / samples.size, s"doc $id ch $ch mean")
      }
    }
  }

  // ---- real WAV audio decode (r19): golden-sample specs ----

  private type AStats = (String, Int, Int, Int, Long, Seq[Int], Seq[Int], Seq[Int])

  private def isqrtRef(x: Long): Int =
    BigInt(x).bigInteger.sqrt().intValue()

  private def decodeAudio(payload: Array[Byte]): Option[AStats] = {
    val rows = Seq(Tuple1(payload)).toDF("payload")
      .select(graft.functions.AudioDecode.audioStats(col("payload")).as("s"))
      .filter(col("s").isNotNull)
      .select("s.format", "s.sample_rate", "s.channels", "s.n_frames",
        "s.duration_ms", "s.ch_min", "s.ch_max", "s.ch_rms")
      .as[AStats].collect()
    rows.headOption
  }

  /** Hand-assembled PCM-16 WAV with an unknown chunk before fmt/data
    * (the RIFF walk must skip it) — stereo, interleaved `frames`.
    */
  private def goldenWav16(rate: Int, frames: Seq[(Int, Int)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def tag(t: String): Unit = t.foreach(c => out.write(c.toInt))
    def le32(v: Int): Unit = (0 to 3).foreach(j => out.write((v >> (8 * j)) & 0xFF))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    val dataBytes = frames.size * 4
    tag("RIFF"); le32(4 + 8 + 5 + 1 + 8 + 16 + 8 + dataBytes); tag("WAVE")
    tag("LIST"); le32(5); (1 to 5).foreach(out.write) // odd size: pad byte follows
    out.write(0)
    tag("fmt "); le32(16); le16(1); le16(2); le32(rate); le32(rate * 4)
    le16(4); le16(16)
    tag("data"); le32(dataBytes)
    frames.foreach { case (l, r) => le16(l & 0xFFFF); le16(r & 0xFFFF) }
    out.toByteArray
  }

  test("WAV decode: PCM-16 stereo golden samples, unknown chunk skipped") {
    val frames = Seq((0, 5), (1000, -5), (-32768, 32767))
    val got = decodeAudio(goldenWav16(16000, frames))
    def expect(ch: Seq[Int]): (Int, Int, Int) = {
      val sq = ch.map(s => s.toLong * s).sum / ch.size
      (ch.min, ch.max, isqrtRef(sq))
    }
    val (l, r) = (frames.map(_._1), frames.map(_._2))
    val (lmin, lmax, lrms) = expect(l)
    val (rmin, rmax, rrms) = expect(r)
    assert(got === Some(("wav", 16000, 2, 3, 3L * 1000 / 16000,
      Seq(lmin, rmin), Seq(lmax, rmax), Seq(lrms, rrms))))
  }

  test("WAV decode: PCM-8 wrap -> decode round-trip equals the byte re-derivation") {
    val payload = "hello wav  ÿ bytes".getBytes("ISO-8859-1")
    val wav = Seq(Tuple1(payload)).toDF("p")
      .select(graft.functions.AudioDecode.wrapPcm8Wav(col("p"), 8000).as("w"))
      .as[Array[Byte]].head()
    val samples = payload.map(b => (b & 0xFF) - 128)
    val sq = samples.map(s => s.toLong * s).sum / samples.length
    assert(decodeAudio(wav) === Some(("wav", 8000, 1, samples.length,
      samples.length.toLong * 1000 / 8000,
      Seq(samples.min), Seq(samples.max), Seq(isqrtRef(sq)))))
  }

  test("WAV refusals: float format, truncated data, garbage are NULL") {
    assert(decodeAudio("RIFFxxxxWAVEnot a real chunk walk".getBytes("US-ASCII")) === None)
    // audioFormat = 3 (IEEE float) is outside the PCM subset; the fmt
    // body starts at 34 here (12 RIFF + 8+5+1 padded LIST + 8 fmt hdr)
    val f32 = goldenWav16(8000, Seq((1, 2)))
    assert(f32(34) === 1.toByte, "fixture layout drifted: fmt body not at 34")
    f32(34) = 3 // patch audioFormat
    assert(decodeAudio(f32) === None)
    // data chunk promising more bytes than the file holds
    val trunc = goldenWav16(8000, Seq((1, 2), (3, 4)))
    assert(decodeAudio(trunc.dropRight(6)) === None)
  }

  test("q_mm_audio equals an independent re-derivation from the raw text") {
    // driver spelling scalarizes the channel arrays to CSV (r20)
    val got = Multimodal.audioStatsDocs(spark, sf)
      .select(col("asset_id"), col("decodable"), col("sample_rate"),
        col("channels"), col("n_frames"), col("ch_min"), col("ch_max"), col("ch_rms"))
      .as[(Long, Boolean, Int, Int, Int, String, String, String)]
      .collect().toSeq
      .map(t => (t._1, t._2, t._3, t._4, t._5,
        t._6.split(",").toSeq.map(_.toInt),
        t._7.split(",").toSeq.map(_.toInt),
        t._8.split(",").toSeq.map(_.toInt)))
    assert(got.nonEmpty && got.forall(_._2), "every in-flight WAV must decode")
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    got.foreach { case (id, _, rate, ch, n, mins, maxs, rms) =>
      val bytes = texts(id).getBytes("UTF-8")
      val samples = bytes.map(b => (b & 0xFF) - 128)
      assert((rate, ch, n) === (8000, 1, samples.length), s"doc $id header")
      val sq = samples.map(s => s.toLong * s).sum / samples.length
      assert((mins.head, maxs.head, rms.head) ===
        ((samples.min, samples.max, isqrtRef(sq))), s"doc $id stats")
    }
  }

  // ---- real AVI video decode (r19): container + frame specs ----

  private type VStats = (String, Int, Int, Int, Long, Seq[Int], Seq[Int], Seq[Int])

  private def decodeVideo(payload: Array[Byte]): Option[VStats] = {
    val rows = Seq(Tuple1(payload)).toDF("payload")
      .select(graft.functions.VideoDecode.videoStats(col("payload")).as("s"))
      .filter(col("s").isNotNull)
      .select("s.format", "s.width", "s.height", "s.n_frames",
        "s.duration_ms", "s.ch_min", "s.ch_max", "s.ch_mean")
      .as[VStats].collect()
    rows.headOption
  }

  /** Independent expected stats for a DIB AVI built by wrap(): payload
    * repeats cyclically over nFrames w×h BGR rasters.
    */
  private def dibExpect(payload: Array[Byte], w: Int, h: Int,
                        nFrames: Int): (Seq[Int], Seq[Int], Seq[Int]) = {
    val total = nFrames * w * h * 3
    val bytes = (0 until total).map(k => payload(k % payload.length) & 0xFF)
    // byte k is channel B,G,R for k % 3 = 0,1,2; stats report R,G,B
    def ch(rgb: Int): Seq[Int] = {
      val disk = 2 - rgb // R reads byte offset 2, G 1, B 0
      bytes.zipWithIndex.collect { case (v, k) if k % 3 == disk => v }
    }
    val (r, g, b) = (ch(0), ch(1), ch(2))
    (Seq(r.min, g.min, b.min), Seq(r.max, g.max, b.max),
      Seq(r, g, b).map(s => (s.map(_.toLong).sum / s.size).toInt))
  }

  test("AVI-DIB decode: wrap -> decode round-trip equals the byte re-derivation") {
    val payload = "a moving picture of bytes".getBytes("US-ASCII")
    val avi = Seq(Tuple1(payload)).toDF("p")
      .select(graft.functions.VideoDecode.wrapDibAvi(col("p"), 8, 8, 4, 40000).as("w"))
      .as[Array[Byte]].head()
    val (mins, maxs, means) = dibExpect(payload, 8, 8, 4)
    assert(decodeVideo(avi) ===
      Some(("avi-dib", 8, 8, 4, 160L, mins, maxs, means)))
  }

  test("AVI-MJPEG decode: JPEG frames through the real ImageIO path") {
    // two 4x4 near-uniform frames, JPEG-encoded; expected stats decode
    // the same JPEG bytes spec-side so container walk + aggregation are
    // what is under test (pixel decode is ImageIO's on both sides)
    def jpegFrame(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      (0 until 4).foreach(x => (0 until 4).foreach(y => img.setRGB(x, y, rgb)))
      val buf = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", buf))
      buf.toByteArray
    }
    val frames = Seq(jpegFrame(0x406080), jpegFrame(0xC02010))
    val out = new java.io.ByteArrayOutputStream()
    def tag(t: String): Unit = t.foreach(c => out.write(c.toInt))
    def le32(v: Int): Unit = (0 to 3).foreach(j => out.write((v >> (8 * j)) & 0xFF))
    val moviBody = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    tag("RIFF"); le32(4 + 8 + 56 + 8 + moviBody); tag("AVI ")
    tag("avih"); le32(56)
    le32(40000); le32(0); le32(0); le32(0); le32(2); le32(0); le32(1); le32(0)
    le32(4); le32(4); (0 until 4).foreach(_ => le32(0))
    tag("LIST"); le32(moviBody); tag("movi")
    frames.foreach { f =>
      tag("00dc"); le32(f.length); out.write(f)
      if (f.length % 2 == 1) out.write(0)
    }
    val got = decodeVideo(out.toByteArray)
    // spec-side reference: ImageIO-decode the same frames, same stats
    val pix = frames.flatMap { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      for (y <- 0 until 4; x <- 0 until 4) yield img.getRGB(x, y)
    }
    def ch(sh: Int): Seq[Int] = pix.map(p => (p >> sh) & 0xFF)
    val chans = Seq(ch(16), ch(8), ch(0))
    assert(got === Some(("avi-mjpeg", 4, 4, 2, 80L,
      chans.map(_.min), chans.map(_.max),
      chans.map(s => (s.map(_.toLong).sum / s.size).toInt))))
  }

  test("AVI refusals: garbage, truncated frame, frame before header, wrong dims") {
    assert(decodeVideo("RIFF????AVI not a chunk walk at all".getBytes("US-ASCII")) === None)
    val payload = "bytes".getBytes("US-ASCII")
    val good = graft.functions.VideoDecode.wrap(payload, 8, 8, 2, 40000)
    // truncate inside the last frame: the declared chunk size overruns
    assert(decodeVideo(good.dropRight(10)) === None)
    // a 00db frame with no avih header seen yet
    val noHdr = new java.io.ByteArrayOutputStream()
    def tag(t: String): Unit = t.foreach(c => noHdr.write(c.toInt))
    def le32(v: Int): Unit = (0 to 3).foreach(j => noHdr.write((v >> (8 * j)) & 0xFF))
    tag("RIFF"); le32(4 + 8 + 4); tag("AVI "); tag("00db"); le32(4); le32(0)
    assert(decodeVideo(noHdr.toByteArray) === None)
  }

  test("q_mm_video equals an independent re-derivation from the raw text") {
    // driver spelling scalarizes the channel arrays to CSV (r20)
    val got = Multimodal.videoStatsDocs(spark, sf)
      .select(col("asset_id"), col("decodable"), col("format"), col("width"),
        col("height"), col("n_frames"), col("duration_ms"),
        col("ch_min"), col("ch_max"), col("ch_mean"))
      .as[(Long, Boolean, String, Int, Int, Int, Long, String, String, String)]
      .collect().toSeq
      .map(t => (t._1, t._2, t._3, t._4, t._5, t._6, t._7,
        t._8.split(",").toSeq.map(_.toInt),
        t._9.split(",").toSeq.map(_.toInt),
        t._10.split(",").toSeq.map(_.toInt)))
    assert(got.nonEmpty && got.forall(_._2), "every in-flight AVI must decode")
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    got.foreach { case (id, _, fmt, w, h, n, ms, mins, maxs, means) =>
      assert((fmt, w, h, n, ms) === (("avi-dib", 8, 8, 4, 160L)), s"doc $id header")
      val (emins, emaxs, emeans) = dibExpect(texts(id).getBytes("UTF-8"), 8, 8, 4)
      assert((mins, maxs, means) === ((emins, emaxs, emeans)), s"doc $id stats")
    }
  }

  // ---- r20 real transforms: resize / per-frame / windowed RMS ----

  private def resizeOne(payload: Array[Byte], factor: Int): Option[Array[Byte]] = {
    val rows = Seq(Tuple1(payload)).toDF("payload")
      .select(graft.functions.ImageDecode.resizePnm(col("payload"), factor).as("r"))
      .filter(col("r").isNotNull).as[Array[Byte]].collect()
    rows.headOption
  }

  test("PNM resize: golden 4x2 P6 box means, output re-decodes, refusals NULL") {
    // 4x2 P6, factor 2 -> 2x1; block means are exact integer floors
    val raster = Array(
      10, 0, 0, 20, 0, 0, 100, 5, 1, 103, 5, 2, // row 0
      30, 0, 0, 43, 0, 0, 101, 5, 3, 102, 5, 6 // row 1
    ).map(_.toByte)
    val p = "P6\n4 2\n255\n".getBytes("US-ASCII") ++ raster
    val out = resizeOne(p, 2).get
    // (10+20+30+43)/4 = 25; (100+103+101+102)/4 = 101; (1+2+3+6)/4 = 3
    assert(new String(out.take(11), "US-ASCII") === "P6\n2 1\n255\n")
    assert(out.drop(11).map(_ & 0xFF).toSeq === Seq(25, 0, 0, 101, 5, 3))
    // the re-encoded payload is itself decodable by the real decoder
    assert(decodeOne(out) ===
      Some(("ppm", 2, 1, 3, Seq(25, 0, 0), Seq(101, 5, 3), Seq(63, 2, 1))))
    // grayscale path
    val g = "P5\n2 2\n255\n".getBytes("US-ASCII") ++
      Array(1, 2, 3, 6).map(_.toByte)
    assert(resizeOne(g, 2).map(_.toSeq) ===
      Some(("P5\n1 1\n255\n".getBytes("US-ASCII") :+ 3.toByte).toSeq))
    // refusals: non-PNM, factor exceeding dims, truncated raster
    assert(resizeOne("BMnot a pnm image".getBytes("US-ASCII"), 2) === None)
    assert(resizeOne(g, 4) === None) // 2x2 / 4 -> zero output
    assert(resizeOne("P6\n8 8\n255\nabc".getBytes("US-ASCII"), 2) === None)
  }

  test("q_mm_resize equals an independent box-mean re-derivation from the raw text") {
    val got = Multimodal.imageResizeStats(spark, sf)
      .select(col("asset_id"), col("decodable"), col("format"), col("width"),
        col("height"), col("channels"), col("ch_min"), col("ch_max"), col("ch_mean"))
      .as[(Long, Boolean, String, Int, Int, Int, String, String, String)]
      .collect().toSeq
    assert(got.nonEmpty && got.forall(_._2), "every resized view must re-decode")
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    got.foreach { case (id, _, fmt, w, h, c, minsCsv, maxsCsv, meansCsv) =>
      val cc = if (id % 2 == 0) 3 else 1
      assert((fmt, w, h, c) === (if (id % 2 == 0) "ppm" else "pgm", 4, 4, cc))
      val text = texts(id)
      val padded =
        if (text.length >= 192) text.substring(0, 192)
        else text + ("x" * (192 - text.length))
      val bytes = padded.getBytes("UTF-8").map(_ & 0xFF)
      def in(x: Int, y: Int, ch: Int): Int =
        if (cc == 3) bytes((y * 8 + x) * 3 + ch) else bytes(y * 8 + x)
      (0 until cc).foreach { ch =>
        val outPix = for (oy <- 0 until 4; ox <- 0 until 4) yield
          (in(2 * ox, 2 * oy, ch) + in(2 * ox + 1, 2 * oy, ch) +
            in(2 * ox, 2 * oy + 1, ch) + in(2 * ox + 1, 2 * oy + 1, ch)) / 4
        val (mins, maxs, means) = (minsCsv.split(",").map(_.toInt),
          maxsCsv.split(",").map(_.toInt), meansCsv.split(",").map(_.toInt))
        assert(mins(ch) === outPix.min, s"doc $id ch $ch min")
        assert(maxs(ch) === outPix.max, s"doc $id ch $ch max")
        assert(means(ch) === outPix.map(_.toLong).sum / 16, s"doc $id ch $ch mean")
      }
    }
  }

  test("per-frame video stats: each frame's stats stand alone (golden wrap)") {
    // 2 frames of 2x1: payload cycles, so frame bytes differ per frame
    val payload = Array(10, 20, 30, 40, 50, 60, 70).map(_.toByte)
    val avi = graft.functions.VideoDecode.wrap(payload, 2, 1, 2, 40000)
    val rows = Seq(Tuple1(avi)).toDF("p")
      .select(posexplode(graft.functions.VideoDecode.videoFrameStats(col("p")))
        .as(Seq("i", "f")))
      .select(col("f.frame_no"), col("f.ch_min"), col("f.ch_max"), col("f.ch_mean"))
      .as[(Int, Seq[Int], Seq[Int], Seq[Int])].collect().toSeq.sortBy(_._1)
    // rowSize pads 2*3=6 to 8: frame bytes = [b g r b g r pad pad],
    // src runs over payload cyclically INCLUDING the pad writes? no —
    // wrap writes pads as zero without consuming payload; frame 0 data
    // = 10,20,30,40,50,60; frame 1 = 70,10,20,30,40,50
    assert(rows === Seq(
      (0, Seq(30, 20, 10).zip(Seq(60, 50, 40)).map(_._1),
        Seq(60, 50, 40), Seq((30 + 60) / 2, (20 + 50) / 2, (10 + 40) / 2)),
      (1, Seq(20, 10, 70).zip(Seq(50, 40, 30)).map(x => math.min(x._1, x._2)),
        Seq(20, 10, 70).zip(Seq(50, 40, 30)).map(x => math.max(x._1, x._2)),
        Seq((20 + 50) / 2, (10 + 40) / 2, (70 + 30) / 2))))
  }

  test("q_mm_video_frames equals an independent per-frame re-derivation") {
    val got = Multimodal.videoFrameStatsDocs(spark, sf)
      .select(col("asset_id"), col("frame_no"),
        col("ch_min"), col("ch_max"), col("ch_mean"))
      .as[(Long, Int, String, String, String)].collect().toSeq
    assert(got.nonEmpty)
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got.map(_._1).distinct.size * 4 === got.size, "4 frames per asset")
    got.foreach { case (id, f, minsCsv, maxsCsv, meansCsv) =>
      val bytes = texts(id).getBytes("UTF-8")
      def ch(rgb: Int): Seq[Int] = {
        val disk = 2 - rgb
        (0 until 192).collect { case j if j % 3 == disk =>
          bytes((f * 192 + j) % bytes.length) & 0xFF
        }
      }
      val chans = (0 until 3).map(ch)
      assert(minsCsv.split(",").map(_.toInt).toSeq === chans.map(_.min), s"doc $id f $f")
      assert(maxsCsv.split(",").map(_.toInt).toSeq === chans.map(_.max), s"doc $id f $f")
      assert(meansCsv.split(",").map(_.toInt).toSeq ===
        chans.map(s => (s.map(_.toLong).sum / 64).toInt), s"doc $id f $f")
    }
  }

  test("windowed audio RMS: golden windows incl. the short final one") {
    // 5 PCM-8 samples, window 2 -> windows of 2,2,1 frames
    val wav = graft.functions.AudioDecode.wrap(
      Array(128 + 3, 128 - 4, 128, 128 + 10, 128 - 5).map(_.toByte), 8000)
    val rows = Seq(Tuple1(wav)).toDF("p")
      .select(posexplode(graft.functions.AudioDecode.audioWindowStats(col("p"), 2))
        .as(Seq("i", "w")))
      .select(col("w.window_no"), col("w.n_frames"), col("w.ch_rms"))
      .as[(Int, Int, Seq[Int])].collect().toSeq.sortBy(_._1)
    def rms(ss: Int*): Int = isqrtRef(ss.map(s => s.toLong * s).sum / ss.size)
    assert(rows === Seq(
      (0, 2, Seq(rms(3, -4))), (1, 2, Seq(rms(0, 10))), (2, 1, Seq(rms(-5)))))
    // refusal: garbage payload explodes to zero rows
    assert(Seq(Tuple1("not a wav".getBytes("US-ASCII"))).toDF("p")
      .select(explode(graft.functions.AudioDecode.audioWindowStats(col("p"), 2)))
      .count() === 0L)
  }

  test("q_mm_audio_windows equals an independent re-derivation from the raw text") {
    val got = Multimodal.audioWindowStatsDocs(spark, sf)
      .select(col("asset_id"), col("window_no"), col("n_frames"), col("ch_rms"))
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(got.nonEmpty)
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    got.groupBy(_._1).foreach { case (id, rows) =>
      val samples = texts(id).getBytes("UTF-8").map(b => (b & 0xFF) - 128)
      assert(rows.size === (samples.length + 63) / 64, s"doc $id window count")
      rows.foreach { case (_, w, n, rmsCsv) =>
        val win = samples.slice(w * 64, math.min(samples.length, w * 64 + 64))
        assert(n === win.length, s"doc $id w $w n_frames")
        assert(rmsCsv.toInt ===
          isqrtRef(win.map(s => s.toLong * s).sum / win.length), s"doc $id w $w rms")
      }
    }
  }

  test("decode expression participates in whole-stage codegen and drops the payload") {
    val df = Multimodal.imageDecodeStats(spark, sf)
    assert(!df.columns.contains("payload"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.toLowerCase.contains("imagestatsexpr") && l.contains("*(")), s"plan:\n$plan")
  }
}
