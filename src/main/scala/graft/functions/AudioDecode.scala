package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL audio decode for the no-codec-needed format: RIFF/WAVE PCM
  * (8- and 16-bit), the [[ImageDecode]] contract applied to the audio
  * column — binary payload in, `(format, sample_rate, channels,
  * n_frames, duration_ms, ch_min, ch_max, ch_rms)` out, NULL for
  * anything that is not a parseable PCM WAV. A hand-rolled pure-JVM
  * RIFF chunk walk (unknown chunks skipped, odd-size pad bytes honored,
  * `fmt ` required before `data`), so compressed WAV variants
  * (audioFormat ≠ 1) and truncated data chunks refuse as NULL rather
  * than mis-reporting.
  *
  * Stats are integer-exact: per-channel min/max in signed sample units
  * (8-bit samples are unsigned on disk and re-centered to [-128, 127]
  * before stats, so the two widths report in one convention up to
  * scale) and RMS via exact integer sqrt of `sum(s²) DIV n` —
  * engine-reproducible like the image stats (rows-only only because
  * DuckDB cannot parse WAV; MultimodalSpec pins golden-sample
  * equality). duration_ms = n_frames·1000 DIV sample_rate.
  *
  * 100 TB shape: identical to [[ImageDecode]] — per-row projection,
  * zero shuffle, allocation-free scan of the sample bytes.
  */
object AudioDecode {

  final case class Decoded(sampleRate: Int, channels: Int, nFrames: Int,
                           mins: Array[Int], maxs: Array[Int], rms: Array[Int])

  val statsType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("ch_min", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("ch_max", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("ch_rms", ArrayType(IntegerType, containsNull = false), nullable = false)))

  def audioStats(payload: Column): Column =
    CatalystBridge.column(AudioStatsExpr(CatalystBridge.expression(payload)))

  def computeRow(payload: Array[Byte]): GenericInternalRow = {
    val d = compute(payload)
    if (d == null) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString("wav"), d.sampleRate, d.channels, d.nFrames,
      d.nFrames.toLong * 1000L / d.sampleRate,
      new GenericArrayData(d.mins), new GenericArrayData(d.maxs),
      new GenericArrayData(d.rms)))
  }

  private def le32(p: Array[Byte], o: Int): Int =
    (p(o) & 0xFF) | (p(o + 1) & 0xFF) << 8 |
      (p(o + 2) & 0xFF) << 16 | (p(o + 3) & 0xFF) << 24
  private def le16(p: Array[Byte], o: Int): Int =
    (p(o) & 0xFF) | (p(o + 1) & 0xFF) << 8

  private def tag(p: Array[Byte], o: Int, t: String): Boolean =
    p(o) == t.charAt(0) && p(o + 1) == t.charAt(1) &&
      p(o + 2) == t.charAt(2) && p(o + 3) == t.charAt(3)

  /** Exact floor(sqrt(x)) for non-negative x (Math.sqrt seed + integer
    * correction, so the result can never drift across JVMs).
    */
  private def isqrt(x: Long): Int = {
    var r = math.sqrt(x.toDouble).toLong
    while (r > 0 && r * r > x) r -= 1
    while ((r + 1) * (r + 1) <= x) r += 1
    r.toInt
  }

  /** Located PCM payload: (data offset, data size, rate, channels,
    * bits) — the shared product of the RIFF chunk walk.
    */
  private final case class Pcm(off: Int, size: Int, sampleRate: Int,
                               channels: Int, bits: Int)

  private def findPcm(p: Array[Byte]): Pcm = {
    if (p == null || p.length < 44) return null
    if (!tag(p, 0, "RIFF") || !tag(p, 8, "WAVE")) return null
    // RIFF chunk walk: fmt must precede data; unknown chunks skipped
    var i = 12
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var haveFmt = false
    while (i + 8 <= p.length) {
      val size = le32(p, i + 4)
      if (size < 0 || i + 8 + size.toLong > p.length) return null
      if (tag(p, i, "fmt ")) {
        if (size < 16) return null
        val audioFormat = le16(p, i + 8)
        channels = le16(p, i + 10)
        sampleRate = le32(p, i + 12)
        bits = le16(p, i + 22)
        if (audioFormat != 1 || channels <= 0 || sampleRate <= 0 ||
          (bits != 8 && bits != 16)) return null
        haveFmt = true
      } else if (tag(p, i, "data")) {
        if (!haveFmt) return null
        return Pcm(i + 8, size, sampleRate, channels, bits)
      }
      i += 8 + size + (size & 1) // chunks pad to even offsets
    }
    null
  }

  def compute(p: Array[Byte]): Decoded = {
    val pcm = findPcm(p)
    if (pcm == null) null
    else pcmStats(p, pcm.off, pcm.size, pcm.sampleRate, pcm.channels, pcm.bits)
  }

  private def pcmStats(p: Array[Byte], off: Int, size: Int,
                       sampleRate: Int, channels: Int, bits: Int): Decoded = {
    val bytesPerSample = bits / 8
    val frameBytes = channels * bytesPerSample
    val nFrames = size / frameBytes
    if (nFrames <= 0) return null
    val mins = Array.fill(channels)(Int.MaxValue)
    val maxs = Array.fill(channels)(Int.MinValue)
    val sq = new Array[Long](channels)
    var f = 0
    var i = off
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        // 8-bit WAV is unsigned on disk (center 128); 16-bit is signed LE
        val s =
          if (bits == 8) (p(i) & 0xFF) - 128
          else le16(p, i).toShort.toInt
        if (s < mins(c)) mins(c) = s
        if (s > maxs(c)) maxs(c) = s
        sq(c) += s.toLong * s
        c += 1
        i += bytesPerSample
      }
      f += 1
    }
    Decoded(sampleRate, channels, nFrames, mins, maxs,
      sq.map(x => isqrt(x / nFrames)))
  }

  /** WINDOWED energy contour (r20 — the standard audio feature-
    * extraction primitive: per-window RMS over fixed frame windows, the
    * shape every VAD / loudness / segmentation stage consumes): one
    * struct per `windowFrames`-frame window — (window_no, n_frames,
    * per-channel RMS via the same exact integer sqrt as the whole-file
    * stats). The final window may be short (its true frame count is in
    * `n_frames`); NULL for anything [[compute]] refuses — same walk,
    * same refusal set. Per-row projection, zero shuffle.
    */
  val windowStatsType: ArrayType = ArrayType(StructType(Seq(
    StructField("window_no", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("ch_rms", ArrayType(IntegerType, containsNull = false), nullable = false))),
    containsNull = false)

  def audioWindowStats(payload: Column, windowFrames: Int): Column = {
    require(windowFrames >= 1, s"windowFrames=$windowFrames must be >= 1")
    CatalystBridge.column(AudioWindowStatsExpr(
      CatalystBridge.expression(payload), windowFrames))
  }

  def computeWindows(p: Array[Byte], windowFrames: Int): GenericArrayData = {
    val pcm = findPcm(p)
    if (pcm == null) return null
    val bytesPerSample = pcm.bits / 8
    val frameBytes = pcm.channels * bytesPerSample
    val nFrames = pcm.size / frameBytes
    if (nFrames <= 0) return null
    val nWin = (nFrames + windowFrames - 1) / windowFrames
    val rows = new Array[Any](nWin)
    var wi = 0
    while (wi < nWin) {
      val f0 = wi * windowFrames
      val f1 = math.min(nFrames, f0 + windowFrames)
      val cnt = f1 - f0
      val sq = new Array[Long](pcm.channels)
      var f = f0
      var i = pcm.off + f0 * frameBytes
      while (f < f1) {
        var c = 0
        while (c < pcm.channels) {
          val s =
            if (pcm.bits == 8) (p(i) & 0xFF) - 128
            else le16(p, i).toShort.toInt
          sq(c) += s.toLong * s
          c += 1
          i += bytesPerSample
        }
        f += 1
      }
      rows(wi) = new GenericInternalRow(Array[Any](
        wi, cnt, new GenericArrayData(sq.map(x => isqrt(x / cnt)))))
      wi += 1
    }
    new GenericArrayData(rows)
  }

  /** Deterministic WAV BUILDER (the ingest-side fixture-view helper,
    * [[graft.operators.Multimodal.encodedImages]]'s audio sibling): wrap
    * arbitrary payload bytes as the sample data of a PCM-8 mono WAV.
    * Spark's string builtins cannot emit little-endian binary header
    * ints, so the wrap is a native expression; the DECODER above never
    * special-cases these (the spec feeds it independently hand-built
    * and truncated files too).
    */
  def wrapPcm8Wav(payload: Column, sampleRate: Int = 8000): Column = {
    require(sampleRate > 0, s"sampleRate=$sampleRate must be positive")
    CatalystBridge.column(
      WrapWavExpr(CatalystBridge.expression(payload), sampleRate))
  }

  def wrap(payload: Array[Byte], sampleRate: Int): Array[Byte] = {
    val n = payload.length
    val out = new Array[Byte](44 + n)
    def putTag(o: Int, t: String): Unit =
      (0 to 3).foreach(j => out(o + j) = t.charAt(j).toByte)
    def put32(o: Int, v: Int): Unit =
      (0 to 3).foreach(j => out(o + j) = ((v >> (8 * j)) & 0xFF).toByte)
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
    }
    putTag(0, "RIFF"); put32(4, 36 + n); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, 1)
    put32(24, sampleRate); put32(28, sampleRate); put16(32, 1); put16(34, 8)
    putTag(36, "data"); put32(40, n)
    System.arraycopy(payload, 0, out, 44, n)
    out
  }
}

case class AudioStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioDecode.statsType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"audio_stats expects binary, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    AudioDecode.computeRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.AudioDecode.computeRow($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): AudioStatsExpr =
    copy(child = newChild)
}

case class AudioWindowStatsExpr(child: Expression, windowFrames: Int)
    extends UnaryExpression {

  override def dataType: DataType = AudioDecode.windowStatsType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"audio_window_stats expects binary, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    AudioDecode.computeWindows(input.asInstanceOf[Array[Byte]], windowFrames)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.AudioDecode.computeWindows($c, $windowFrames);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): AudioWindowStatsExpr =
    copy(child = newChild)
}

case class WrapWavExpr(child: Expression, sampleRate: Int)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wrap_pcm8_wav expects binary, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    AudioDecode.wrap(input.asInstanceOf[Array[Byte]], sampleRate)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AudioDecode.wrap($c, $sampleRate);")

  override protected def withNewChildInternal(newChild: Expression): WrapWavExpr =
    copy(child = newChild)
}
