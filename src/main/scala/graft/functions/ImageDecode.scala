package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL image decode as a native expression (r18 verdict #1 — this
  * retires the one honest capability stub): a binary payload in, a
  * `(format, width, height, channels, ch_min, ch_max, ch_mean)` struct
  * out, NULL for anything that is not a decodable image. Three decode
  * paths, all offline-safe on a stock JDK:
  *
  *  - PPM (`P6`) / PGM (`P5`) binary netpbm — a hand-rolled pure-JVM
  *    parser (header with `#` comments and arbitrary whitespace, 8-bit
  *    samples, trailing bytes tolerated);
  *  - BMP — hand-rolled BITMAPINFOHEADER parser for the uncompressed
  *    24-bit layout (row padding honored, bottom-up and top-down), BGR
  *    storage re-ordered so channel stats are always R,G,B;
  *  - PNG — `javax.imageio` (a genuine zlib inflate + filter
  *    reconstruction, JDK-bundled); palette images are expanded through
  *    the color model so stats are pixel-space, never index-space.
  *
  * Stats are integer-exact by construction: per-channel min, max, and
  * `floor(sum / pixels)` mean over the decoded samples, so the output
  * is engine-reproducible (the q_mm_decode driver query is rows-only
  * only because DuckDB cannot decode images; MultimodalSpec pins exact
  * golden-pixel equality for every format).
  *
  * 100 TB shape: per-row projection work with zero shuffle — the
  * classic decode-then-DROP-the-payload stage. The netpbm/BMP paths
  * are allocation-free scans; the PNG path pays ImageIO's object churn
  * but `ImageIO.setUseCache(false)` keeps it purely in-memory (the
  * default temp-FILE cache would turn every row into disk I/O).
  */
object ImageDecode {

  /** Decoded stats carrier shared by interpreted eval and codegen. */
  final case class Decoded(format: String, width: Int, height: Int,
                           channels: Int, mins: Array[Int], maxs: Array[Int],
                           means: Array[Int])

  val statsType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("ch_min", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("ch_max", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("ch_mean", ArrayType(IntegerType, containsNull = false), nullable = false)))

  def imageStats(payload: Column): Column =
    CatalystBridge.column(ImageStatsExpr(CatalystBridge.expression(payload)))

  /** Row builder for eval/codegen; null when the payload is not an
    * image this decoder understands (truncated counts as undecodable).
    */
  def computeRow(payload: Array[Byte]): GenericInternalRow = {
    val d = compute(payload)
    if (d == null) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(d.format), d.width, d.height, d.channels,
      new GenericArrayData(d.mins), new GenericArrayData(d.maxs),
      new GenericArrayData(d.means)))
  }

  def compute(p: Array[Byte]): Decoded = {
    if (p == null || p.length < 10) null
    else if (p(0) == 'P' && (p(1) == '5' || p(1) == '6')) decodePnm(p)
    else if (p(0) == 'B' && p(1) == 'M') decodeBmp(p)
    else if ((p(0) & 0xFF) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G')
      decodePng(p)
    else null
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t'

  private def decodePnm(p: Array[Byte]): Decoded = {
    val channels = if (p(1) == '6') 3 else 1
    var i = 2
    val hdr = new Array[Int](3) // width, height, maxval
    var v = 0
    while (v < 3) {
      var skipping = true
      while (skipping && i < p.length) {
        if (isWs(p(i))) i += 1
        else if (p(i) == '#') { while (i < p.length && p(i) != '\n') i += 1 }
        else skipping = false
      }
      if (i >= p.length || p(i) < '0' || p(i) > '9') return null
      var x = 0L
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        x = x * 10 + (p(i) - '0')
        if (x > Int.MaxValue) return null
        i += 1
      }
      hdr(v) = x.toInt
      v += 1
    }
    // exactly ONE whitespace byte separates maxval from the raster
    if (i >= p.length || !isWs(p(i))) return null
    i += 1
    val (w, h, maxv) = (hdr(0), hdr(1), hdr(2))
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return null
    val need = w.toLong * h * channels
    if (need > Int.MaxValue || (p.length - i).toLong < need) return null
    statsInterleaved(if (channels == 3) "ppm" else "pgm",
      w, h, channels, p, i, rowPad = 0, bgr = false)
  }

  private def decodeBmp(p: Array[Byte]): Decoded = {
    if (p.length < 54) return null
    def le32(o: Int): Int = (p(o) & 0xFF) | (p(o + 1) & 0xFF) << 8 |
      (p(o + 2) & 0xFF) << 16 | (p(o + 3) & 0xFF) << 24
    def le16(o: Int): Int = (p(o) & 0xFF) | (p(o + 1) & 0xFF) << 8
    val dataOff = le32(10)
    val hdrSize = le32(14)
    val w = le32(18)
    val hRaw = le32(22)
    val bpp = le16(28)
    val comp = le32(30)
    // the ubiquitous subset: BITMAPINFOHEADER(+), uncompressed 24-bit
    if (hdrSize < 40 || w <= 0 || hRaw == 0 || bpp != 24 || comp != 0) return null
    val h = math.abs(hRaw)
    // math.abs(Int.MinValue) is still negative — refuse, don't emit a
    // bogus zero-pixel row
    if (h <= 0) return null
    // row size in LONG: a crafted width > ~715M overflows w*3 in Int,
    // turning the bounds check below into a pass and the pixel scan
    // into an out-of-bounds read (ADVICE r19) — undecodable means NULL
    val rowSizeL = ((w.toLong * 3 + 3) / 4) * 4 // rows pad to 4-byte boundaries
    if (dataOff < 54 || dataOff.toLong + rowSizeL * h > p.length) return null
    val rowSize = rowSizeL.toInt // safe: bounded by p.length above
    // channel stats are row-order independent, so bottom-up vs top-down
    // needs no flip — only the padding must be skipped
    statsInterleaved("bmp", w, h, 3, p, dataOff,
      rowPad = rowSize - w * 3, bgr = true)
  }

  /** Accumulate stats over an interleaved 8-bit raster starting at
    * `off`, skipping `rowPad` bytes after each row; `bgr` re-orders the
    * BMP storage so the emitted channels are R,G,B.
    */
  private def statsInterleaved(fmt: String, w: Int, h: Int, c: Int,
                               p: Array[Byte], off: Int, rowPad: Int,
                               bgr: Boolean): Decoded = {
    val mins = Array.fill(c)(255)
    val maxs = new Array[Int](c)
    val sums = new Array[Long](c)
    var i = off
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var b = 0
        while (b < c) {
          val ch = if (bgr) c - 1 - b else b
          val s = p(i) & 0xFF
          if (s < mins(ch)) mins(ch) = s
          if (s > maxs(ch)) maxs(ch) = s
          sums(ch) += s
          b += 1
          i += 1
        }
        x += 1
      }
      i += rowPad
      y += 1
    }
    val npix = w.toLong * h
    Decoded(fmt, w, h, c, mins, maxs, sums.map(s => (s / npix).toInt))
  }

  /** REAL image RESIZE for the netpbm subset (r20 — retires the
    * feature-pooling "resize" stand-in as the only downsampling path):
    * decode a P5/P6 payload, box-average each `factor`×`factor` block
    * with exact integer floor division, re-encode as the same format —
    * a decode → transform → re-encode stage whose output is itself a
    * valid image [[compute]] accepts. Trailing rows/columns that do not
    * fill a block are truncated (deterministic, the standard integer
    * downsample contract); NULL for non-PNM payloads, maxval > 255, or
    * an output dimension of zero. Per-row projection, zero shuffle.
    */
  def resizePnm(payload: Column, factor: Int): Column = {
    require(factor >= 1, s"resize factor=$factor must be >= 1")
    CatalystBridge.column(
      ResizePnmExpr(CatalystBridge.expression(payload), factor))
  }

  def computeResize(p: Array[Byte], factor: Int): Array[Byte] = {
    if (p == null || p.length < 10) return null
    if (p(0) != 'P' || (p(1) != '5' && p(1) != '6')) return null
    val channels = if (p(1) == '6') 3 else 1
    // header parse: the decodePnm discipline (comments, arbitrary ws,
    // exactly one ws byte before the raster)
    var i = 2
    val hdr = new Array[Int](3)
    var v = 0
    while (v < 3) {
      var skipping = true
      while (skipping && i < p.length) {
        if (isWs(p(i))) i += 1
        else if (p(i) == '#') { while (i < p.length && p(i) != '\n') i += 1 }
        else skipping = false
      }
      if (i >= p.length || p(i) < '0' || p(i) > '9') return null
      var x = 0L
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        x = x * 10 + (p(i) - '0')
        if (x > Int.MaxValue) return null
        i += 1
      }
      hdr(v) = x.toInt
      v += 1
    }
    if (i >= p.length || !isWs(p(i))) return null
    i += 1
    val (w, h, maxv) = (hdr(0), hdr(1), hdr(2))
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return null
    val need = w.toLong * h * channels
    if (need > Int.MaxValue || (p.length - i).toLong < need) return null
    val ow = w / factor
    val oh = h / factor
    if (ow <= 0 || oh <= 0) return null
    val header = (if (channels == 3) "P6" else "P5") + s"\n$ow $oh\n255\n"
    val hb = header.getBytes("US-ASCII")
    val out = new Array[Byte](hb.length + ow * oh * channels)
    System.arraycopy(hb, 0, out, 0, hb.length)
    val div = factor * factor
    var oy = 0
    var o = hb.length
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        var c = 0
        while (c < channels) {
          var sum = 0L
          var dy = 0
          while (dy < factor) {
            var dx = 0
            val rowBase = i + ((oy * factor + dy).toLong * w).toInt * channels
            while (dx < factor) {
              sum += (p(rowBase + (ox * factor + dx) * channels + c) & 0xFF)
              dx += 1
            }
            dy += 1
          }
          out(o) = (sum / div).toByte
          o += 1
          c += 1
        }
        ox += 1
      }
      oy += 1
    }
    out
  }

  // In-memory only: ImageIO's default stream cache writes a temp FILE
  // per read — at per-row decode rates that is accidental disk I/O
  javax.imageio.ImageIO.setUseCache(false)

  private def decodePng(p: Array[Byte]): Decoded = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      catch { case _: Exception => null }
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0) return null
    val palette = img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
    if (palette) {
      // expand indices through the palette: stats must describe pixels
      val c = 3
      val mins = Array.fill(c)(255)
      val maxs = new Array[Int](c)
      val sums = new Array[Long](c)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          var b = 0
          while (b < c) {
            val s = (rgb >> (16 - 8 * b)) & 0xFF
            if (s < mins(b)) mins(b) = s
            if (s > maxs(b)) maxs(b) = s
            sums(b) += s
            b += 1
          }
          x += 1
        }
        y += 1
      }
      val npix = w.toLong * h
      Decoded("png", w, h, c, mins, maxs, sums.map(s => (s / npix).toInt))
    } else {
      val raster = img.getRaster
      val c = raster.getNumBands
      val mins = Array.fill(c)(Int.MaxValue)
      val maxs = new Array[Int](c)
      val sums = new Array[Long](c)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < c) {
            val s = raster.getSample(x, y, b)
            if (s < mins(b)) mins(b) = s
            if (s > maxs(b)) maxs(b) = s
            sums(b) += s
            b += 1
          }
          x += 1
        }
        y += 1
      }
      val npix = w.toLong * h
      Decoded("png", w, h, c, mins, maxs, sums.map(s => (s / npix).toInt))
    }
  }
}

case class ImageStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageDecode.statsType

  // undecodable payloads yield NULL even when the input is non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"image_stats expects binary, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    ImageDecode.computeRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.ImageDecode.computeRow($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ImageStatsExpr =
    copy(child = newChild)
}

case class ResizePnmExpr(child: Expression, factor: Int)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType

  // non-PNM / truncated / zero-output payloads yield NULL
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"resize_pnm expects binary, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    ImageDecode.computeResize(input.asInstanceOf[Array[Byte]], factor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.ImageDecode.computeResize($c, $factor);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ResizePnmExpr =
    copy(child = newChild)
}
