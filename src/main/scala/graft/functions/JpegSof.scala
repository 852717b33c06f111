package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native JPEG frame-header scan: `graft_jpeg_sof(media)` walks the
  * JFIF/EXIF marker-segment chain of a `binary` payload and returns
  * `[sof_marker, height, width]` (longs) from the first start-of-frame
  * segment, or null when the payload is not a scannable JPEG (wrong
  * SOI magic, marker desync, truncated segment, or scan-data reached
  * before any SOF).
  *
  * The marker chain is the public interchange format (ITU-T T.81 /
  * JFIF): after the `FF D8` SOI, each segment is `FF <marker>` plus —
  * for all non-standalone markers — a 2-byte big-endian length that
  * INCLUDES itself, so APP0/EXIF/COM/DQT segments of arbitrary size are
  * skipped without decoding. SOFn markers are 0xC0–0xCF minus DHT
  * (0xC4), JPG (0xC8) and DAC (0xCC); the frame header that follows is
  * `precision(1) height(2BE) width(2BE)`. The scan stops at SOS
  * (0xDA, entropy-coded data follows — a SOF cannot legally appear
  * after it) and at EOI.
  *
  * Why native: APP/EXIF segments run to kilobytes, so any fixed-size
  * `hex()`-slice approach (the BMP/WAV path in [[graft.ext.Multimodal]])
  * either truncates before the SOF or hex-doubles the whole payload per
  * row; this is a per-row O(#segments) byte loop with early exit inside
  * whole-stage codegen — no allocation until the 3-element hit array.
  */
case class JpegSofDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_jpeg_sof expects binary, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_jpeg_sof"

  override def nullSafeEval(media: Any): Any = {
    val r = JpegSofDims.compute(media.asInstanceOf[Array[Byte]])
    if (r == null) null else new GenericArrayData(r)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, media => {
      val r = ctx.freshName("sof")
      s"""
      long[] $r = graft.functions.JpegSofDims.compute($media);
      ${ev.isNull} = $r == null;
      ${ev.value} = ${ev.isNull} ? null
        : new org.apache.spark.sql.catalyst.util.GenericArrayData($r);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): JpegSofDims =
    copy(child = newChild)
}

object JpegSofDims {

  /** Returns `[marker, height, width]` or null. Static so interpreted
    * eval and generated code run the SAME scan (the JsonLongKey
    * pattern). */
  def compute(b: Array[Byte]): Array[Long] = {
    val n = b.length
    if (n < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return null
    var i = 2
    while (i + 1 < n) {
      if ((b(i) & 0xFF) != 0xFF) return null // marker desync
      val m = b(i + 1) & 0xFF
      if (m == 0xFF) i += 1 // fill byte before a marker
      else if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) i += 2 // standalone
      else if (m == 0xD9 || m == 0xDA) return null // EOI / SOS before any SOF
      else {
        if (i + 3 >= n) return null // truncated inside the length field
        val len = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
        if (len < 2) return null // malformed length
        val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
        if (isSof) {
          // frame header: len(2) precision(1) height(2BE) width(2BE)
          if (len < 7 || i + 8 >= n) return null
          val h = ((b(i + 5) & 0xFF) << 8) | (b(i + 6) & 0xFF)
          val w = ((b(i + 7) & 0xFF) << 8) | (b(i + 8) & 0xFF)
          return Array(m.toLong, h.toLong, w.toLong)
        }
        i += 2 + len
      }
    }
    null
  }
}
