package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native codegen'd binary-PGM (P5) decoder — the REAL decode step behind
  * the multimodal operators ([[graft.multimodal.MultimodalQueries]]): parse
  * an ASCII `P5 <width> <height> <maxval>` header out of a BINARY payload,
  * validate it, and materialize the `width x height` pixel grid as an
  * integer array. This replaces the byte-histogram STAND-IN as the decode
  * path: the expression consumes a genuine public image format (netpbm
  * PGM), fails to NULL on malformed input like a real decoder, and the
  * downstream feature/thumbnail math runs over actual decoded pixels.
  *
  * Parser contract (strict single-image subset of the netpbm spec):
  * magic `P5`, whitespace-separated decimal width/height/maxval (maxval
  * 1..255 — one byte per pixel), exactly ONE whitespace byte after maxval,
  * then at least `width*height` raster bytes (trailing bytes are ignored,
  * as real stream decoders do). `#` comment lines are not supported — the
  * engine's encoder never emits them. Any violation returns NULL rather
  * than throwing: a corrupt asset must not kill a 100 TB scan.
  *
  * Same codegen shape as [[Hash60]]/[[ByteHistogram]] — one static module
  * call, no encoder boundary, stays inside WholeStageCodegen — with the
  * null-result branch folded into the generated code.
  */
case class DecodePgm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decode_pgm requires BINARY input, got ${child.dataType.catalogString}")

  override def dataType: DataType = DecodePgm.schema
  override def nullable: Boolean = true
  override def prettyName: String = "decode_pgm"

  override protected def nullSafeEval(input: Any): Any =
    DecodePgm.eval(input.asInstanceOf[Array[Byte]])

  // module-instance call (no static forwarder) — see the Hash60 NB; the
  // decoder's malformed->null contract needs the explicit isNull branch,
  // so nullSafeCodeGen rather than defineCodeGen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.DecodePgm$$.MODULE$$.eval($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): DecodePgm =
    copy(child = newChild)
}

object DecodePgm {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("maxval", IntegerType, nullable = false),
    StructField("pixels", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r'

  /** Decoded (width, height, maxval, pixels) row, or null on any
    * malformation. Allocation is bounded by the payload length: the pixel
    * array is only built after `width*height <= remaining bytes` holds.
    */
  def eval(p: Array[Byte]): InternalRow = {
    val n = p.length
    if (n < 2 || p(0) != 'P' || p(1) != '5') return null
    var i = 2

    def skipWs(): Boolean = {
      val s = i
      while (i < n && isWs(p(i))) i += 1
      i > s
    }
    // unsigned decimal int; -1 on absence/overflow
    def parseInt(): Int = {
      if (i >= n || p(i) < '0' || p(i) > '9') return -1
      var v = 0L
      while (i < n && p(i) >= '0' && p(i) <= '9') {
        v = v * 10 + (p(i) - '0')
        if (v > Int.MaxValue) return -1
        i += 1
      }
      v.toInt
    }

    if (!skipWs()) return null
    val w = parseInt()
    if (w < 0) return null
    if (!skipWs()) return null
    val h = parseInt()
    if (h < 0) return null
    if (!skipWs()) return null
    val maxval = parseInt()
    if (maxval < 1 || maxval > 255) return null
    // exactly ONE whitespace byte separates the header from the raster
    if (i >= n || !isWs(p(i))) return null
    i += 1
    val wh = w.toLong * h
    if (wh > n - i) return null
    val pixels = new Array[Int](wh.toInt)
    var k = 0
    while (k < wh) {
      pixels(k) = p(i + k) & 0xff
      k += 1
    }
    new GenericInternalRow(Array[Any](w, h, maxval, new GenericArrayData(pixels)))
  }
}
