package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized Count-Min sketch for a string item's estimated
  * count: `cms_estimate(sketch_binary, item)`.
  *
  * Spark builds CMS with the `count_min_sketch` aggregate but ships no
  * probe function — the sketch is only usable driver-side
  * (`DataFrameStatFunctions`). This expression closes that gap so the
  * whole estimate-vs-exact attestation stays a distributed plan: the
  * 1-row sketch is broadcast and each probe row evaluates against it.
  *
  * String items are hashed as their UTF-8 BYTES (`addBinary`), matching
  * how `CountMinSketchAgg` ingests StringType columns — probing with
  * `estimateCountForStringItem` would silently hash differently and
  * return garbage.
  *
  * CodegenFallback is deliberate: probes are a handful of rows per query
  * (top-k attestations), never a hot path; the per-thread one-slot cache
  * below keeps the deserialization cost at one `readFrom` per task rather
  * than one per row.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate requires (BINARY sketch, STRING item), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override protected def nullSafeEval(sketchBytes: Any, item: Any): Any =
    CmsEstimate.sketchOf(sketchBytes.asInstanceOf[Array[Byte]])
      .estimateCount(item.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  // one-slot per-thread cache keyed by array identity: every probe row in a
  // task carries the SAME broadcast sketch reference, so deserialization
  // happens once per task instead of once per row
  private val last = new ThreadLocal[(Array[Byte], CountMinSketch)]

  private[functions] def sketchOf(bytes: Array[Byte]): CountMinSketch = {
    val cached = last.get()
    if (cached != null && (cached._1 eq bytes)) cached._2
    else {
      val sk = CountMinSketch.readFrom(bytes)
      last.set((bytes, sk))
      sk
    }
  }
}
