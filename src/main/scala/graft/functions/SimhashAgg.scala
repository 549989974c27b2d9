package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** Native SimHash aggregate: `simhash_agg(hash60) -> 60-bit fingerprint`.
  *
  * Folds the classic per-bit vote — for every input hash, bit b votes +1
  * if set, -1 if clear; the fingerprint sets the bits whose vote sum is
  * positive — into ONE aggregate with a primitive `long[60]` buffer.
  *
  * Replaces the composed form (a `(doc, token) -> count` pre-aggregation
  * followed by 60 conditional `sum` columns), which cost a second shuffle
  * and a 60-column intermediate row. Per-OCCURRENCE ±1 votes sum to
  * exactly the count-weighted votes (Σ_occurrences ±1 = ±cnt), so the
  * fingerprint is bit-identical to the old plan and to the DuckDB oracle
  * twin — only the plan shape changes: map-side partial vote buffers ride
  * one shuffle of 480 bytes per (group, partition).
  */
case class SimhashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val bits = graft.text.TextFns.SimhashBits

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_agg requires BIGINT input (a hash60 value), got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        buffer(b) += (((h >>> b) & 1L) * 2L) - 1L
        b += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var b = 0
    while (b < bits) { buffer(b) += other(b); b += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (buffer(b) > 0L) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bits * 8)
    var b = 0
    while (b < bits) { bb.putLong(buffer(b)); b += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buffer = new Array[Long](bits)
    var b = 0
    while (b < bits) { buffer(b) = bb.getLong(); b += 1 }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimhashAgg =
    copy(child = newChild)
}
