package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter summary state: at most k counters, plus the
  * total item count and the cumulative decrement total (the per-item
  * error bound: for every item, f - err <= counter <= f, and any item
  * with f > n/(k+1) is guaranteed a slot).
  */
private[functions] final class MgState(
    var n: Long,
    var err: Long,
    val counts: mutable.HashMap[String, Long])

/** Native Misra-Gries aggregate: `mg_summary(token, k) ->
  * STRUCT<n BIGINT, err BIGINT, items ARRAY<STRUCT<token, cnt>>>`.
  *
  * Heavy-hitter DISCOVERY under bounded state — the gap between
  * `cms_estimate` (point frequency probes: you must already know the
  * item) and an exact top-k (a full vocabulary shuffle): k counters per
  * aggregation buffer, never the vocabulary.
  *
  *   - update is classic Misra-Gries: hit -> +1; miss with a free slot
  *     -> insert at 1; miss with k live slots -> decrement ALL by 1
  *     (dropping zeros) and discard the arrival — each such step retires
  *     k+1 units of count, so the decrement total obeys
  *     err <= n/(k+1);
  *   - merge is the Agarwal et al. mergeable-summaries rule: sum
  *     counters pairwise, then subtract the (k+1)-th largest value from
  *     every counter and drop the non-positive — at least k+1 counters
  *     lose that value, so the same err <= n/(k+1) invariant survives
  *     any merge tree. This is what makes the sketch DISTRIBUTED: map
  *     partitions build independent summaries, the shuffle moves k
  *     counters per partition, never raw tokens.
  *
  * Counter VALUES (and which sub-threshold items hold slots) depend on
  * arrival/merge order — inherent to MG; the GUARANTEES do not: every
  * item with f > n/(k+1) is present, and every counter lies in
  * [f - err, f]. Consumers must read the summary through those bands
  * (the HLL/GK attestation precedent), which is exactly what
  * `corpus_heavy_hitters` does.
  *
  * Output items are sorted by token for a stable representation.
  */
case class MgSummaryAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgState] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"mg_summary requires STRING input, got ${child.dataType.catalogString}")
    else if (k < 1) TypeCheckResult.TypeCheckFailure(
      s"mg_summary requires k >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
      containsNull = false), nullable = false)))

  override def nullable: Boolean = false
  override def prettyName: String = "mg_summary"

  override def createAggregationBuffer(): MgState =
    new MgState(0L, 0L, mutable.HashMap.empty)

  override def update(buffer: MgState, input: InternalRow): MgState = {
    val v = child.eval(input)
    if (v != null) {
      buffer.n += 1L
      val t = v.asInstanceOf[UTF8String].toString
      buffer.counts.get(t) match {
        case Some(c) => buffer.counts.update(t, c + 1L)
        case None if buffer.counts.size < k => buffer.counts.update(t, 1L)
        case None =>
          // k live slots and a miss: the decrement-all step
          buffer.err += 1L
          val dead = mutable.ArrayBuffer.empty[String]
          buffer.counts.foreach { case (key, c) =>
            if (c == 1L) dead += key else buffer.counts.update(key, c - 1L)
          }
          dead.foreach(buffer.counts.remove)
      }
    }
    buffer
  }

  override def merge(buffer: MgState, other: MgState): MgState = {
    buffer.n += other.n
    buffer.err += other.err
    other.counts.foreach { case (t, c) =>
      buffer.counts.update(t, buffer.counts.getOrElse(t, 0L) + c)
    }
    if (buffer.counts.size > k) {
      // subtract the (k+1)-th largest counter from everything; at least
      // k+1 counters shed that value, preserving err <= n/(k+1)
      val vals = buffer.counts.values.toArray
      java.util.Arrays.sort(vals)
      val v = vals(vals.length - k - 1)
      buffer.err += v
      val dead = mutable.ArrayBuffer.empty[String]
      buffer.counts.foreach { case (key, c) =>
        if (c <= v) dead += key else buffer.counts.update(key, c - v)
      }
      dead.foreach(buffer.counts.remove)
    }
    buffer
  }

  override def eval(buffer: MgState): Any = {
    val items = buffer.counts.toArray.sortBy(_._1).map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }
    InternalRow(buffer.n, buffer.err,
      new GenericArrayData(items.asInstanceOf[Array[Any]]))
  }

  override def serialize(buffer: MgState): Array[Byte] = {
    val entries = buffer.counts.toArray
    val byteKeys = entries.map(_._1.getBytes(StandardCharsets.UTF_8))
    val size = 8 + 8 + 4 +
      byteKeys.map(b => 4 + b.length + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buffer.n)
    bb.putLong(buffer.err)
    bb.putInt(entries.length)
    var i = 0
    while (i < entries.length) {
      bb.putInt(byteKeys(i).length)
      bb.put(byteKeys(i))
      bb.putLong(entries(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgState = {
    val bb = ByteBuffer.wrap(bytes)
    val state = new MgState(bb.getLong(), bb.getLong(), mutable.HashMap.empty)
    val m = bb.getInt()
    var i = 0
    while (i < m) {
      val len = bb.getInt()
      val tb = new Array[Byte](len)
      bb.get(tb)
      state.counts.update(new String(tb, StandardCharsets.UTF_8),
        bb.getLong())
      i += 1
    }
    state
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSummaryAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSummaryAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgSummaryAgg =
    copy(child = newChild)
}
