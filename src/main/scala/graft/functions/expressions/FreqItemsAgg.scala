package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** freq_items(token, capacity): Misra-Gries heavy-hitters sketch —
  * `map<string, long>` of at most `capacity` items with estimated counts.
  *
  * Why a custom aggregate: exact global token counts (`explode →
  * groupBy(token).count`) shuffle EVERY distinct token; at 100 TB a
  * vocabulary-scale token universe makes that shuffle the job. This
  * sketch keeps a bounded `capacity`-entry counter map per partition
  * (map-side partial aggregation), so only `capacity` rows per partition
  * reach the shuffle regardless of input size, and merge is counter
  * addition + one rank-(capacity+1) subtraction — the standard mergeable
  * Misra-Gries summary.
  *
  * Guarantees (public MG bounds):
  *   - estimates UNDERCOUNT only: `true - N/(capacity+1) <= est <= true`
  *     where N is the total stream length (merges included);
  *   - every item with true count > N/(capacity+1) is present — no heavy
  *     hitter is ever dropped;
  *   - EXACT when the distinct-item count never exceeds `capacity`
  *     (no decrement ever fires) — the regime the q69 oracle pins.
  */
case class FreqItemsAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqItemsAgg.Buffer] {

  require(capacity >= 1, "freq_items capacity must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"freq_items requires a string input, got ${dt.sql}")
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): FreqItemsAgg.Buffer =
    new FreqItemsAgg.Buffer(capacity)

  override def update(buf: FreqItemsAgg.Buffer, input: InternalRow): FreqItemsAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: FreqItemsAgg.Buffer, other: FreqItemsAgg.Buffer): FreqItemsAgg.Buffer = {
    other.counts.foreach { case (item, c) => buf.offer(item, c) }
    buf
  }

  override def eval(buf: FreqItemsAgg.Buffer): Any = {
    // deterministic map order: count DESC, item ASC
    val sorted = buf.counts.toSeq.sortBy { case (item, c) => (-c, item) }
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(sorted.map(_._2).toArray[Any]))
  }

  // items serialize as length-prefixed UTF-8 byte arrays, NOT writeUTF:
  // writeUTF caps entries at 65535 encoded bytes and would crash the
  // partial-aggregate shuffle on the first long string in the column
  override def serialize(buf: FreqItemsAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (item, c) =>
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqItemsAgg.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new FreqItemsAgg.Buffer(capacity)
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.offer(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = c.head)

  override def prettyName: String = "freq_items"
}

object FreqItemsAgg {
  /** Misra-Gries counter map bounded at `capacity` entries. `offer` with
    * weight w is the weighted-stream generalization (exactly what merge
    * needs): increment if present or space remains; otherwise subtract
    * the rank-(capacity+1) counter value from everything and drop
    * non-positive entries (one shared decrement covers the whole batch —
    * the standard mergeable-summaries formulation). Decrement work is
    * bounded by total increments, so updates stay amortized O(1).
    */
  final class Buffer(val capacity: Int) {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]

    def offer(item: String, w: Long): Unit = {
      counts.get(item) match {
        case Some(c) => counts.update(item, c + w)
        case None if counts.size < capacity => counts.update(item, w)
        case None =>
          counts.update(item, w)
          // rank-(capacity+1) largest count is the shared decrement: at
          // least one entry zeroes out, restoring the size bound
          val m = counts.values.toArray.sorted(Ordering[Long].reverse)(capacity)
          counts.toArray.foreach { case (k, c) =>
            if (c - m <= 0) counts.remove(k) else counts.update(k, c - m)
          }
      }
    }
  }
}
