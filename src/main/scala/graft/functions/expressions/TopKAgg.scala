package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** top_k(struct, k): the k largest struct values as a descending array,
  * ordered by the struct's first field DESC, remaining fields ASC
  * (deterministic tiebreak).
  *
  * Why a custom aggregate: the window formulation
  * (`row_number().over(partitionBy(key).orderBy(score.desc)) <= k`) must
  * shuffle and fully SORT every row of every key before discarding all but
  * k — at 100 TB that sort is the job. This aggregate keeps a bounded
  * min-heap per key on the MAP side (partial aggregation), so only k rows
  * per key per partition ever reach the shuffle, and merge is heap-union.
  * Work O(n log k) with no global sort; shuffle volume k·keys·partitions
  * instead of n.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buffer] {

  require(k >= 1, "k must be >= 1")

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  /** first field DESC, remaining ASC. */
  private lazy val ordering: Ordering[InternalRow] = {
    val fieldOrds = structType.fields.map(f =>
      PhysicalDataType.ordering(f.dataType).asInstanceOf[Ordering[Any]])
    new Ordering[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = {
        var i = 0
        while (i < fieldOrds.length) {
          val dt = structType.fields(i).dataType
          val (av, bv) = (a.get(i, dt), b.get(i, dt))
          val c =
            if (av == null && bv == null) 0
            else if (av == null) -1
            else if (bv == null) 1
            else fieldOrds(i).compare(av, bv)
          if (c != 0) return if (i == 0) -c else c // field 0 DESC, rest ASC
          i += 1
        }
        0
      }
    }
  }

  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"top_k requires a struct input, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): TopKAgg.Buffer =
    new TopKAgg.Buffer(k)

  override def update(buf: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val v = child.eval(input)
    if (v != null)
      buf.offer(toUnsafe(v.asInstanceOf[InternalRow]).copy(), ordering)
    buf
  }

  override def merge(buf: TopKAgg.Buffer, other: TopKAgg.Buffer): TopKAgg.Buffer = {
    other.rows.foreach(r => buf.offer(r, ordering))
    buf
  }

  override def eval(buf: TopKAgg.Buffer): Any =
    new GenericArrayData(buf.rows.sorted(ordering).toArray[Any])

  override def serialize(buf: TopKAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.rows.size)
    buf.rows.foreach { r =>
      val u = r.asInstanceOf[UnsafeRow]
      val bytes = u.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKAgg.Buffer(k)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(structType.length)
      row.pointTo(rowBytes, len)
      buf.offer(row, ordering)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKAgg =
    copy(child = c.head)

  override def prettyName: String = "top_k"
}

object TopKAgg {
  /** Bounded "keep the k largest" set. Scala's PriorityQueue allocates per
    * offer; at k ≤ a few hundred a sorted check + occasional re-sort of a
    * small array buffer is simpler and allocation-free on the reject path.
    */
  final class Buffer(val k: Int) {
    val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    private var worst: InternalRow = _ // smallest kept row once full

    def offer(row: InternalRow, ord: Ordering[InternalRow]): Unit = {
      if (rows.size < k) {
        rows += row
        if (rows.size == k) worst = rows.max(ord)
      } else if (ord.compare(row, worst) < 0) { // row ranks above worst
        val i = rows.indexOf(worst)
        rows(i) = row
        worst = rows.max(ord)
      }
    }
  }
}
