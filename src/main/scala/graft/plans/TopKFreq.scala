package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** topk_freq(item, k): approximate heavy hitters via the Space-Saving
  * algorithm (Metwally et al., public) — bounded state (capacity = 8k
  * counters) regardless of item cardinality, with mergeable summaries.
  *
  * This is the 100 TB shape of an ES `terms` aggregation over a
  * high-cardinality field: exact per-key counting needs state proportional
  * to distinct keys; Space-Saving guarantees any item with frequency
  * > n/capacity is present, at O(capacity) memory per group. When distinct
  * items ≤ capacity the result is exact. Registered via [[GraftExtensions]]. */
case class TopKFreq(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[String, Long]] with UnaryLike[Expression] {

  require(k > 0)
  private val capacity = 8 * k

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, Long] =
    mutable.LinkedHashMap.empty

  private def add(buf: mutable.LinkedHashMap[String, Long], item: String, by: Long): Unit = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + by)
      case None if buf.size < capacity => buf.update(item, by)
      case None =>
        // evict the minimum counter; inherit its count (Space-Saving step)
        val (minK, minV) = buf.minBy { case (key, c) => (c, key) }
        buf.remove(minK)
        buf.update(item, minV + by)
    }
  }

  override def update(buf: mutable.LinkedHashMap[String, Long], input: InternalRow): mutable.LinkedHashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString, 1L)
    buf
  }

  override def merge(b1: mutable.LinkedHashMap[String, Long], b2: mutable.LinkedHashMap[String, Long]): mutable.LinkedHashMap[String, Long] = {
    // deterministic merge order regardless of partition layout
    b2.toSeq.sortBy { case (key, c) => (-c, key) }.foreach { case (key, c) => add(b1, key, c) }
    b1
  }

  override def eval(buf: mutable.LinkedHashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (key, c) => (-c, key) }.take(k)
    new GenericArrayData(top.map { case (key, c) =>
      InternalRow(UTF8String.fromString(key), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.LinkedHashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) => out.writeUTF(key); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LinkedHashMap.empty[String, Long]
    (1 to n).foreach(_ => buf.update(in.readUTF(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKFreq = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKFreq = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): TopKFreq = copy(child = newChild)
}
