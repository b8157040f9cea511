package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** hist_quantile(value, q, lo, hi, bins): approximate quantile from a
  * fixed-range binned histogram sketch — a `TypedImperativeAggregate` with a
  * mergeable, bounded (bins+2 longs) buffer.
  *
  * This is the 100 TB shape of ES's `percentiles` (which sketches with
  * t-digest): exact `percentile` buffers EVERY value per group, while this
  * sketch is O(bins) memory per group with associative/commutative merges —
  * safe under any partitioning, with error ≤ one bin width. Registered via
  * [[GraftExtensions]]. */
case class HistQuantile(
    child: Expression,
    q: Double,
    lo: Double,
    hi: Double,
    bins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(bins > 0 && hi > lo && q >= 0.0 && q <= 1.0)

  private val width = (hi - lo) / bins

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins + 2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      val idx =
        if (x < lo) 0
        else if (x >= hi) bins + 1
        else 1 + math.min(bins - 1, ((x - lo) / width).toInt)
      buf(idx) += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    buf.foreach(n += _)
    if (n == 0) return null
    val target = q * n
    var cum = 0L
    var i = 0
    while (i < buf.length) {
      cum += buf(i)
      if (cum >= target && buf(i) > 0) {
        // linear interpolation inside the bin
        val frac = if (buf(i) == 0) 0.0 else (target - (cum - buf(i))) / buf(i)
        val f = math.max(0.0, math.min(1.0, frac))
        return java.lang.Double.valueOf(
          if (i == 0) lo
          else if (i == bins + 1) hi
          else lo + (i - 1 + f) * width)
      }
      i += 1
    }
    java.lang.Double.valueOf(hi)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): HistQuantile = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistQuantile = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): HistQuantile = copy(child = newChild)
}
