package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** scripted_metric analog: a user-programmable aggregation driven by four
  * closures — `init` / `map` / `combine` / `finish` — the exact contract of
  * ES's scripted_metric agg (init_script / map_script / combine_script /
  * reduce_script; the reference exposes it through the standard ES agg
  * registry its plugin extends). Programs are registered by name, mirroring
  * ES stored scripts, and invoked from SQL or `call_function` as
  * `scripted_metric('<program>', input)`.
  *
  * Distribution contract (same as ES): `map` runs where the data lives
  * (partial aggregation), `combine`/state-serialization is what crosses the
  * wire, `finish` runs once per group on the reduced state. State is
  * Java-serialized between stages exactly like ES transports its scripted
  * state between shards, so a program's state must be Serializable. For
  * determinism under Spark's nondeterministic merge order, `combine` must be
  * commutative+associative or `finish` must canonicalize (the built-in demo
  * sorts before reducing).
  *
  * At 100 TB the operator inherits whatever the program's state size is —
  * like ES, a collect-everything map_script is the user's rope; the engine
  * itself adds only the standard partial-agg shuffle of serialized states. */
case class ScriptedMetric(
    child: Expression,
    program: String,
    prog: ScriptedMetric.Program,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[AnyRef] with UnaryLike[Expression] {

  override def dataType: DataType = prog.resultType
  override def nullable: Boolean = true
  override def prettyName: String = s"scripted_metric($program)"

  @transient private lazy val toScala =
    CatalystTypeConverters.createToScalaConverter(child.dataType)
  @transient private lazy val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(prog.resultType)

  override def createAggregationBuffer(): AnyRef = prog.init()

  override def update(buf: AnyRef, input: InternalRow): AnyRef = {
    val v = child.eval(input)
    if (v == null) buf else prog.map(buf, toScala(v))
  }

  override def merge(a: AnyRef, b: AnyRef): AnyRef = prog.combine(a, b)

  override def eval(buf: AnyRef): Any = toCatalyst(prog.finish(buf))

  override def serialize(buf: AnyRef): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new ObjectOutputStream(bos)
    out.writeObject(buf)
    out.close()
    bos.toByteArray
  }

  /** Resolve classes against the context classloader: on a cluster,
    * user-registered Program state classes live in the application jar's
    * classloader, which a bare ObjectInputStream (latest user-defined
    * loader) misses during shuffle-side merge. */
  override def deserialize(bytes: Array[Byte]): AnyRef = {
    val in = new ObjectInputStream(new ByteArrayInputStream(bytes)) {
      override def resolveClass(desc: java.io.ObjectStreamClass): Class[_] =
        try Class.forName(desc.getName, false, Thread.currentThread().getContextClassLoader)
        catch { case _: ClassNotFoundException => super.resolveClass(desc) }
    }
    in.readObject()
  }

  override def withNewMutableAggBufferOffset(o: Int): ScriptedMetric = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ScriptedMetric = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): ScriptedMetric = copy(child = newChild)
}

object ScriptedMetric {

  /** The four scripts plus the declared result type. State flows
    * init → map* → (serialize / combine)* → finish. */
  case class Program(
      init: () => AnyRef,
      map: (AnyRef, Any) => AnyRef,
      combine: (AnyRef, AnyRef) => AnyRef,
      finish: AnyRef => Any,
      resultType: DataType)

  private val programs = new java.util.concurrent.ConcurrentHashMap[String, Program]()

  def register(name: String, p: Program): Unit = programs.put(name, p)

  def forName(name: String, child: Expression): ScriptedMetric = {
    val p = programs.get(name)
    require(p != null, s"unknown scripted_metric program '$name' (registered: ${
      programs.keySet().toArray.mkString(", ")})")
    ScriptedMetric(child, name, p)
  }

  /** Built-in demo program: largest gap (ms) between consecutive values of
    * the input — the classic "what's my worst telemetry outage" scripted
    * metric, inexpressible as a plain metric agg because it needs the whole
    * sorted series per group. map collects, finish sorts + scans; the sort
    * makes the result independent of partition merge order. */
  register("max_gap_ms", Program(
    init = () => mutable.ArrayBuffer.empty[Long],
    map = (s, v) => { s.asInstanceOf[mutable.ArrayBuffer[Long]] += v.asInstanceOf[Long]; s },
    combine = (a, b) => {
      a.asInstanceOf[mutable.ArrayBuffer[Long]] ++= b.asInstanceOf[mutable.ArrayBuffer[Long]]; a
    },
    finish = s => {
      val xs = s.asInstanceOf[mutable.ArrayBuffer[Long]].sorted
      if (xs.length < 2) null
      else {
        var best = 0L
        var i = 1
        while (i < xs.length) {
          val g = xs(i) - xs(i - 1)
          if (g > best) best = g
          i += 1
        }
        best
      }
    },
    resultType = LongType))
}
