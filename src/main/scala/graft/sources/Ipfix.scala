package graft.sources

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** IPFIX (RFC 7011, public) message codec — the reference stack's other
  * ingest format. Unlike NetFlow v5's fixed layout, IPFIX is TEMPLATE
  * driven: a message carries template sets (field id + length lists) and
  * data sets whose records are decoded against the template they name.
  *
  * This parser handles the flow-record information elements the Drift
  * pipeline consumes (IANA IE ids): octetDeltaCount(1), packetDeltaCount(2),
  * protocolIdentifier(4), sourceTransportPort(7), sourceIPv4Address(8),
  * destinationTransportPort(11), destinationIPv4Address(12),
  * flowStartMilliseconds(152), flowEndMilliseconds(153). Unknown elements
  * are skipped by their declared length — exactly what a real collector
  * does. Templates are resolved within the message (self-contained export),
  * the common case for file/Kafka replay. */
object Ipfix {

  val IE_OCTETS = 1
  val IE_PACKETS = 2
  val IE_PROTO = 4
  val IE_SRC_PORT = 7
  val IE_SRC_IP = 8
  val IE_DST_PORT = 11
  val IE_DST_IP = 12
  val IE_FLOW_START_MS = 152
  val IE_FLOW_END_MS = 153

  val recordType: StructType = StructType(Seq(
    StructField("src_ip", StringType, nullable = true),
    StructField("dst_ip", StringType, nullable = true),
    StructField("src_port", IntegerType, nullable = true),
    StructField("dst_port", IntegerType, nullable = true),
    StructField("protocol", IntegerType, nullable = true),
    StructField("packets", LongType, nullable = true),
    StructField("octets", LongType, nullable = true),
    StructField("flow_start_ms", LongType, nullable = true),
    StructField("flow_end_ms", LongType, nullable = true)))

  val messageType: StructType = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("export_time_s", LongType, nullable = false),
    StructField("sequence", LongType, nullable = false),
    StructField("domain_id", LongType, nullable = false),
    StructField("records", ArrayType(recordType, containsNull = false), nullable = false)))

  /** Standard field lengths for the supported IEs. */
  private val ieLength: Map[Int, Int] = Map(
    IE_OCTETS -> 8, IE_PACKETS -> 8, IE_PROTO -> 1,
    IE_SRC_PORT -> 2, IE_SRC_IP -> 4, IE_DST_PORT -> 2, IE_DST_IP -> 4,
    IE_FLOW_START_MS -> 8, IE_FLOW_END_MS -> 8)

  case class Flow(
      srcIp: String, dstIp: String, srcPort: Int, dstPort: Int, protocol: Int,
      packets: Long, octets: Long, flowStartMs: Long, flowEndMs: Long)

  private def ipToInt(ip: String): Int = {
    val p = ip.split('.')
    ((p(0).toInt & 0xff) << 24) | ((p(1).toInt & 0xff) << 16) | ((p(2).toInt & 0xff) << 8) | (p(3).toInt & 0xff)
  }

  /** Serialize flows as one IPFIX message: header + template set (id 256)
    * + one data set. Template field order is fixed here but the PARSER
    * derives it from the template set, not from this writer. */
  def pack(flows: Seq[Flow], exportTimeS: Long, sequence: Long, domainId: Long): Array[Byte] = {
    val fields = Seq(
      IE_SRC_IP, IE_DST_IP, IE_SRC_PORT, IE_DST_PORT, IE_PROTO,
      IE_PACKETS, IE_OCTETS, IE_FLOW_START_MS, IE_FLOW_END_MS)
    val recLen = fields.map(ieLength).sum
    val tmplSetLen = 4 + 4 + 4 * fields.size
    val dataSetLen = 4 + recLen * flows.size
    val totalLen = 16 + tmplSetLen + dataSetLen
    val buf = ByteBuffer.allocate(totalLen)
    // message header
    buf.putShort(10.toShort)
    buf.putShort(totalLen.toShort)
    buf.putInt(exportTimeS.toInt)
    buf.putInt(sequence.toInt)
    buf.putInt(domainId.toInt)
    // template set (set id 2)
    buf.putShort(2.toShort)
    buf.putShort(tmplSetLen.toShort)
    buf.putShort(256.toShort) // template id
    buf.putShort(fields.size.toShort)
    fields.foreach { ie =>
      buf.putShort(ie.toShort)
      buf.putShort(ieLength(ie).toShort)
    }
    // data set (set id = template id)
    buf.putShort(256.toShort)
    buf.putShort(dataSetLen.toShort)
    flows.foreach { f =>
      buf.putInt(ipToInt(f.srcIp))
      buf.putInt(ipToInt(f.dstIp))
      buf.putShort(f.srcPort.toShort)
      buf.putShort(f.dstPort.toShort)
      buf.put(f.protocol.toByte)
      buf.putLong(f.packets)
      buf.putLong(f.octets)
      buf.putLong(f.flowStartMs)
      buf.putLong(f.flowEndMs)
    }
    buf.array()
  }
}

/** parse_ipfix(message_binary) → typed message struct (template-driven). */
case class ParseIpfix(child: Expression) extends UnaryExpression with CodegenFallback {
  import Ipfix._

  override def dataType: DataType = messageType

  private def intToIp(v: Int): String =
    s"${(v >>> 24) & 0xff}.${(v >>> 16) & 0xff}.${(v >>> 8) & 0xff}.${v & 0xff}"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length < 16) {
      throw new IllegalArgumentException(s"IPFIX message too short: ${bytes.length} bytes")
    }
    val buf = ByteBuffer.wrap(bytes)
    val version = buf.getShort() & 0xffff
    val msgLen = buf.getShort() & 0xffff
    if (version != 10) {
      throw new IllegalArgumentException(s"not an IPFIX message: version $version")
    }
    if (msgLen > bytes.length) {
      throw new IllegalArgumentException(
        s"IPFIX message truncated: header declares $msgLen bytes, got ${bytes.length}")
    }
    val exportTime = buf.getInt() & 0xffffffffL
    val sequence = buf.getInt() & 0xffffffffL
    val domain = buf.getInt() & 0xffffffffL

    // templateId -> ordered (ieId, length)
    val templates = mutable.Map.empty[Int, Seq[(Int, Int)]]
    val records = mutable.ArrayBuffer.empty[Any]

    while (buf.position() + 4 <= msgLen) {
      val setId = buf.getShort() & 0xffff
      val setLen = buf.getShort() & 0xffff
      val setEnd = buf.position() + setLen - 4
      // forward-progress guard: setLen < 4 would move the cursor BACKWARD
      // (infinite loop on corrupt/hostile input); setEnd past the declared
      // message length is equally invalid — fail loudly like the NetFlow
      // parser does
      if (setLen < 4 || setEnd > msgLen) {
        throw new IllegalArgumentException(
          s"IPFIX set truncated/invalid: setId=$setId setLen=$setLen at ${buf.position() - 4}")
      }
      if (setId == 2) {
        // template set: may hold several templates
        while (buf.position() + 4 <= setEnd) {
          val tmplId = buf.getShort() & 0xffff
          val fieldCount = buf.getShort() & 0xffff
          val fields = (1 to fieldCount).map { _ =>
            (buf.getShort() & 0xffff, buf.getShort() & 0xffff)
          }
          templates(tmplId) = fields
        }
      } else if (setId >= 256) {
        val tmpl = templates.getOrElse(setId,
          throw new IllegalArgumentException(s"IPFIX data set $setId references unknown template"))
        val recLen = tmpl.map(_._2).sum
        while (buf.position() + recLen <= setEnd) {
          var srcIp: UTF8String = null
          var dstIp: UTF8String = null
          var srcPort: Any = null
          var dstPort: Any = null
          var proto: Any = null
          var packets: Any = null
          var octets: Any = null
          var fStart: Any = null
          var fEnd: Any = null
          tmpl.foreach { case (ie, len) =>
            ie match {
              case IE_SRC_IP if len == 4 => srcIp = UTF8String.fromString(intToIp(buf.getInt()))
              case IE_DST_IP if len == 4 => dstIp = UTF8String.fromString(intToIp(buf.getInt()))
              case IE_SRC_PORT if len == 2 => srcPort = Integer.valueOf(buf.getShort() & 0xffff)
              case IE_DST_PORT if len == 2 => dstPort = Integer.valueOf(buf.getShort() & 0xffff)
              case IE_PROTO if len == 1 => proto = Integer.valueOf(buf.get() & 0xff)
              case IE_PACKETS if len == 8 => packets = java.lang.Long.valueOf(buf.getLong())
              case IE_OCTETS if len == 8 => octets = java.lang.Long.valueOf(buf.getLong())
              case IE_FLOW_START_MS if len == 8 => fStart = java.lang.Long.valueOf(buf.getLong())
              case IE_FLOW_END_MS if len == 8 => fEnd = java.lang.Long.valueOf(buf.getLong())
              case _ => buf.position(buf.position() + len) // skip unknown IE
            }
          }
          records += InternalRow(srcIp, dstIp, srcPort, dstPort, proto, packets, octets, fStart, fEnd)
        }
        buf.position(setEnd)
      } else {
        buf.position(setEnd) // options templates etc. — skip
      }
    }
    InternalRow(version, exportTime, sequence, domain, new GenericArrayData(records.toArray))
  }

  override protected def withNewChildInternal(newChild: Expression): ParseIpfix = copy(child = newChild)
}
