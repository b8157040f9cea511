package graft.sources

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  * (including enterprise-specific ones, RFC 7011 §3.2) are skipped by their
  * declared length — exactly what a real collector does.
  *
  * Template lifetime follows the RFC 7011 §8 session model:
  * - template sets (id 2) and OPTIONS template sets (id 3, scope fields
  *   first) register templates;
  * - a template record with field count 0 WITHDRAWS the template (§8.1);
  * - templates persist across messages within a transport session, so data
  *   sets may arrive in later messages than their template — that state
  *   lives in a [[TemplateCache]], per exporter session.
  * The `parse_ipfix` SQL expression decodes self-contained messages (the
  * file/Kafka-replay common case, strict); [[decodeSession]] decodes a
  * co-partitioned, ordered message stream with cross-message templates (the
  * live-collector case, where data pending an unseen template is dropped). */
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

  /** Decoded data record — every field optional because a template may omit
    * any of the supported IEs. */
  case class Record(
      src_ip: Option[String], dst_ip: Option[String],
      src_port: Option[Int], dst_port: Option[Int], protocol: Option[Int],
      packets: Option[Long], octets: Option[Long],
      flow_start_ms: Option[Long], flow_end_ms: Option[Long])

  /** Decoded message. */
  case class Message(
      version: Int, export_time_s: Long, sequence: Long, domain_id: Long,
      records: Seq[Record])

  /** templateId -> ordered (ieId, length). One cache per transport session
    * (exporter peer + observation domain). */
  type TemplateCache = mutable.Map[Int, IndexedSeq[(Int, Int)]]
  def newTemplateCache(): TemplateCache = mutable.Map.empty

  private val packFields = Seq(
    IE_SRC_IP, IE_DST_IP, IE_SRC_PORT, IE_DST_PORT, IE_PROTO,
    IE_PACKETS, IE_OCTETS, IE_FLOW_START_MS, IE_FLOW_END_MS)

  /** Serialize flows as one IPFIX message: header + template set (id 256)
    * + one data set. Template field order is fixed here but the PARSER
    * derives it from the template set, not from this writer. */
  def pack(flows: Seq[Flow], exportTimeS: Long, sequence: Long, domainId: Long): Array[Byte] =
    packParts(flows, exportTimeS, sequence, domainId, withTemplate = true, withData = true)

  /** Template-only message (no data) — a collector session's opening export. */
  def packTemplateOnly(exportTimeS: Long, sequence: Long, domainId: Long): Array[Byte] =
    packParts(Nil, exportTimeS, sequence, domainId, withTemplate = true, withData = false)

  /** Data-only message — records reference template 256 from an EARLIER
    * message in the session. */
  def packDataOnly(flows: Seq[Flow], exportTimeS: Long, sequence: Long, domainId: Long): Array[Byte] =
    packParts(flows, exportTimeS, sequence, domainId, withTemplate = false, withData = true)

  private def packParts(
      flows: Seq[Flow], exportTimeS: Long, sequence: Long, domainId: Long,
      withTemplate: Boolean, withData: Boolean): Array[Byte] = {
    val recLen = packFields.map(ieLength).sum
    val tmplSetLen = if (withTemplate) 4 + 4 + 4 * packFields.size else 0
    val dataSetLen = if (withData) 4 + recLen * flows.size else 0
    val totalLen = 16 + tmplSetLen + dataSetLen
    val buf = ByteBuffer.allocate(totalLen)
    // message header
    buf.putShort(10.toShort)
    buf.putShort(totalLen.toShort)
    buf.putInt(exportTimeS.toInt)
    buf.putInt(sequence.toInt)
    buf.putInt(domainId.toInt)
    if (withTemplate) {
      // template set (set id 2)
      buf.putShort(2.toShort)
      buf.putShort(tmplSetLen.toShort)
      buf.putShort(256.toShort) // template id
      buf.putShort(packFields.size.toShort)
      packFields.foreach { ie =>
        buf.putShort(ie.toShort)
        buf.putShort(ieLength(ie).toShort)
      }
    }
    if (withData) {
      // data set (set id = template id)
      buf.putShort(256.toShort)
      buf.putShort(dataSetLen.toShort)
      flows.foreach { f =>
        buf.putInt(Ip.toInt(f.srcIp))
        buf.putInt(Ip.toInt(f.dstIp))
        buf.putShort(f.srcPort.toShort)
        buf.putShort(f.dstPort.toShort)
        buf.put(f.protocol.toByte)
        buf.putLong(f.packets)
        buf.putLong(f.octets)
        buf.putLong(f.flowStartMs)
        buf.putLong(f.flowEndMs)
      }
    }
    buf.array()
  }

  /** Read one template-record field list: `count` (ie, len) specs, skipping
    * the 4-byte enterprise number when the enterprise bit is set
    * (RFC 7011 §3.2 — enterprise IEs are opaque to this collector, the
    * length still drives the data-record walk). Enterprise IEs are stored
    * with a -1 sentinel id: they live in a separate namespace, so a vendor
    * element whose low 15 bits happen to equal a supported IANA id (e.g.
    * 0x8000|1 vs octetDeltaCount) must NOT decode as that standard field. */
  private def readFieldSpecs(buf: ByteBuffer, count: Int, setEnd: Int): IndexedSeq[(Int, Int)] =
    (1 to count).map { _ =>
      // bound every spec read by the enclosing set: a corrupt/hostile
      // template declaring a large fieldCount must not read into the bytes
      // of subsequent sets (the later buf.position(setEnd) would mask it)
      if (buf.position() + 4 > setEnd)
        throw new IllegalArgumentException(
          s"IPFIX template truncated/invalid: field spec at ${buf.position()} exceeds set end $setEnd")
      val rawIe = buf.getShort() & 0xffff
      val len = buf.getShort() & 0xffff
      if ((rawIe & 0x8000) != 0) {
        if (buf.position() + 4 > setEnd)
          throw new IllegalArgumentException(
            s"IPFIX template truncated/invalid: enterprise number at ${buf.position()} exceeds set end $setEnd")
        buf.getInt() // enterprise number — skip
        (-1, len)
      } else (rawIe, len)
    }

  /** Decode one IPFIX message against (and into) `templates`.
    *
    * `strict=true` (self-contained expression path): a data set referencing
    * an unknown template throws. `strict=false` (session path): it is
    * skipped — the collector behavior for data arriving before its
    * template. */
  def decode(bytes: Array[Byte], templates: TemplateCache, strict: Boolean): Message = {
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

    val records = mutable.ArrayBuffer.empty[Record]

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
        // template set: may hold several templates; field count 0 withdraws
        // the template (RFC 7011 §8.1)
        while (buf.position() + 4 <= setEnd) {
          val tmplId = buf.getShort() & 0xffff
          val fieldCount = buf.getShort() & 0xffff
          if (fieldCount == 0) templates.remove(tmplId)
          else templates(tmplId) = readFieldSpecs(buf, fieldCount, setEnd)
        }
        buf.position(setEnd)
      } else if (setId == 3) {
        // OPTIONS template set (RFC 7011 §3.4.2): template id, total field
        // count, scope field count, then scope+option field specs. Scope
        // fields are ordinary (ie, len) specs for decoding purposes. A
        // 4-byte guard (not 6) so a trailing withdrawal record — id +
        // field count 0, no scope count — is still processed (§8.1).
        while (buf.position() + 4 <= setEnd) {
          val tmplId = buf.getShort() & 0xffff
          val fieldCount = buf.getShort() & 0xffff
          if (fieldCount == 0) templates.remove(tmplId)
          else {
            if (buf.position() + 2 > setEnd)
              throw new IllegalArgumentException(
                s"IPFIX options template $tmplId truncated: missing scope field count")
            buf.getShort() // scope field count — layout only, not needed to walk records
            templates(tmplId) = readFieldSpecs(buf, fieldCount, setEnd)
          }
        }
        buf.position(setEnd)
      } else if (setId >= 256) {
        templates.get(setId) match {
          case None if strict =>
            throw new IllegalArgumentException(s"IPFIX data set $setId references unknown template")
          case None =>
            buf.position(setEnd) // data before template: drop (collector behavior)
          case Some(tmpl) =>
            // 65535 declares a VARIABLE-length field (RFC 7011 §7): the data
            // record carries a 1-byte length, or 255 + 2-byte length for the
            // long form. The minimal record size counts 1 byte per varlen
            // field; the walk stops when less than that remains (padding).
            val minLen = tmpl.map { case (_, l) => if (l == 65535) 1 else l }.sum
            while (minLen > 0 && buf.position() + minLen <= setEnd) {
              var srcIp: Option[String] = None
              var dstIp: Option[String] = None
              var srcPort: Option[Int] = None
              var dstPort: Option[Int] = None
              var proto: Option[Int] = None
              var packets: Option[Long] = None
              var octets: Option[Long] = None
              var fStart: Option[Long] = None
              var fEnd: Option[Long] = None
              tmpl.foreach { case (ie, len) =>
                // every read is bounded by the set: once a varlen field makes
                // record length dynamic, the minLen loop guard alone no longer
                // proves later FIXED fields fit — a short varlen payload must
                // not let getLong() read into the next set
                def ensure(n: Int): Unit =
                  if (buf.position() + n > setEnd)
                    throw new IllegalArgumentException(
                      s"IPFIX data record truncated: field of $n bytes at ${buf.position()} exceeds set end $setEnd")
                if (len != 65535) ensure(len)
                ie match {
                  case IE_SRC_IP if len == 4 => srcIp = Some(Ip.toStr(buf.getInt()))
                  case IE_DST_IP if len == 4 => dstIp = Some(Ip.toStr(buf.getInt()))
                  case IE_SRC_PORT if len == 2 => srcPort = Some(buf.getShort() & 0xffff)
                  case IE_DST_PORT if len == 2 => dstPort = Some(buf.getShort() & 0xffff)
                  case IE_PROTO if len == 1 => proto = Some(buf.get() & 0xff)
                  case IE_PACKETS if len == 8 => packets = Some(buf.getLong())
                  case IE_OCTETS if len == 8 => octets = Some(buf.getLong())
                  case IE_FLOW_START_MS if len == 8 => fStart = Some(buf.getLong())
                  case IE_FLOW_END_MS if len == 8 => fEnd = Some(buf.getLong())
                  case _ =>
                    // unknown fixed-length IE, or any varlen IE (the
                    // supported flow IEs are all fixed-width numerics):
                    // resolve the actual length, bounds-check, skip
                    val actual =
                      if (len == 65535) {
                        ensure(1)
                        val b0 = buf.get() & 0xff
                        if (b0 < 255) b0 else { ensure(2); buf.getShort() & 0xffff }
                      } else len
                    ensure(actual)
                    buf.position(buf.position() + actual)
                }
              }
              records += Record(srcIp, dstIp, srcPort, dstPort, proto, packets, octets, fStart, fEnd)
            }
            buf.position(setEnd)
        }
      } else {
        buf.position(setEnd) // other set ids (reserved) — skip
      }
    }
    Message(version, exportTime, sequence, domain, records.toSeq)
  }

  /** Self-contained decode (templates must precede their data within THIS
    * message) → Catalyst InternalRow matching [[messageType]]. Called from
    * both eval paths of [[ParseIpfix]] (Scala objects emit static
    * forwarders, so generated Java calls this directly). */
  def parseSelfContained(bytes: Array[Byte]): InternalRow = {
    val msg = decode(bytes, newTemplateCache(), strict = true)
    toInternal(msg)
  }

  private def toInternal(msg: Message): InternalRow = {
    val rows = msg.records.map { r =>
      InternalRow(
        r.src_ip.map(UTF8String.fromString).orNull,
        r.dst_ip.map(UTF8String.fromString).orNull,
        r.src_port.map(Integer.valueOf).orNull,
        r.dst_port.map(Integer.valueOf).orNull,
        r.protocol.map(Integer.valueOf).orNull,
        r.packets.map(java.lang.Long.valueOf).orNull,
        r.octets.map(java.lang.Long.valueOf).orNull,
        r.flow_start_ms.map(java.lang.Long.valueOf).orNull,
        r.flow_end_ms.map(java.lang.Long.valueOf).orNull)
    }
    InternalRow(
      msg.version, msg.export_time_s, msg.sequence, msg.domain_id,
      new GenericArrayData(rows.toArray[Any]))
  }

  /** Cross-message template resolution over one transport session's ordered
    * messages (RFC 7011 §8: templates apply until redefined/withdrawn within
    * the session). Callers co-partition by exporter (peer + domain_id) and
    * order by export time — `repartition(domain).sortWithinPartitions(seq)`,
    * the Spark shape of a collector's per-peer session — then decode with
    * `mapPartitions(Ipfix.decodeSession)`. Data sets whose template hasn't
    * arrived yet are dropped, as a live collector does. */
  def decodeSession(messages: Iterator[Array[Byte]]): Iterator[Message] = {
    val cache = newTemplateCache()
    messages.map(b => decode(b, cache, strict = false))
  }
}

/** parse_ipfix(message_binary) → typed message struct (template-driven,
  * self-contained messages). Generates code: one static kernel call keeps
  * the surrounding stage in whole-stage codegen. */
case class ParseIpfix(child: Expression) extends UnaryExpression {
  override def dataType: DataType = Ipfix.messageType
  override def nullSafeEval(input: Any): Any =
    Ipfix.parseSelfContained(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.sources.Ipfix.parseSelfContained($c);")
  override protected def withNewChildInternal(newChild: Expression): ParseIpfix = copy(child = newChild)
}
