package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 batch source for raw NetFlow v5 spool files:
  * `spark.read.format("graft.sources.NetFlowDataSource").load(dir)` reads
  * every file in the directory as a concatenated stream of v5 export
  * packets (self-delimiting: the 24-byte header declares the record count)
  * and emits ONE ROW PER FLOW RECORD, flattened with its packet header
  * context — the front door a collector spool has on a cluster.
  *
  * Scale shape: one input partition per spool file (a 1000-executor scan
  * assigns files to tasks exactly like the built-in file sources), and
  * column pruning is pushed into the reader (SupportsPushDownRequiredColumns)
  * so a 2-column aggregate never materializes the other ten. The decode
  * reuses [[NetFlowV5.parse]] — the same kernel the `parse_netflow_v5`
  * expression generates code against. */
class NetFlowDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NetFlowDataSource.flowSchema
  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new NetFlowTable(properties.get("path"))
}

object NetFlowDataSource {
  /** One flow record + its packet header context. */
  val flowSchema: StructType = StructType(
    Seq(
      StructField("unix_secs", LongType, nullable = false),
      StructField("flow_sequence", LongType, nullable = false)) ++
      NetFlowV5.recordType.fields)
}

private[sources] class NetFlowTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"netflow5:$path"
  override def schema(): StructType = NetFlowDataSource.flowSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NetFlowScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new NetFlowWriteBuilder(path, info)
}

/** Write side of the spool format: each task packs its rows into v5 export
  * packets (≤30 records each, the wire chunking) and lands one spool file.
  * Tasks write to `_tmp_`-prefixed files and the job commit renames them,
  * so a failed/speculative task never leaves a half-visible file — the same
  * rename-on-commit protocol the built-in file sources use. `truncate`
  * (SaveMode.Overwrite) clears the directory first. */
private[sources] class NetFlowWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new NetFlowBatchWrite(path, info.schema(), doTruncate)
  }
}

private[sources] case class NetFlowFileCommit(tmpPath: String, finalPath: String)
    extends WriterCommitMessage

private[sources] class NetFlowBatchWrite(path: String, schema: StructType, doTruncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(dir)
    if (doTruncate) {
      val stream = java.nio.file.Files.list(dir)
      try stream.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
        .foreach(java.nio.file.Files.delete)
      finally stream.close()
    }
    new NetFlowWriterFactory(path, schema)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach { case NetFlowFileCommit(tmp, fin) =>
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(fin),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case NetFlowFileCommit(tmp, _) =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(tmp)): Unit
      case _ => ()
    }
}

private[sources] class NetFlowWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new NetFlowDataWriter(path, schema, partitionId, taskId)
}

private[sources] class NetFlowDataWriter(
    path: String, schema: StructType, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  // taskId is unique across jobs within the application, so append writes
  // from a later job never rename over an earlier job's files
  private val fin = s"$path/part-$partitionId-$taskId.nf5"
  private val tmp = s"$path/_tmp_part-$partitionId-$taskId.nf5"
  private val idx = NetFlowDataSource.flowSchema.fields.map(f => schema.fieldIndex(f.name))
  private val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(tmp), 1 << 16)
  private val buf = scala.collection.mutable.ArrayBuffer.empty[NetFlowV5.Flow]
  private var unixSecs = 0L
  private var flowSeq = 0L

  private def flush(): Unit = if (buf.nonEmpty) {
    out.write(NetFlowV5.pack(buf.toSeq, sysUptimeMs = 0L, unixSecs = unixSecs, flowSequence = flowSeq))
    buf.clear()
  }

  override def write(row: InternalRow): Unit = {
    // row layout follows the logical write schema; idx maps it to the
    // canonical flowSchema order (unix_secs, flow_sequence, then record).
    // unix_secs/flow_sequence live in the PACKET header, so a mid-buffer
    // change must flush the open packet first — otherwise differing per-row
    // header values silently collapse to the first row's on a write-read
    // round trip
    val rowSecs = row.getLong(idx(0))
    val rowSeq = row.getLong(idx(1))
    if (buf.nonEmpty && (rowSecs != unixSecs || rowSeq != flowSeq)) flush()
    if (buf.isEmpty) {
      unixSecs = rowSecs
      flowSeq = rowSeq
    }
    buf += NetFlowV5.Flow(
      srcIp = row.getUTF8String(idx(2)).toString,
      dstIp = row.getUTF8String(idx(3)).toString,
      srcPort = row.getInt(idx(4)),
      dstPort = row.getInt(idx(5)),
      protocol = row.getInt(idx(6)),
      tcpFlags = row.getInt(idx(7)),
      packets = row.getLong(idx(8)),
      octets = row.getLong(idx(9)),
      firstMs = row.getLong(idx(10)),
      lastMs = row.getLong(idx(11)))
    if (buf.size == 30) flush()
  }

  override def commit(): WriterCommitMessage = {
    flush(); out.close()
    NetFlowFileCommit(tmp, fin)
  }
  override def abort(): Unit = {
    out.close()
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(tmp)): Unit
  }
  override def close(): Unit = ()
}

private[sources] class NetFlowScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._
  private var required: StructType = NetFlowDataSource.flowSchema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  /** Comparisons on the numeric flow fields evaluate EXACTLY inside the
    * reader (before row materialization), so they are fully handled here
    * and Spark drops its post-scan re-evaluation. Everything else stays
    * residual. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition(NetFlowFilterEval.supported)
    pushed = sup
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new NetFlowScan(path, required, pushed)
}

private[sources] object NetFlowFilterEval {
  import org.apache.spark.sql.sources._
  private val numericFields =
    Set("src_port", "dst_port", "protocol", "tcp_flags", "packets", "octets",
      "first_ms", "last_ms", "unix_secs", "flow_sequence")
  // only integral values compare exactly under longValue — a fractional
  // literal (LessThan(port, 80.5)) would silently truncate, and a pushed
  // filter is never re-checked by Spark, so reject non-integral types
  private def integral(v: Any): Boolean = v match {
    case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short | _: java.lang.Byte => true
    case _ => false
  }
  def supported(f: Filter): Boolean = f match {
    case EqualTo(a, v) => numericFields(a) && integral(v)
    case In(a, vs) => numericFields(a) && vs.nonEmpty && vs.forall(integral)
    case GreaterThan(a, v) => numericFields(a) && integral(v)
    case GreaterThanOrEqual(a, v) => numericFields(a) && integral(v)
    case LessThan(a, v) => numericFields(a) && integral(v)
    case LessThanOrEqual(a, v) => numericFields(a) && integral(v)
    case _ => false
  }
  /** full: row values laid out as [[NetFlowDataSource.flowSchema]]. */
  def eval(f: Filter, full: Array[Any]): Boolean = {
    def num(a: String): Long = {
      val i = NetFlowDataSource.flowSchema.fieldIndex(a)
      full(i) match { case l: java.lang.Long => l; case n: java.lang.Integer => n.longValue }
    }
    f match {
      case EqualTo(a, v: Number) => num(a) == v.longValue
      case In(a, vs) => vs.exists(v => num(a) == v.asInstanceOf[Number].longValue)
      case GreaterThan(a, v: Number) => num(a) > v.longValue
      case GreaterThanOrEqual(a, v: Number) => num(a) >= v.longValue
      case LessThan(a, v: Number) => num(a) < v.longValue
      case LessThanOrEqual(a, v: Number) => num(a) <= v.longValue
      case _ => true
    }
  }
}

private[sources] case class NetFlowFilePartition(file: String) extends InputPartition

private[sources] class NetFlowScan(
    path: String, required: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"netflow5 PushedFilters: [${pushed.mkString(", ")}], ReadSchema: ${required.simpleString}"
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = java.nio.file.Paths.get(path)
    val files =
      if (java.nio.file.Files.isDirectory(dir)) {
        val stream = java.nio.file.Files.list(dir)
        // skip the writer's _tmp_ files: a crash-orphaned or concurrently
        // written temp file must never corrupt reads (only renamed-on-commit
        // files are data)
        try stream.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .filterNot(_.getFileName.toString.startsWith("_tmp_"))
          .map(_.toString).toArray.sorted
        finally stream.close()
      } else Array(path)
    files.map(f => NetFlowFilePartition(f): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new NetFlowReaderFactory(required, pushed)
}

private[sources] class NetFlowReaderFactory(
    required: StructType, pushed: Array[org.apache.spark.sql.sources.Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new NetFlowPartitionReader(
      partition.asInstanceOf[NetFlowFilePartition].file, required, pushed)
}

/** Streams one spool file packet by packet; flattens each packet's records.
  * Projection to the pruned schema happens here, per row. */
private[sources] class NetFlowPartitionReader(
    file: String, required: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter])
    extends PartitionReader[InternalRow] {

  // Incremental read: 24-byte header, then count*48 record bytes per packet.
  // Per-task memory is one packet (<= 24 + 48*65535 bytes), not the file size.
  private val in = new java.io.BufferedInputStream(
    java.nio.file.Files.newInputStream(java.nio.file.Paths.get(file)), 1 << 16)
  private var offset = 0L // consumed bytes, for error messages only
  private val colIdx = required.fields.map(f => NetFlowDataSource.flowSchema.fieldIndex(f.name))
  private var packet: InternalRow = _
  private var records: org.apache.spark.sql.catalyst.util.ArrayData = _
  private var recIdx = 0
  private var current: InternalRow = _

  /** Reads exactly n bytes into buf at [at, at+n), or throws; returns false at clean EOF
    * (only legal when at == 0). */
  private def readFully(buf: Array[Byte], at: Int, n: Int): Boolean = {
    var got = 0
    while (got < n) {
      val r = in.read(buf, at + got, n - got)
      if (r < 0) {
        if (got == 0 && at == 0) return false
        throw new IllegalArgumentException(
          s"NetFlow spool $file: truncated packet at offset $offset " +
            s"(needed ${n - got} more bytes)")
      }
      got += r
    }
    true
  }

  override def next(): Boolean = {
    while (true) { // loop, not recursion: a mostly-filtered file must not grow the stack
      while (packet == null || recIdx >= records.numElements()) {
        val header = new Array[Byte](24)
        if (!readFully(header, 0, 24)) return false
        val count = ((header(2) & 0xff) << 8) | (header(3) & 0xff)
        val pktLen = 24 + 48 * count
        val pkt = java.util.Arrays.copyOf(header, pktLen)
        readFully(pkt, 24, pktLen - 24)
        packet = NetFlowV5.parse(pkt)
        records = packet.getArray(5)
        recIdx = 0
        offset += pktLen
      }
      val r = records.getStruct(recIdx, NetFlowV5.recordType.length)
      recIdx += 1
      // full row layout: unix_secs, flow_sequence, then the 10 record fields
      val full = new Array[Any](2 + NetFlowV5.recordType.length)
      full(0) = packet.getLong(3)
      full(1) = packet.getLong(4)
      var i = 0
      while (i < NetFlowV5.recordType.length) {
        full(2 + i) = r.get(i, NetFlowV5.recordType.fields(i).dataType)
        i += 1
      }
      // pushed filters evaluate here, before projection/materialization
      if (pushed.forall(NetFlowFilterEval.eval(_, full))) {
        val projected = new Array[Any](colIdx.length)
        i = 0
        while (i < colIdx.length) { projected(i) = full(colIdx(i)); i += 1 }
        current = new GenericInternalRow(projected)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
