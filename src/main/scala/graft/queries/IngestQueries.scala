package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.NetFlowV5

/** Flow-ingestion path: synthesize NetFlow v5 export packets from the
  * events table (per-partition, ≤30 records each — the real wire chunking),
  * then decode them back with the native `parse_netflow_v5` expression and
  * aggregate the decoded records. The oracle recomputes the same aggregate
  * straight from events, so a hash match proves the binary round trip is
  * lossless — header, record layout, unsigned 32-bit times included. */
object IngestQueries {

  case class FlowIn(event_id: Long, user_id: Long, value: Double, rel_first: Long, rel_last: Long)
  case class Packet(bytes: Array[Byte])

  private def q50(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val flows = Flows.df(s, d)
      .repartition(col("event_id"))
      .select(
        col("event_id"), col("user_id"), col("v").as("value"),
        (col("rs") - lit(Flows.JAN_START_MS)).as("rel_first"),
        (col("re") - lit(Flows.JAN_START_MS)).as("rel_last"))
      .as[FlowIn]
    val packets = flows.mapPartitions { it =>
      it.grouped(30).map { group =>
        val fl = group.map { f =>
          NetFlowV5.Flow(
            srcIp = s"10.0.${(f.user_id >> 8) & 0xff}.${f.user_id & 0xff}",
            dstIp = "192.168.0.1",
            srcPort = (f.event_id % 65536).toInt,
            dstPort = 443,
            protocol = (f.event_id % 3) match { case 0 => 6; case 1 => 17; case _ => 1 },
            packets = f.event_id % 100 + 1,
            octets = math.round(f.value),
            firstMs = f.rel_first,
            lastMs = f.rel_last)
        }
        Packet(NetFlowV5.pack(fl, sysUptimeMs = 0L, unixSecs = 1704067200L, flowSequence = 0L))
      }
    }
    packets
      .toDF()
      .select(call_function("parse_netflow_v5", col("bytes")).as("pkt"))
      .select(explode(col("pkt.records")).as("r"))
      .groupBy(col("r.protocol").as("protocol"))
      .agg(
        count(lit(1)).as("n_flows"),
        sum(col("r.octets")).as("total_octets"),
        sum(col("r.packets")).as("total_packets"))
  }

  /** Same round trip through the IPFIX codec: per-partition message packing
    * (template + data sets), template-driven decode, aggregate; the oracle
    * recomputes straight from events. IPFIX carries 64-bit counters and
    * absolute millisecond times, so no unsigned-32 truncation is involved. */
  private def q50b(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val flows = Flows.df(s, d)
      .repartition(col("event_id"))
      .select(col("event_id"), col("user_id"), col("v").as("value"),
        col("rs").as("rel_first"), col("re").as("rel_last"))
      .as[FlowIn]
    val packets = flows.mapPartitions { it =>
      it.grouped(50).map { group =>
        val fl = group.map { f =>
          graft.sources.Ipfix.Flow(
            srcIp = s"10.1.${(f.user_id >> 8) & 0xff}.${f.user_id & 0xff}",
            dstIp = "192.168.0.2",
            srcPort = (f.event_id % 65536).toInt,
            dstPort = 53,
            protocol = (f.event_id % 2) match { case 0 => 6; case _ => 17 },
            packets = f.event_id % 1000 + 1,
            octets = math.round(f.value),
            flowStartMs = f.rel_first,
            flowEndMs = f.rel_last)
        }
        Packet(graft.sources.Ipfix.pack(fl, exportTimeS = 1704067200L, sequence = 0L, domainId = 1L))
      }
    }
    packets
      .toDF()
      .select(call_function("parse_ipfix", col("bytes")).as("msg"))
      .select(explode(col("msg.records")).as("r"))
      .groupBy(col("r.protocol").as("protocol"))
      .agg(
        count(lit(1)).as("n_flows"),
        sum(col("r.octets")).as("total_octets"),
        // flow duration survives the codec: re-derives (event_id % 7200) seconds
        sum(col("r.flow_end_ms") - col("r.flow_start_ms")).as("total_duration_ms"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_netflow_ingest" -> (q50 _),
    "q50b_ipfix_ingest" -> (q50b _))

  val oracleSql: Map[String, String] = Map(
    "q50b_ipfix_ingest" ->
      """SELECT CASE event_id % 2 WHEN 0 THEN 6 ELSE 17 END AS protocol,
        |       COUNT(*) AS n_flows,
        |       CAST(SUM(CAST(round(value) AS BIGINT)) AS BIGINT) AS total_octets,
        |       CAST(SUM((event_id % 7200) * 1000) AS BIGINT) AS total_duration_ms
        |FROM events GROUP BY 1""".stripMargin,
    "q50_netflow_ingest" ->
      """SELECT CASE event_id % 3 WHEN 0 THEN 6 WHEN 1 THEN 17 ELSE 1 END AS protocol,
        |       COUNT(*) AS n_flows,
        |       CAST(SUM(CAST(round(value) AS BIGINT)) AS BIGINT) AS total_octets,
        |       CAST(SUM(event_id % 100 + 1) AS BIGINT) AS total_packets
        |FROM events GROUP BY 1""".stripMargin)
}
