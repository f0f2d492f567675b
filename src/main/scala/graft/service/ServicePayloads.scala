package graft.service

import java.sql.Timestamp

import scala.collection.immutable.ListMap

/** The JSON payload shapes both protocol shells share: the HTTP server
  * (api/main.py:232-331) and the MCP tool server
  * (mcp_server/server.py:265-385) present the SAME engine responses —
  * one builder per response keeps the two surfaces contract-identical. */
private[service] object ServicePayloads {

  val statNames: Seq[String] = Seq("count", "null_count", "mean", "std",
    "min", "25%", "50%", "75%", "max")

  /** Accepts `yyyy-MM-dd[ HH:mm:ss]` with a space or ISO 'T'. */
  def parseTs(s: String): Timestamp =
    try {
      val t = s.replace('T', ' ')
      Timestamp.valueOf(if (t.length == 10) t + " 00:00:00" else t)
    } catch { case _: Exception =>
      throw new IllegalArgumentException(
        s"cannot parse timestamp '$s' (expected yyyy-MM-dd[ HH:mm:ss])")
    }

  def fileInfo(svc: SarService, name: String): ListMap[String, Any] = {
    val fi = svc.fileInfo(name)
    ListMap("name" -> fi.name, "rows" -> fi.rows, "headers" -> fi.headers)
  }

  private def detail(h: HeaderDetail): ListMap[String, Any] =
    ListMap("header" -> h.header, "alias" -> h.alias,
      "device_scoped" -> h.deviceScoped, "devices" -> h.devices)

  def headerDetails(svc: SarService, name: String): Seq[ListMap[String, Any]] =
    svc.headerDetails(name).map(detail)

  def headerDetail(svc: SarService, name: String,
      aliasOrHeader: String): ListMap[String, Any] =
    detail(svc.headerDetail(name, aliasOrHeader))

  def data(svc: SarService, name: String, header: String,
      device: Option[String], start: Option[String], end: Option[String],
      metrics: Seq[String], limit: Int): ListMap[String, Any] = {
    require(limit >= 1, "limit must be >= 1")
    val (table, meta) = svc.getTableWithMeta(name, header, device,
      start.map(parseTs), end.map(parseTs), metrics)
    // one serialization path for JSON records in the whole library:
    // the S11 sink (row cap, truncation flag, canonical date format)
    val (rows, truncated) = svc.jsonRecords(table, limit)
    ListMap("header" -> meta.header, "alias" -> meta.alias,
      "device" -> meta.device, "rows" -> rows.length,
      "truncated" -> truncated, "data" -> rows.map(RawJson))
  }

  def statistics(svc: SarService, name: String, header: String,
      device: Option[String], start: Option[String], end: Option[String],
      metrics: Seq[String]): ListMap[String, Any] = {
    val (stats, meta) = svc.statisticsWithMeta(name, header, device,
      start.map(parseTs), end.map(parseTs), metrics)
    val byMetric = stats.collect().map { r =>
      r.getString(0) -> ListMap(statNames.zipWithIndex.map {
        case (s, i) => s -> (if (r.isNullAt(i + 1)) null else r.get(i + 1))
      }: _*)
    }
    ListMap("header" -> meta.header, "alias" -> meta.alias,
      "device" -> meta.device,
      "statistics" -> ListMap(byMetric.toIndexedSeq: _*))
  }

  def diskUsage(tenants: SarTenants): Seq[ListMap[String, Any]] =
    tenants.diskUsage().map { case (u, bytes, files) =>
      ListMap("username" -> u, "bytes" -> bytes, "files" -> files)
    }
}
