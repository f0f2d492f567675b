package graft.service

import java.io.{BufferedReader, InputStream, InputStreamReader, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.immutable.ListMap

/** MCP (Model Context Protocol) stdio shell: the reference exposes the
  * engine to LLM agents as MCP tools that proxy its HTTP API
  * (mcp_server/server.py:265-385); this serves the same tool surface
  * straight off [[SarTenants]] — newline-delimited JSON-RPC 2.0 over
  * stdio, zero dependencies (the MCP stdio transport is exactly that).
  *
  * Tool results carry the SAME payload shapes as the HTTP shell
  * ([[ServicePayloads]] is shared), rendered as JSON text content. Auth
  * tools (login/logout/whoami/create_user) are out of scope per SURVEY
  * §7.5 — each tool takes an optional `username` standing in for the
  * reference's per-session credentials; chart tools are presentation,
  * also scoped out.
  *
  * Protocol errors (unknown method, malformed request) are JSON-RPC
  * errors; tool execution failures are `isError: true` results with the
  * message as text content, per the MCP spec.
  */
class SarMcpServer(tenants: SarTenants, serverName: String = "graft-sar") {

  /** Serve until EOF: one JSON-RPC message per line in, one per line out
    * (notifications produce no output). */
  def serve(in: InputStream, out: OutputStream): Unit = {
    val reader = new BufferedReader(new InputStreamReader(in, UTF_8))
    Iterator.continually(reader.readLine()).takeWhile(_ != null)
      .filter(_.trim.nonEmpty)
      .foreach { line =>
        handleLine(line).foreach { resp =>
          out.write((resp + "\n").getBytes(UTF_8)); out.flush()
        }
      }
  }

  /** One message in, optional response out (None for notifications). */
  def handleLine(line: String): Option[String] = {
    val (id, result) = try {
      val msg = JsonParse.parse(line).asInstanceOf[Map[String, Any]]
      val id = msg.get("id")
      try (id, Right(dispatch(msg)))
      catch { case e: Exception => (id, Left((-32603L, message(e)))) }
    } catch { case e: Exception =>
      (None, Left((-32700L, s"parse error: ${message(e)}")))
    }
    result match {
      case Right(None) => None // notification
      case Right(Some(r)) => Some(Json.render(ListMap(
        "jsonrpc" -> "2.0", "id" -> RawJson(renderId(id)), "result" -> r)))
      case Left((code, msg)) => Some(Json.render(ListMap(
        "jsonrpc" -> "2.0", "id" -> RawJson(renderId(id)),
        "error" -> ListMap("code" -> code, "message" -> msg))))
    }
  }

  private def renderId(id: Option[Any]): String =
    id.map(Json.render).getOrElse("null")

  private def message(e: Throwable): String =
    Option(e.getMessage).getOrElse(e.getClass.getSimpleName)

  /** Returns Some(result) for requests, None for notifications. */
  private def dispatch(msg: Map[String, Any]): Option[Any] = {
    val params = msg.getOrElse("params", Map.empty)
      .asInstanceOf[Map[String, Any]]
    msg.getOrElse("method", "").toString match {
      case "initialize" => Some(ListMap(
        "protocolVersion" ->
          params.getOrElse("protocolVersion", "2025-06-18"),
        "capabilities" -> ListMap("tools" -> ListMap.empty[String, Any]),
        "serverInfo" -> ListMap("name" -> serverName, "version" -> "1.0")))
      case "ping" => Some(ListMap.empty[String, Any])
      case "tools/list" => Some(ListMap("tools" -> tools.map {
        case (name, desc, schema, _) => ListMap("name" -> name,
          "description" -> desc, "inputSchema" -> schema)
      }))
      case "tools/call" =>
        val name = params.getOrElse("name", "").toString
        val args = params.getOrElse("arguments", Map.empty)
          .asInstanceOf[Map[String, Any]]
        val fn = tools.find(_._1 == name).map(_._4).getOrElse(
          throw new IllegalArgumentException(s"unknown tool '$name'"))
        Some(try {
          ListMap("content" -> Seq(ListMap("type" -> "text",
            "text" -> Json.render(fn(args)))), "isError" -> false)
        } catch { case e: Exception =>
          // tool failures are results, not protocol errors (MCP spec)
          ListMap("content" -> Seq(ListMap("type" -> "text",
            "text" -> message(e))), "isError" -> true)
        })
      case m if m.startsWith("notifications/") => None
      case m => throw new IllegalArgumentException(s"method not found: $m")
    }
  }

  // ---- tool table ----------------------------------------------------

  private def str(args: Map[String, Any], k: String): Option[String] =
    args.get(k).collect { case v if v != null => v.toString }
  private def req(args: Map[String, Any], k: String): String =
    str(args, k).getOrElse(
      throw new IllegalArgumentException(s"argument '$k' is required"))
  private def int(args: Map[String, Any], k: String, dflt: Int): Int =
    args.get(k).map(v => v.toString.toDouble.toInt).getOrElse(dflt)
  private def bool(args: Map[String, Any], k: String, dflt: Boolean): Boolean =
    args.get(k).map(_.toString.toBoolean).getOrElse(dflt)
  private def svc(args: Map[String, Any]): SarService =
    tenants.forUser(str(args, "username").getOrElse("default"))

  private def schema(required: Seq[String], props: (String, String)*) =
    ListMap("type" -> "object",
      "properties" -> ListMap(props.map { case (k, t) =>
        k -> ListMap("type" -> t) }: _*),
      "required" -> required)

  private def metrics(args: Map[String, Any]): Seq[String] =
    str(args, "metric").toSeq.flatMap(_.split(",")).filter(_.nonEmpty)

  /** (name, description, input schema, implementation) — names and
    * semantics mirror mcp_server/server.py's engine tools. */
  private val tools: Seq[(String, String, Any, Map[String, Any] => Any)] =
    Seq(
      ("list_sar_files", "List the uploaded SAR files.",
        schema(Nil, "username" -> "string"),
        args => ListMap("files" -> svc(args).listFiles())),
      ("upload_sar_file",
        "Upload a SAR report (sar text or sadf -j JSON) under a name.",
        schema(Seq("name", "content"), "name" -> "string",
          "content" -> "string", "username" -> "string"),
        { args =>
          val tmp = java.nio.file.Files.createTempFile("graft_mcp", ".txt")
          try {
            java.nio.file.Files.writeString(tmp, req(args, "content"))
            val fi = svc(args).upload(tmp.toString, req(args, "name"))
            ListMap("name" -> fi.name, "rows" -> fi.rows,
              "headers" -> fi.headers)
          } finally java.nio.file.Files.deleteIfExists(tmp)
        }),
      ("delete_sar_file", "Delete an uploaded SAR file.",
        schema(Seq("name"), "name" -> "string", "username" -> "string"),
        args => ListMap("deleted" -> svc(args).delete(req(args, "name")))),
      ("get_file_info",
        "Row count and section headers of an uploaded SAR file.",
        schema(Seq("name"), "name" -> "string", "username" -> "string"),
        args => ServicePayloads.fileInfo(svc(args), req(args, "name"))),
      ("get_header_details",
        "Metrics and sub-devices for one header (alias accepted).",
        schema(Seq("name", "header"), "name" -> "string",
          "header" -> "string", "username" -> "string"),
        { args =>
          val h = req(args, "header")
          ServicePayloads.headerDetails(svc(args), req(args, "name"))
            .find(d => d("header") == h || d("alias") == h)
            .getOrElse(throw new IllegalArgumentException(
              s"header or alias '$h' not found"))
        }),
      ("get_data",
        "Time-series table for a header; optional metric/device/start/end.",
        schema(Seq("name", "header"), "name" -> "string",
          "header" -> "string", "metric" -> "string", "device" -> "string",
          "start" -> "string", "end" -> "string", "limit" -> "integer",
          "username" -> "string"),
        args => ServicePayloads.data(svc(args), req(args, "name"),
          req(args, "header"), str(args, "device"), str(args, "start"),
          str(args, "end"), metrics(args), int(args, "limit", 10000))),
      ("get_statistics",
        "describe() statistics for a header or a single metric.",
        schema(Seq("name", "header"), "name" -> "string",
          "header" -> "string", "metric" -> "string", "device" -> "string",
          "start" -> "string", "end" -> "string", "username" -> "string"),
        args => ServicePayloads.statistics(svc(args), req(args, "name"),
          req(args, "header"), str(args, "device"), str(args, "start"),
          str(args, "end"), metrics(args))),
      ("disk_usage", "Per-user storage usage, largest consumers first.",
        schema(Nil),
        _ => ServicePayloads.diskUsage(tenants)),
      ("cleanup_old_files",
        "Delete uploads older than `days` days (dry run by default).",
        schema(Nil, "days" -> "integer", "username" -> "string",
          "dry_run" -> "boolean"),
        { args =>
          val days = int(args, "days", 30)
          require(days >= 1, "days must be >= 1")
          tenants.cleanupOldFiles(days, str(args, "username"),
            dryRun = bool(args, "dry_run", dflt = true))
        }))
}

/** `sbt "runMain graft.service.McpMain <storageDir>"` — serve MCP over
  * stdio for an agent host (claude_desktop_config-style launch). */
object McpMain {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val hub = new SarTenants(spark,
      args.headOption.getOrElse(sys.props("java.io.tmpdir") + "/graft_sar"))
    new SarMcpServer(hub).serve(System.in, System.out)
  }
}
