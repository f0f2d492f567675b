package graft

import java.nio.file.Files
import scala.io.Source

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.service.{SarHttpServer, SarTenants}

/** Integration spec for the thin HTTP shell: a real server on an
  * ephemeral port, real requests, asserting the reference's response
  * shapes (api/main.py:232-331) against a temp storage dir. */
class SarHttpServerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def resource(name: String): String = {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream(s"/sar/$name"), "UTF-8")
    try src.mkString finally src.close()
  }

  /** One request helper for every method: (status, body, contentType). */
  private def request(method: String, url: String, user: String,
      body: Array[Byte] = Array.emptyByteArray): (Int, String, String) = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod(method)
    conn.setRequestProperty("X-User", user)
    if (body.nonEmpty) {
      conn.setDoOutput(true)
      val out = conn.getOutputStream
      try out.write(body) finally out.close()
    }
    val status = conn.getResponseCode
    val stream =
      if (status >= 400) conn.getErrorStream else conn.getInputStream
    val text = Option(stream).map { s =>
      try new String(s.readAllBytes(), "UTF-8") finally s.close()
    }.getOrElse("")
    (status, text, String.valueOf(conn.getContentType))
  }

  private def get(url: String, user: String = "alice")
      : (Int, String, String) = request("GET", url, user)

  private def send(method: String, url: String, body: Array[Byte],
      user: String = "alice"): (Int, String) = {
    val (status, text, _) = request(method, url, user, body)
    (status, text)
  }

  private def delete(url: String, user: String = "alice"): Int =
    request("DELETE", url, user)._1

  test("HTTP shell: files / data / statistics round-trip the service") {
    val base = Files.createTempDirectory("graft_http").toString
    val tenants = new SarTenants(spark, base)
    val up = Files.createTempFile("sa_http", ".txt")
    Files.writeString(up, resource("sa_24h.txt"))
    tenants.forUser("alice").upload(up.toString, "day1")

    val server = new SarHttpServer(tenants)
    val port = server.start()
    val root = s"http://localhost:$port/api/v1"
    try {
      // files listing is per-tenant: alice sees her upload, bob nothing
      val (s1, files, ct1) = get(s"$root/files")
      assert(s1 == 200 && ct1.startsWith("application/json"))
      assert(files == """{"files":["day1"]}""")
      assert(get(s"$root/files", user = "bob")._2 == """{"files":[]}""")

      // file info carries rows + headers
      val (s2, info, _) = get(s"$root/files/day1")
      assert(s2 == 200 && info.contains(""""name":"day1"""") &&
        info.contains(""""rows":""") && info.contains("%idle"))

      // header details: full list, and the single-header route resolves
      // aliases through the same path as data/statistics
      val (sh1, allHeaders, _) = get(s"$root/files/day1/headers")
      assert(sh1 == 200 && allHeaders.contains(""""alias":"CPU"""") &&
        allHeaders.contains(""""device_scoped":true"""))
      val (sh2, oneHeader, _) = get(s"$root/files/day1/headers/CPU")
      assert(sh2 == 200 && oneHeader.contains(""""alias":"CPU"""") &&
        oneHeader.contains(""""devices":["""))
      assert(get(s"$root/files/day1/headers/NoSuchHeader")._1 == 400)

      // data: resolved meta + date-keyed records, CPU collapses to 'all'
      val (s3, data, _) = get(s"$root/files/day1/data?header=CPU")
      assert(s3 == 200)
      assert(data.contains(""""alias":"CPU"""") &&
        data.contains(""""device":"all"""") && data.contains(""""data":["""))
      // canonical S11 date shape (jsonRecords), truncation flag present
      assert(data.contains("\"2023-06-05 00:10:01\""))
      assert(data.contains(""""truncated":false"""))
      // a limit below the row count truncates and flags it
      val (sl, limited, _) =
        get(s"$root/files/day1/data?header=CPU&limit=1")
      assert(sl == 200 && limited.contains(""""rows":1""") &&
        limited.contains(""""truncated":true"""))
      // metric projection + CSV format
      val (s4, csvBody, ct4) =
        get(s"$root/files/day1/data?header=CPU&metrics=%25idle&format=csv")
      assert(s4 == 200 && ct4.startsWith("text/csv"))
      assert(csvBody.linesIterator.next() == "date,%idle")
      // the reference's singular `metric` param projects identically
      val (s4b, csvOne, _) =
        get(s"$root/files/day1/data?header=CPU&metric=%25idle&format=csv")
      assert(s4b == 200 && csvOne.linesIterator.next() == "date,%idle")

      // statistics: per-metric stat map, same meta block
      val (s5, stats, _) = get(s"$root/files/day1/statistics?header=CPU")
      assert(s5 == 200)
      assert(stats.contains(""""statistics":{""") &&
        stats.contains(""""%idle":{"count":""") && stats.contains(""""50%":"""))

      // service require()s surface as 400 + detail, FastAPI's error shape
      val (s6, badHeader, _) = get(s"$root/files/day1/data?header=nope")
      assert(s6 == 400 && badHeader.contains(""""detail":"""))
      assert(get(s"$root/files/day1/data")._1 == 400) // header required
      // tenant and storage-name validation guard the HTTP surface too
      assert(get(s"$root/files", user = "..")._1 == 400)
      assert(get(s"$root/files/.hidden/data?header=CPU")._1 == 400)
      assert(get(s"$root/nope")._1 == 404)

      // raw-body upload: bob PUTs sar text, sees it, alice does not
      val (s8, uploaded) = send("PUT", s"$root/files/2026-07-01_bobhost_x",
        resource("sa_24h.txt").getBytes("UTF-8"), user = "bob")
      assert(s8 == 201 && uploaded.contains(""""rows":"""))
      assert(get(s"$root/files", user = "bob")._2
        .contains("2026-07-01_bobhost_x"))
      assert(!get(s"$root/files")._2.contains("bobhost"))

      // admin cleanup: dry run lists bob's stale upload without deleting
      val (s9, dry) = send("POST",
        s"$root/admin/cleanup?days=30&dry_run=true", Array.emptyByteArray)
      assert(s9 == 200 && dry.contains(""""bob":["2026-07-01_bobhost_x"]"""))
      assert(get(s"$root/files", user = "bob")._2.contains("bobhost"))
      assert(send("POST", s"$root/admin/cleanup?days=0",
        Array.emptyByteArray)._1 == 400) // days >= 1

      // admin usage sees every tenant; delete is tenant-scoped
      val (s7, usage, _) = get(s"$root/admin/disk-usage")
      assert(s7 == 200 && usage.contains(""""username":"alice""""))
      assert(delete(s"$root/files/day1", user = "bob") == 404)
      assert(delete(s"$root/files/day1") == 200)
      assert(get(s"$root/files")._2 == """{"files":[]}""")
    } finally server.stop()
  }
}
