package graft

import scala.io.Source
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.SarTextParser
import graft.meta.HeaderMeta

class SarParserSpec extends AnyFunSuite {

  private def fixture(name: String): Seq[String] = {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream(s"/sar/$name"), "UTF-8")
    try src.getLines().toList finally src.close()
  }

  test("24h fixture: sections, devices, restart, ignored MHz") {
    val rows = SarTextParser.parseLines(fixture("sa_24h.txt"))
    val headers = rows.map(_.header).distinct
    assert(headers.contains("%usr %nice %sys %iowait %steal %irq %soft %guest %gnice %idle"))
    assert(headers.contains("proc/s cswch/s"))
    assert(headers.contains("tps rkB/s wkB/s areq-sz aqu-sz await %util"))
    // MHz section ignored at header detection
    assert(!headers.exists(_.toLowerCase.contains("mhz")))
    // FCHOST device rotated to front then tag cleaned from header
    assert(headers.contains("fch_rxf/s fch_txf/s fch_rxw/s fch_txw/s"))
    val fch = rows.filter(_.header.startsWith("fch_rxf/s"))
    assert(fch.head.data == "host1 10.00 20.00 1.00 2.00")
    // restart captured with time token appended
    assert(rows.head.restart.contains("LINUX RESTART"))
    assert(rows.head.restart.endsWith("00:15:30"))
    assert(rows(1).restart == "")
    // os_details only on row 0
    assert(rows.head.os_details.contains("testhost"))
    assert(rows(1).os_details == "")
    // date = file date + line time
    assert(rows.head.date.toString == "2023-06-05 00:10:01.0")
    // CPU rows: 'all' + per-cpu, time prefix stripped
    val cpu = rows.filter(_.header.startsWith("%usr"))
    assert(cpu.length == 6)
    assert(cpu.head.data == "all 1.23 0.00 0.45 0.10 0.00 0.05 0.02 0.00 0.00 98.15")
    // Average: lines dropped
    assert(!rows.exists(_.data.contains("Average")))
  }

  test("AM/PM fixture: 12h parsing and AM/PM header cleanup") {
    val rows = SarTextParser.parseLines(fixture("sa_ampm.txt"))
    val cpu = rows.filter(_.header == "%usr %idle")
    assert(cpu.length == 3)
    assert(cpu.head.date.toString == "2023-06-05 00:10:01.0")  // 12:10 AM
    assert(cpu.last.date.toString == "2023-06-05 13:10:01.0")  // 01:10 PM
    assert(cpu.head.data == "all 1.00 99.00")
    assert(rows.exists(_.header == "proc/s cswch/s"))
  }

  test("lowercase am/pm file parses identically to the uppercase one") {
    // the AM/PM sniff is case-insensitive; extraction/strip/parse must be
    // too, or a lowercase file is detected as 12h yet yields null dates
    // (the reference has exactly that asymmetry — kept fixed here)
    val lower = fixture("sa_ampm.txt").map(
      _.replace(" AM ", " am ").replace(" PM ", " pm "))
    val upper = SarTextParser.parseLines(fixture("sa_ampm.txt"))
    val got = SarTextParser.parseLines(lower)
    assert(got.map(_.date) == upper.map(_.date))
    assert(got.map(_.header) == upper.map(_.header))
    assert(got.map(_.data) == upper.map(_.data))
    assert(got.forall(_.date != null))
  }

  test("comma-decimal fixture: commas become points") {
    val rows = SarTextParser.parseLines(fixture("sa_comma.txt"))
    assert(rows.head.data == "all 1.23 98.77")
  }

  test("edge fixture: AM/PM + restart + FCHOST + FILESYSTEM + 2-digit year") {
    val rows = SarTextParser.parseLines(fixture("sa_edge.txt"))
    val headers = rows.map(_.header).distinct
    assert(headers == Seq("%usr %idle", "fch_rxf/s fch_txf/s",
      "MBfsfree MBfsused %fsused"))
    // 06/05/23 os-details → slashes dashed → MM-dd-yy format
    assert(rows.head.date.toString == "2023-06-05 00:10:01.0")
    // AM/PM restart captured with its time token
    assert(rows.head.restart.endsWith("12:15:30"))
    // device rotated to front in both FCHOST and FILESYSTEM data (AM mode)
    assert(rows.filter(_.header.startsWith("fch_")).head.data ==
      "hostA 10.00 20.00")
    assert(rows.filter(_.header.startsWith("MBfsfree")).head.data ==
      "/dev/sda1 1000 500 33.33")
  }

  test("os-details date formats") {
    assert(SarTextParser.formatDate("Linux (h) 2023-06-05 _x86_64_") ==
      ("2023-06-05", "yyyy-MM-dd"))
    assert(SarTextParser.formatDate("Linux (h) 06-05-2023 x") ==
      ("06-05-2023", "MM-dd-yyyy"))
    assert(SarTextParser.formatDate("Linux (h) 06-05-23 x") ==
      ("06-05-23", "MM-dd-yy"))
    assert(SarTextParser.formatDate("no date here") ==
      ("2000-01-01", "yyyy-MM-dd"))
  }

  test("header meta: alias + fuzzy resolution + device scoping") {
    val cpuHeader = "%usr %nice %sys %iowait %steal %irq %soft %guest %gnice %idle"
    assert(HeaderMeta.alias(cpuHeader) == "CPU")
    assert(HeaderMeta.subDeviceTag(cpuHeader).contains("CPU"))
    // single-space variant of a multi-space db header resolves fuzzily
    assert(HeaderMeta.alias("proc/s cswch/s") == "Task creation and system switching")
    assert(HeaderMeta.subDeviceTag("proc/s cswch/s").isEmpty)
    // unknown headers echo back
    assert(HeaderMeta.alias("zz yy xx") == "zz yy xx")
    assert(HeaderMeta.isCpuLike("CPU") && HeaderMeta.isCpuLike("SOFT x"))
    assert(HeaderMeta.metrics.length == 294 && HeaderMeta.headings.length == 40)
  }
}
