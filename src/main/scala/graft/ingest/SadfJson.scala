package graft.ingest

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** sadf-JSON → classic `sar -A` text renderer (reference sar_ingest.py:
  * 42-468, SURVEY.md §2.1 S7): one parser stays authoritative — JSON
  * uploads are rendered to the text layout and fed through SarTextParser,
  * so headers, metrics and devices come out identical to a text upload by
  * construction.
  *
  * Table-driven: ordered (jsonField, sarColumn) pairs per section; only
  * fields present in the JSON are emitted, so plain `sadf -j` and full
  * `sadf -j -- -A` exports both work. Unknown fields/sections produce
  * warnings, not failures. Jackson (shipped with Spark) does the parsing;
  * conversion is driver-side (inputs are single files, like the upload
  * path in the reference).
  */
object SadfJson {

  final case class Spec(
      device: Option[(String, String)] = None,
      deviceLast: Option[(String, String)] = None,
      flatten: Seq[String] = Nil,
      source: Option[String] = None,
      fields: Seq[(String, String)])

  /** Sections `sar -A` prints whose data sadf exports under these keys.
    * Reference sar_ingest.py:42-137. */
  val sections: Seq[(String, Spec)] = Seq(
    "cpu-load" -> Spec(device = Some("cpu" -> "CPU"), fields = Seq(
      "usr" -> "%usr", "user" -> "%user", "nice" -> "%nice",
      "sys" -> "%sys", "system" -> "%system", "iowait" -> "%iowait",
      "steal" -> "%steal", "irq" -> "%irq", "soft" -> "%soft",
      "guest" -> "%guest", "gnice" -> "%gnice", "idle" -> "%idle")),
    "process-and-context-switch" -> Spec(fields = Seq(
      "proc" -> "proc/s", "cswch" -> "cswch/s")),
    "swap-pages" -> Spec(fields = Seq(
      "pswpin" -> "pswpin/s", "pswpout" -> "pswpout/s")),
    "paging" -> Spec(fields = Seq(
      "pgpgin" -> "pgpgin/s", "pgpgout" -> "pgpgout/s", "fault" -> "fault/s",
      "majflt" -> "majflt/s", "pgfree" -> "pgfree/s",
      "pgscank" -> "pgscank/s", "pgscand" -> "pgscand/s",
      "pgsteal" -> "pgsteal/s", "vmeff-percent" -> "%vmeff")),
    "io" -> Spec(flatten = Seq("io-reads", "io-writes"), fields = Seq(
      "tps" -> "tps", "rtps" -> "rtps", "wtps" -> "wtps",
      "bread" -> "bread/s", "bwrtn" -> "bwrtn/s")),
    "memory" -> Spec(fields = Seq(
      "memfree" -> "kbmemfree", "avail" -> "kbavail",
      "memused" -> "kbmemused", "memused-percent" -> "%memused",
      "buffers" -> "kbbuffers", "cached" -> "kbcached",
      "commit" -> "kbcommit", "commit-percent" -> "%commit",
      "active" -> "kbactive", "inactive" -> "kbinact",
      "dirty" -> "kbdirty", "anonpg" -> "kbanonpg", "slab" -> "kbslab",
      "kstack" -> "kbkstack", "pgtbl" -> "kbpgtbl", "vmused" -> "kbvmused")),
    // one JSON dict feeds two text sections (memory + swap utilization)
    "memory-swap" -> Spec(source = Some("memory"), fields = Seq(
      "swpfree" -> "kbswpfree", "swpused" -> "kbswpused",
      "swpused-percent" -> "%swpused", "swpcad" -> "kbswpcad",
      "swpcad-percent" -> "%swpcad")),
    "hugepages" -> Spec(fields = Seq(
      "hugfree" -> "kbhugfree", "hugused" -> "kbhugused",
      "hugused-percent" -> "%hugused")),
    "kernel" -> Spec(fields = Seq(
      "dentunusd" -> "dentunusd", "file-nr" -> "file-nr",
      "inode-nr" -> "inode-nr", "pty-nr" -> "pty-nr")),
    "queue" -> Spec(fields = Seq(
      "runq-sz" -> "runq-sz", "plist-sz" -> "plist-sz",
      "ldavg-1" -> "ldavg-1", "ldavg-5" -> "ldavg-5",
      "ldavg-15" -> "ldavg-15", "blocked" -> "blocked")),
    "disk" -> Spec(device = Some("disk-device" -> "DEV"), fields = Seq(
      "tps" -> "tps", "rkB" -> "rkB/s", "wkB" -> "wkB/s",
      "areq-sz" -> "areq-sz", "aqu-sz" -> "aqu-sz", "await" -> "await",
      "svctm" -> "svctm", "util-percent" -> "%util")),
    "serial" -> Spec(device = Some("line" -> "TTY"), fields = Seq(
      "rcvin" -> "rcvin/s", "xmtin" -> "xmtin/s", "framerr" -> "framerr/s",
      "prtyerr" -> "prtyerr/s", "brk" -> "brk/s", "ovrun" -> "ovrun/s")),
    // sar prints the device column LAST for FILESYSTEM (rotated at parse)
    "filesystems" -> Spec(deviceLast = Some("filesystem" -> "FILESYSTEM"),
      fields = Seq(
        "MBfsfree" -> "MBfsfree", "MBfsused" -> "MBfsused",
        "%fsused" -> "%fsused", "%ufsused" -> "%ufsused",
        "Ifree" -> "Ifree", "Iused" -> "Iused", "%Iused" -> "%Iused")))

  /** network.* subsections (reference sar_ingest.py:140-297). */
  val networkSections: Seq[(String, Spec)] = Seq(
    "net-dev" -> Spec(device = Some("iface" -> "IFACE"), fields = Seq(
      "rxpck" -> "rxpck/s", "txpck" -> "txpck/s", "rxkB" -> "rxkB/s",
      "txkB" -> "txkB/s", "rxcmp" -> "rxcmp/s", "txcmp" -> "txcmp/s",
      "rxmcst" -> "rxmcst/s", "ifutil-percent" -> "%ifutil")),
    "net-edev" -> Spec(device = Some("iface" -> "IFACE"), fields = Seq(
      "rxerr" -> "rxerr/s", "txerr" -> "txerr/s", "coll" -> "coll/s",
      "rxdrop" -> "rxdrop/s", "txdrop" -> "txdrop/s",
      "txcarr" -> "txcarr/s", "rxfram" -> "rxfram/s",
      "rxfifo" -> "rxfifo/s", "txfifo" -> "txfifo/s")),
    "net-nfs" -> Spec(fields = Seq(
      "call" -> "call/s", "retrans" -> "retrans/s", "read" -> "read/s",
      "write" -> "write/s", "access" -> "access/s", "getatt" -> "getatt/s")),
    "net-nfsd" -> Spec(fields = Seq(
      "scall" -> "scall/s", "badcall" -> "badcall/s", "packet" -> "packet/s",
      "udp" -> "udp/s", "tcp" -> "tcp/s", "hit" -> "hit/s",
      "miss" -> "miss/s", "sread" -> "sread/s", "swrite" -> "swrite/s",
      "saccess" -> "saccess/s", "sgetatt" -> "sgetatt/s")),
    "net-sock" -> Spec(fields = Seq(
      "totsck" -> "totsck", "tcpsck" -> "tcpsck", "udpsck" -> "udpsck",
      "rawsck" -> "rawsck", "ip-frag" -> "ip-frag", "tcp-tw" -> "tcp-tw")),
    "net-ip" -> Spec(fields = Seq(
      "irec" -> "irec/s", "fwddgm" -> "fwddgm/s", "idel" -> "idel/s",
      "orq" -> "orq/s", "asmrq" -> "asmrq/s", "asmok" -> "asmok/s",
      "fragok" -> "fragok/s", "fragcrt" -> "fragcrt/s")),
    "net-eip" -> Spec(fields = Seq(
      "ihdrerr" -> "ihdrerr/s", "iadrerr" -> "iadrerr/s",
      "iukwnpr" -> "iukwnpr/s", "idisc" -> "idisc/s", "odisc" -> "odisc/s",
      "onort" -> "onort/s", "asmf" -> "asmf/s", "fragf" -> "fragf/s")),
    "net-icmp" -> Spec(fields = Seq(
      "imsg" -> "imsg/s", "omsg" -> "omsg/s", "iech" -> "iech/s",
      "iechr" -> "iechr/s", "oech" -> "oech/s", "oechr" -> "oechr/s",
      "itm" -> "itm/s", "itmr" -> "itmr/s", "otm" -> "otm/s",
      "otmr" -> "otmr/s", "iadrmk" -> "iadrmk/s", "iadrmkr" -> "iadrmkr/s",
      "oadrmk" -> "oadrmk/s", "oadrmkr" -> "oadrmkr/s")),
    "net-eicmp" -> Spec(fields = Seq(
      "ierr" -> "ierr/s", "oerr" -> "oerr/s", "idstunr" -> "idstunr/s",
      "odstunr" -> "odstunr/s", "itmex" -> "itmex/s", "otmex" -> "otmex/s",
      "iparmpb" -> "iparmpb/s", "oparmpb" -> "oparmpb/s",
      "isrcq" -> "isrcq/s", "osrcq" -> "osrcq/s", "iredir" -> "iredir/s",
      "oredir" -> "oredir/s")),
    "net-tcp" -> Spec(fields = Seq(
      "active" -> "active/s", "passive" -> "passive/s", "iseg" -> "iseg/s",
      "oseg" -> "oseg/s")),
    "net-etcp" -> Spec(fields = Seq(
      "atmptf" -> "atmptf/s", "estres" -> "estres/s",
      "retrans" -> "retrans/s", "isegerr" -> "isegerr/s",
      "orsts" -> "orsts/s")),
    "net-udp" -> Spec(fields = Seq(
      "idgm" -> "idgm/s", "odgm" -> "odgm/s", "noport" -> "noport/s",
      "idgmerr" -> "idgmerr/s")),
    "net-sock6" -> Spec(fields = Seq(
      "tcp6sck" -> "tcp6sck", "udp6sck" -> "udp6sck",
      "raw6sck" -> "raw6sck", "ip6-frag" -> "ip6-frag")),
    "net-ip6" -> Spec(fields = Seq(
      "irec6" -> "irec6/s", "fwddgm6" -> "fwddgm6/s", "idel6" -> "idel6/s",
      "orq6" -> "orq6/s", "asmrq6" -> "asmrq6/s", "asmok6" -> "asmok6/s",
      "imcpck6" -> "imcpck6/s", "omcpck6" -> "omcpck6/s",
      "fragok6" -> "fragok6/s", "fragcr6" -> "fragcr6/s")),
    "net-eip6" -> Spec(fields = Seq(
      "ihdrer6" -> "ihdrer6/s", "iadrer6" -> "iadrer6/s",
      "iukwnp6" -> "iukwnp6/s", "i2big6" -> "i2big6/s",
      "idisc6" -> "idisc6/s", "odisc6" -> "odisc6/s",
      "inort6" -> "inort6/s", "onort6" -> "onort6/s", "asmf6" -> "asmf6/s",
      "fragf6" -> "fragf6/s", "itrpck6" -> "itrpck6/s")),
    "net-icmp6" -> Spec(fields = Seq(
      "imsg6" -> "imsg6/s", "omsg6" -> "omsg6/s", "iech6" -> "iech6/s",
      "iechr6" -> "iechr6/s", "oechr6" -> "oechr6/s", "igmbq6" -> "igmbq6/s",
      "igmbr6" -> "igmbr6/s", "ogmbr6" -> "ogmbr6/s",
      "igmbrd6" -> "igmbrd6/s", "ogmbrd6" -> "ogmbrd6/s",
      "irtsol6" -> "irtsol6/s", "ortsol6" -> "ortsol6/s",
      "irtad6" -> "irtad6/s", "inbsol6" -> "inbsol6/s",
      "onbsol6" -> "onbsol6/s", "inbad6" -> "inbad6/s",
      "onbad6" -> "onbad6/s")),
    "net-eicmp6" -> Spec(fields = Seq(
      "ierr6" -> "ierr6/s", "idtunr6" -> "idtunr6/s",
      "odtunr6" -> "odtunr6/s", "itmex6" -> "itmex6/s",
      "otmex6" -> "otmex6/s", "iprmpb6" -> "iprmpb6/s",
      "oprmpb6" -> "oprmpb6/s", "iredir6" -> "iredir6/s",
      "oredir6" -> "oredir6/s", "ipck2b6" -> "ipck2b6/s",
      "opck2b6" -> "opck2b6/s")),
    "net-udp6" -> Spec(fields = Seq(
      "idgm6" -> "idgm6/s", "odgm6" -> "odgm6/s", "noport6" -> "noport6/s",
      "idgmer6" -> "idgmer6/s")),
    "softnet" -> Spec(device = Some("cpu" -> "CPU"), fields = Seq(
      "total" -> "total/s", "dropd" -> "dropd/s", "squeezd" -> "squeezd/s",
      "rx_rps" -> "rx_rps/s", "flw_lim" -> "flw_lim/s")))

  /** Sections the text parser drops anyway. */
  val skippedSections = Set("interrupts", "power-management")
  /** Legacy sadf fields `sar -A` no longer prints — drop silently. */
  val ignoredFields = Set("rd_sec", "wr_sec", "avgrq-sz", "avgqu-sz")

  private val sectionMap = sections.toMap
  private val networkMap = networkSections.toMap

  /** Fields consumed per JSON section (unioned over every spec fed by it,
    * because e.g. 'memory' feeds two text sections). */
  private val knownFields: Map[String, Set[String]] = {
    def known(s: Spec): Set[String] =
      s.fields.map(_._1).toSet ++ s.device.map(_._1) ++
        s.deviceLast.map(_._1) ++ s.flatten
    val m = mutable.Map.empty[String, Set[String]]
    sections.foreach { case (name, spec) =>
      val src = spec.source.getOrElse(name)
      m(src) = m.getOrElse(src, Set.empty) ++ known(spec)
    }
    networkSections.foreach { case (name, spec) =>
      m(s"network.$name") = m.getOrElse(s"network.$name", Set.empty) ++ known(spec)
    }
    m.toMap
  }

  def isSadfJson(content: String): Boolean = {
    val head = content.take(64).dropWhile(_.isWhitespace)
    head.startsWith("{") && content.take(4096).contains("\"sysstat\"")
  }

  private val mapper = new ObjectMapper()

  private def fmt(v: JsonNode): String =
    if (v == null || v.isNull) "0"
    else if (v.isBoolean) (if (v.asBoolean()) "1" else "0")
    else if (v.isIntegralNumber) v.asLong().toString
    else if (v.isFloatingPointNumber)
      // Locale.ROOT: a comma-decimal default locale would render "3,14"
      // and silently null out every float downstream
      String.format(java.util.Locale.ROOT, "%.2f",
        java.lang.Double.valueOf(v.asDouble()))
    else v.asText()

  private def flattened(row: JsonNode, flatten: Seq[String]): Map[String, JsonNode] = {
    val base = mutable.LinkedHashMap.empty[String, JsonNode]
    row.properties().asScala.foreach(e => base(e.getKey) = e.getValue)
    flatten.foreach { key =>
      base.get(key).filter(_.isObject).foreach { sub =>
        base.remove(key)
        sub.properties().asScala.foreach(e => base(e.getKey) = e.getValue)
      }
    }
    base.toMap
  }

  private def renderRows(spec: Spec, payload: JsonNode, time: String,
      out: mutable.Buffer[String], warnings: mutable.Set[String],
      section: String): Unit = {
    val rows: Seq[JsonNode] =
      if (payload.isArray) payload.elements().asScala.toSeq else Seq(payload)
    if (rows.isEmpty) return
    val first = flattened(rows.head, spec.flatten)
    val known = spec.fields.filter { case (j, _) => first.contains(j) }
    if (known.isEmpty) {
      warnings += s"section with unknown fields skipped: ${first.keys.take(4).toList}"
      return
    }
    val handled = knownFields.getOrElse(section, Set.empty)
    first.keys.foreach { f =>
      if (!handled.contains(f) && !ignoredFields.contains(f))
        warnings += s"unknown field skipped: $section.$f"
    }
    val columns = known.map(_._2)
    val header = (spec.device, spec.deviceLast) match {
      case (Some((_, tag)), _) => s"$tag ${columns.mkString(" ")}"
      case (_, Some((_, tag))) => s"${columns.mkString(" ")} $tag"
      case _ => columns.mkString(" ")
    }
    out += ""
    out += s"$time $header"
    rows.foreach { r =>
      val row = flattened(r, spec.flatten)
      val values = mutable.ArrayBuffer.from(
        known.map { case (j, _) => row.get(j).map(fmt).getOrElse("0") })
      spec.device.foreach { case (jf, _) =>
        values.insert(0, row.get(jf).map(_.asText()).getOrElse("?"))
      }
      spec.deviceLast.foreach { case (jf, _) =>
        values += row.get(jf).map(_.asText()).getOrElse("?")
      }
      out += s"$time ${values.mkString(" ")}"
    }
  }

  /** Render sadf -j JSON to classic `sar -A` text. Returns (text, sorted
    * warnings). Throws IllegalArgumentException on structurally invalid
    * input (mirrors the reference's ValueError). */
  def toSarText(content: String): (String, Seq[String]) = {
    val host =
      try mapper.readTree(content).get("sysstat").get("hosts").get(0)
      catch { case e: Exception =>
        throw new IllegalArgumentException(s"not a valid sadf JSON file ($e)")
      }
    if (host == null)
      throw new IllegalArgumentException("not a valid sadf JSON file (no hosts)")

    def hostStr(f: String, dflt: String): String =
      Option(host.get(f)).map(_.asText()).getOrElse(dflt)
    val ncpu = Option(host.get("number-of-cpus")).map(_.asInt()).getOrElse(1)
    val osDetails =
      s"Linux ${hostStr("release", "unknown")} (${hostStr("nodename", "unknown")}) " +
        s"\t${hostStr("file-date", "2000-01-01")} \t_${hostStr("machine", "unknown")}_" +
        s"\t($ncpu CPU)"
    val out = mutable.ArrayBuffer[String](osDetails)
    val warnings = mutable.Set.empty[String]

    Option(host.get("statistics")).toSeq
      .flatMap(_.elements().asScala).foreach { entry =>
        val time = Option(entry.get("timestamp"))
          .flatMap(t => Option(t.get("time"))).map(_.asText()).getOrElse("")
        if (time.nonEmpty) {
          entry.properties().asScala.foreach { e =>
            val (section, payload) = (e.getKey, e.getValue)
            if (section != "timestamp" && !skippedSections.contains(section)) {
              if (section == "network") {
                payload.properties().asScala.foreach { ne =>
                  networkMap.get(ne.getKey) match {
                    case Some(spec) => renderRows(spec, ne.getValue, time, out,
                      warnings, s"network.${ne.getKey}")
                    case None =>
                      warnings += s"unknown network section skipped: ${ne.getKey}"
                  }
                }
              } else sectionMap.get(section) match {
                case Some(spec) =>
                  renderRows(spec, payload, time, out, warnings, section)
                  if (section == "memory")
                    renderRows(sectionMap("memory-swap"), payload, time, out,
                      warnings, section)
                case None => warnings += s"unknown section skipped: $section"
              }
            }
          }
        }
      }

    Option(host.get("restarts")).toSeq.flatMap(_.elements().asScala)
      .foreach { restart =>
        val boot = Option(restart.get("boot")).getOrElse(restart)
        Option(boot.get("time")).map(_.asText()).foreach { t =>
          out += ""
          out += s"$t LINUX RESTART\t($ncpu CPU)"
        }
      }

    if (out.length <= 1)
      throw new IllegalArgumentException(
        "sadf JSON contains no usable statistics sections")
    out += ""
    (out.mkString("\n") + "\n", warnings.toSeq.sorted)
  }
}
