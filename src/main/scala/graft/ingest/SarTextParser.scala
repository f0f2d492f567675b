package graft.ingest

import java.sql.Timestamp
import java.time.LocalDateTime
import java.util.Locale
import java.util.regex.Pattern

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{SarLine, SarModel}

/** Stateful SAR ASCII parser (reference parse_into_polars.py:80-202,
  * pl_helpers2.py:6-140 — SURVEY.md §2.1 S1/S2, §2.3 F1-F5).
  *
  * Header assignment depends on ordered line context (a blank line means
  * the next non-ignored line is a header), so parsing is per-file: the
  * Spark entry point reads whole files (one task per file — SAR files are
  * at most hundreds of MB) and runs the pure-Scala line fold below. At
  * 100 TB (= millions of SAR files) this parallelizes per file with no
  * shuffle; the parsed long frame is then materialized to parquet where
  * every downstream filter gets pushdown + pruning.
  */
object SarTextParser {

  /** Parse every file under `path` (glob ok) into one long SAR frame. */
  def parse(spark: SparkSession, path: String,
      minPartitions: Int = 0): Dataset[SarLine] = {
    import spark.implicits._
    val mp = if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism
    spark.sparkContext.wholeTextFiles(path, mp)
      .flatMap { case (_, content) => parseContent(content) }
      .toDS()
  }

  /** Pure parser: one SAR text file content → long-frame rows. */
  def parseContent(content: String): Seq[SarLine] = {
    val lines = content.split("\n", -1).toSeq
    parseLines(lines)
  }

  // --- regexes (case-insensitivity mirrors the reference) ---
  private val regIgnore = Pattern.compile(
    "^(\\d{2}:\\d{2}:\\d{2}.*bus.*idvendor|.*intr.*intr/s|.*temp.*device|.*mhz)",
    Pattern.CASE_INSENSITIVE)
  private val regAmPmData = Pattern.compile(" AM | PM ", Pattern.CASE_INSENSITIVE)
  private val regComma = Pattern.compile("(\\d+),(\\d+)")
  private val regRestart = Pattern.compile("LINUX RESTART")
  private val regTime = Pattern.compile("(^\\d{2}:\\d{2}:\\d{2})")
  private val regFibre = Pattern.compile(
    "^(\\d{2}:\\d{2}:\\d{2}.*fch_.*FCHOST)", Pattern.CASE_INSENSITIVE)
  private val regFilesystem = Pattern.compile(
    "^\\d{2}:\\d{2}:\\d{2}.*filesystem", Pattern.CASE_INSENSITIVE)
  private val regEmpty = Pattern.compile("^\\s*$")
  private val regAmPmToken = Pattern.compile("AM|PM", Pattern.CASE_INSENSITIVE)
  private val regSlashDate = Pattern.compile("\\d{2}/\\d{2}/\\d{2}")
  private val regSlashDateAny = Pattern.compile("(\\d{2}/\\d{2}/\\d{2,4})")

  /** FCHOST/FILESYSTEM sections print the device last — rotate it to the
    * front so they parse like every other device section
    * (reference parse_into_polars.py:66-77 handle_fibre_and_fs). */
  def rotateDeviceToFront(line: String): String = {
    val toks = mutable.ArrayBuffer.from(line.trim.split("\\s+"))
    if (toks.length < 2) return line
    val dev = toks.last
    val insIdx = if (regAmPmToken.matcher(toks(1)).find()) 2 else 1
    toks.insert(insIdx, dev)
    toks.remove(toks.length - 1)
    toks.mkString(" ")
  }

  /** First line containing "Linux", brackets stripped, slash-dates
    * normalized to dashes (reference pl_helpers2.py:6-15). */
  def extractOsDetails(lines: Seq[String]): String =
    lines.find(_.contains("Linux")).map { l =>
      val s = l.replace("[", "").replace("]", "").stripLineEnd
      if (regSlashDate.matcher(s).find()) {
        val m = regSlashDateAny.matcher(s)
        val sb = new java.lang.StringBuilder
        while (m.find()) m.appendReplacement(sb,
          m.group().replace("/", "-"))
        m.appendTail(sb)
        sb.toString
      } else s
    }.getOrElse("")

  /** Pick the file's date string + java.time pattern from os_details
    * (reference pl_helpers2.py:18-47 format_date). */
  def formatDate(osDetails: String): (String, String) = {
    val regs: Seq[(Pattern, String)] = Seq(
      Pattern.compile("[0-9]{4}-[0-9]{2}-[0-9]{2}") -> "yyyy-MM-dd",
      Pattern.compile("[0-9]{2}/[0-9]{2}/[0-9]{4}") -> "MM/dd/yyyy",
      Pattern.compile("[0-9]{2}-[0-9]{2}-[0-9]{4}") -> "MM-dd-yyyy",
      Pattern.compile("[0-9]{2}-[0-9]{2}-[0-9]{2}") -> "MM-dd-yy",
      Pattern.compile("[0-9]{2}/[0-9]{2}/[0-9]{2}") -> "MM/dd/yy")
    var dateStr = "2000-01-01"
    var fmt = "yyyy-MM-dd"
    val it = osDetails.split("\\s+").iterator
    var done = false
    while (it.hasNext && !done) {
      val item = it.next()
      regs.find { case (p, _) => p.matcher(item).find() } match {
        case Some((_, f)) => dateStr = item; fmt = f; done = true
        case None => dateStr = "2000-01-01"; fmt = "yyyy-MM-dd"
      }
    }
    (dateStr, fmt)
  }

  /** The ordered line fold (reference parse_into_polars.py:94-176). */
  def parseLines(lines: Seq[String]): Seq[SarLine] = {
    val osDetails = extractOsDetails(lines)
    // insertion-ordered header → data lines
    val fileDict = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
    val restarts = mutable.ArrayBuffer.empty[String]
    var header = false
    var headerStr = ""
    var ignoreData = false
    var fcHost = false
    var filesystem = false

    for (raw <- lines) {
      val line = raw.stripLineEnd
      if (regEmpty.matcher(line).find()) {
        header = true; ignoreData = false
      } else if (ignoreData) {
        // skip
      } else if (!regTime.matcher(line).find()) {
        // skip
      } else if (regRestart.matcher(line).find()) {
        restarts += s"${line.trim} ${line.trim.split("\\s+")(0)}"
      } else if (header) {
        if (regIgnore.matcher(line).find()) {
          ignoreData = true; header = false
        } else {
          var l = line
          if (regFibre.matcher(l).find()) { fcHost = true; l = rotateDeviceToFront(l) }
          else fcHost = false
          if (regFilesystem.matcher(l).find()) { filesystem = true; l = rotateDeviceToFront(l) }
          else filesystem = false
          headerStr = l.trim.split("\\s+").drop(1).mkString(" ")
          fileDict.getOrElseUpdate(headerStr, mutable.ArrayBuffer.empty)
          header = false
        }
      } else {
        val l = if (fcHost || filesystem) rotateDeviceToFront(line) else line
        fileDict.getOrElseUpdate(headerStr, mutable.ArrayBuffer.empty) += l
      }
    }

    // frame assembly: rows grouped by header in insertion order
    var rows: Seq[(String, String)] =
      fileDict.iterator.flatMap { case (h, ds) => ds.map(h -> _) }.toSeq
    if (rows.isEmpty) return Seq.empty

    // AM/PM + comma-decimal sniffing on the first data row
    val first = rows.head._2
    val amPm = regAmPmData.matcher(first).find()
    if (regComma.matcher(first).find())
      rows = rows.map { case (h, d) => (h, d.replace(",", ".")) }

    // drop unwanted sections
    rows = rows.filterNot { case (h, _) => SarModel.unwantedHeaders.contains(h) }

    // date column: file date + per-line time-of-day
    // (?i) + parseCaseInsensitive: the AM/PM *sniff* above is already
    // case-insensitive, so a lowercase 'am/pm' file must also extract,
    // strip, and parse — the reference sniffs insensitively but then
    // matches case-sensitively, yielding null dates for such files
    // (pl_helpers2.df_reset_date); this keeps the detection behavior
    // without that latent asymmetry
    val (dateStr, dateFmt) = formatDate(osDetails)
    val timePat = if (amPm) "hh:mm:ss a" else "HH:mm:ss"
    val fmtr = new java.time.format.DateTimeFormatterBuilder()
      .parseCaseInsensitive()
      .appendPattern(s"$dateFmt $timePat")
      .toFormatter(Locale.US)
    val timeRe =
      if (amPm) Pattern.compile("(^\\d{2}:\\d{2}:\\d{2}\\s+(?i:AM|PM))")
      else Pattern.compile("(^\\d{2}:\\d{2}:\\d{2})\\s+")
    val stripRe =
      if (amPm) "^\\d{2}:\\d{2}:\\d{2}\\s+(?i:AM|PM)\\s+"
      else "^\\d{2}:\\d{2}:\\d{2}\\s+"

    val tagAlt = SarModel.deviceTags.mkString("|")
    val headerClean: String => String = h => {
      val h1 = if (amPm)
        h.replaceFirst(s"^\\s*(?i:AM|PM)\\s+($tagAlt)\\s+", "")
          .replaceFirst("^\\s*(?i:AM|PM)\\s*", "")
      else h.replaceFirst(s"^\\s*($tagAlt)\\s+", "")
      h1
    }

    // SAR files repeat the same HH:MM:SS across every section — memoize
    // the (expensive) DateTimeFormatter parse per distinct time string
    val timeCache = mutable.HashMap.empty[String, Timestamp]
    def parseTime(t: String): Timestamp = timeCache.getOrElseUpdate(t,
      Timestamp.valueOf(LocalDateTime.parse(s"$dateStr $t", fmtr)))

    val headerCache = mutable.HashMap.empty[String, String]

    val out = rows.zipWithIndex.map { case ((h, d), i) =>
      val m = timeRe.matcher(d)
      val ts: Timestamp =
        if (m.find()) parseTime(squeezeSpaces(m.group(1))) else null
      val dataNoTime = squeezeSpaces(d.replaceFirst(stripRe, ""))
      SarLine(
        header = headerCache.getOrElseUpdate(h, headerClean(h)),
        data = dataNoTime,
        os_details = if (i == 0) osDetails else "",
        restart = if (i < restarts.length) restarts(i) else "",
        date = ts)
    }
    out
  }

  /** Hand-rolled `\s+`→single-space squeeze + trim (a per-row regex
    * replaceAll dominates parse time otherwise). */
  private def squeezeSpaces(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) { pendingSpace = sb.length() > 0 }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
