package graft.service

/** Upload naming convention + restart↔file matching (reference
  * helpers_pl.py:245-280 rename_sar_file, SURVEY §2.1 S13;
  * multi_files_pl.py:303-310 restart matching, SURVEY §2.5 J7).
  *
  * Files are stored as `<upload date>_<hostname>_<sar date>`; the
  * hostname and sar date come from the file's own os_details line
  * (`"Linux 5.14… (host) 2023-06-05 …"` — token 2 in parens, token 3
  * the date). A multi-file view then re-associates pooled restart
  * events to files by checking that a file's name contains the event's
  * (hostname, date) — so each file shows only its own reboot markers.
  */
object SarNaming {

  /** Hostname from os_details: token 2 with the surrounding parens
    * stripped (reference `os_details[2].strip("(|)")`). */
  def hostname(osDetails: String): String = {
    val toks = osDetails.trim.split("\\s+")
    if (toks.length > 2) toks(2).stripPrefix("(").stripSuffix(")") else ""
  }

  /** Sar date token from os_details (token 3), slashes normalized to
    * dashes like the reference's extract path. */
  def rawSarDate(osDetails: String): String = {
    val toks = osDetails.trim.split("\\s+")
    if (toks.length > 3) toks(3).replace('/', '-') else ""
  }

  /** Normalize a sar date to YYYY-MM-DD (reference date_patterns:
    * MM-DD-YY → 20YY-MM-DD, MM-DD-YYYY → YYYY-MM-DD, YYYY-MM-DD kept;
    * anything else passes through untouched). */
  def normalizeDate(date: String): String = date match {
    case s if s.matches("\\d{4}-\\d{2}-\\d{2}") => s
    case s if s.matches("\\d{2}-\\d{2}-\\d{4}") =>
      val Array(m, d, y) = s.split("-"); s"$y-$m-$d"
    case s if s.matches("\\d{2}-\\d{2}-\\d{2}") =>
      val Array(m, d, y) = s.split("-"); s"20$y-$m-$d"
    case s => s
  }

  def sarDate(osDetails: String): String = normalizeDate(rawSarDate(osDetails))

  /** S13 storage name: `<upload date>_<hostname>_<sar date>`. */
  def uploadName(osDetails: String, uploadDate: String): String =
    s"${uploadDate}_${hostname(osDetails)}_${sarDate(osDetails)}"

  /** J7 matching predicate: a pooled restart event (identified by its
    * file's os_details) belongs to `fileName` when the name contains the
    * event's hostname and sar date. The date matches in normalized OR
    * raw form — the reference compares the raw os_details token, which
    * silently misses MM-DD-YY files renamed to YYYY-MM-DD; accepting
    * both keeps those matched without breaking reference-named files. */
  def matchesFile(fileName: String, osDetails: String): Boolean = {
    val h = hostname(osDetails)
    val raw = rawSarDate(osDetails)
    // an empty date token must NOT degrade to hostname-only matching:
    // contains("") is vacuously true for every file
    h.nonEmpty && raw.nonEmpty && fileName.contains(h) &&
      (fileName.contains(normalizeDate(raw)) || fileName.contains(raw))
  }
}
