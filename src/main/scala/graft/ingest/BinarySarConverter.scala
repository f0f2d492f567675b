package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path}

/** Binary SAR → ASCII conversion (reference mng_sar.py:82-133, SURVEY
  * §2.1 S8 convert side): write the payload to a temp file, shell
  * `unset LANG; sar -A -t -f <tmp>` (LANG unset so sar emits the
  * C-locale layout the text parser expects, `-t` for the original
  * timestamps), and feed the stdout back through the normal text-ingest
  * chain. Driver-side subprocess exactly like the reference's — uploads
  * are single files, never distributed work.
  */
object BinarySarConverter {

  /** The exact conversion command line (reference mng_sar.py:105:
    * `unset LANG; sar -A -t -f {path}` via shell). Exposed separately so
    * the contract is testable on hosts without sysstat. */
  def conversionCommand(tmpPath: String): Seq[String] =
    Seq("sh", "-c", s"unset LANG; sar -A -t -f '$tmpPath'")

  /** Converted-file naming per the reference (mng_sar.py:95-99):
    * `saDD...` → `sarDD...`, anything else prefixed `sar_`. */
  def convertedName(original: String): String =
    if (original.startsWith("sa") && original.length >= 10)
      "sar" + original.drop(2)
    else s"sar_$original"

  /** True when the `sar` binary resolves on PATH — conversion can only
    * work with sysstat installed. */
  def sarAvailable(): Boolean =
    try {
      val p = new ProcessBuilder("sh", "-c", "command -v sar")
        .redirectError(ProcessBuilder.Redirect.DISCARD).start()
      p.getInputStream.readAllBytes()
      p.waitFor() == 0
    } catch { case _: java.io.IOException => false }

  /** Convert a binary SAR payload to ASCII text. Returns
    * (sar text, converted filename). Throws IllegalArgumentException
    * with an actionable message when sysstat is absent or sar rejects
    * the file (version-mismatched binaries are the common case). */
  def convert(content: Array[Byte], fileName: String): (String, String) = {
    if (!sarAvailable())
      throw new IllegalArgumentException(
        s"$fileName is a binary SAR data file and the 'sar' binary is " +
          "not on PATH — install sysstat, or convert on the source host " +
          "with 'sar -A -t -f <file>' and upload the text output")
    val tmp: Path = Files.createTempFile("graft_sar_", "_input")
    try {
      Files.write(tmp, content)
      val p = new ProcessBuilder(conversionCommand(tmp.toString): _*).start()
      p.getOutputStream.close()
      val out = new ByteArrayOutputStream()
      val err = new ByteArrayOutputStream()
      val errDrain = new Thread(() =>
        try p.getErrorStream.transferTo(err)
        catch { case _: java.io.IOException => () })
      errDrain.start()
      p.getInputStream.transferTo(out)
      errDrain.join()
      if (p.waitFor() != 0)
        throw new IllegalArgumentException(
          s"$fileName: binary SAR conversion failed (sar exit " +
            s"${p.exitValue()}): ${new String(err.toByteArray, "UTF-8").trim} — " +
            "the file was likely written by a different sysstat version")
      val base = java.nio.file.Paths.get(fileName).getFileName.toString
      (new String(out.toByteArray, "UTF-8"), convertedName(base))
    } finally Files.deleteIfExists(tmp)
  }
}
