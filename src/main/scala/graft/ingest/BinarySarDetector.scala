package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.charset.CodingErrorAction

/** Binary SAR data-file sniff (reference mng_sar.py:16-79, SURVEY §2.1
  * S8 detect side): five weighted heuristics, ≥2 hits ⇒ binary. A hit
  * routes the upload through [[BinarySarConverter]] (`sar -A -t -f`
  * subprocess, as in the reference), which raises an actionable error
  * when sysstat is absent. */
object BinarySarDetector {

  def isBinarySar(content: Array[Byte], fileName: String): Boolean = {
    if (content.length < 50) return false

    // 1: 'sa' + digits filename convention
    val lower = fileName.toLowerCase
    val hasSarFilename = lower.startsWith("sa") && fileName.length >= 10 &&
      fileName.drop(2).forall(_.isDigit)

    // 2: non-printable density in the first 100 bytes
    val first100 = content.take(100)
    val nonPrintable = first100.count(b =>
      (b & 0xff) < 32 && b != 9 && b != 10 && b != 13)
    val isMostlyBinary = nonPrintable > 20

    // 3: binary byte patterns
    val head50 = content.take(50)
    val hasBinaryPatterns =
      content.take(4).forall(_ == 0) ||
        (content(0) >= 0 && content(0) <= 3) ||
        head50.sliding(2).exists(p => p.length == 2 && p(0) == 0 && p(1) == 0) ||
        content.slice(10, 30).forall(b =>
          b != 0 && ((b & 0xff) < 32 || (b & 0xff) > 126))

    // 4: UTF-8 decodability of the first 200 bytes
    val isDecodable =
      try {
        val dec = StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(CodingErrorAction.REPORT)
          .onUnmappableCharacter(CodingErrorAction.REPORT)
        dec.decode(java.nio.ByteBuffer.wrap(content.take(200)))
        true
      } catch { case _: java.nio.charset.CharacterCodingException => false }

    // 5: SAR signatures
    def contains(hay: Array[Byte], needle: Array[Byte]): Boolean =
      hay.indexOfSlice(needle) >= 0
    val hasSarSignatures =
      contains(content.take(500), "SYSSTAT".getBytes) ||
        contains(content.take(200), "Linux".getBytes)

    Seq(hasSarFilename, isMostlyBinary, hasBinaryPatterns,
      !isDecodable, hasSarSignatures).count(identity) >= 2
  }
}
