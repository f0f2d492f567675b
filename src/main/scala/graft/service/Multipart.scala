package graft.service

import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.file.{Files, Path, StandardOpenOption}

/** Minimal multipart/form-data reader for the upload route (the
  * reference's `POST /files` takes `list[UploadFile]`,
  * api/main.py:237-255). The request body is spooled to disk by the
  * caller and parsed from a memory-mapped view, so a 512 MB upload
  * never lands on a server-thread heap; each file part's content is
  * copied out with `FileChannel.transferTo` (kernel-side copy).
  *
  * Scope: file parts only (parts without a `filename` are form fields
  * the upload route ignores), RFC 2046 CRLF framing, quoted or bare
  * boundary parameter. Nested multipart and content-transfer-encoding
  * are not used by HTTP form uploads.
  */
private[service] object Multipart {

  /** The boundary parameter of a multipart Content-Type, if any. */
  def boundaryOf(contentType: String): Option[String] = {
    val ct = contentType.trim
    if (!ct.toLowerCase.startsWith("multipart/")) return None
    ct.split(";").map(_.trim).collectFirst {
      case p if p.toLowerCase.startsWith("boundary=") =>
        val v = p.substring("boundary=".length).trim
        if (v.startsWith("\"") && v.endsWith("\"") && v.length >= 2)
          v.substring(1, v.length - 1)
        else v
    }.filter(_.nonEmpty)
  }

  /** Parse the spooled body into (filename, contentTempFile) pairs.
    * Caller owns (and must delete) the returned temp files. */
  def fileParts(body: Path, boundary: String): Seq[(String, Path)] = {
    val ch = FileChannel.open(body, StandardOpenOption.READ)
    try {
      val size = ch.size()
      require(size <= Int.MaxValue, "multipart body too large")
      val buf = ch.map(FileChannel.MapMode.READ_ONLY, 0, size)
      val n = size.toInt
      val open = s"--$boundary".getBytes(ISO_8859_1)
      val delim = s"\r\n--$boundary".getBytes(ISO_8859_1)
      val crlfcrlf = "\r\n\r\n".getBytes(ISO_8859_1)

      def at(pos: Int, pat: Array[Byte]): Boolean = {
        if (pos < 0 || pos + pat.length > n) return false
        var i = 0
        while (i < pat.length) {
          if (buf.get(pos + i) != pat(i)) return false
          i += 1
        }
        true
      }
      // first-byte skip loop: a 512 MB body is scanned at memchr-ish
      // speed instead of a full pattern compare per position (a
      // pathological boundary-prefix-heavy upload would otherwise pin a
      // server pool thread on pure CPU)
      def indexOf(pat: Array[Byte], from: Int): Int = {
        var i = math.max(0, from)
        val last = n - pat.length
        val first = pat(0)
        while (i <= last) {
          if (buf.get(i) == first && at(i, pat)) return i
          i += 1
        }
        -1
      }

      val parts = Seq.newBuilder[(String, Path)]
      val created = scala.collection.mutable.ArrayBuffer.empty[Path]
      try {
      // first delimiter has no leading CRLF when it opens the body
      var cursor =
        if (at(0, open)) open.length
        else {
          val d = indexOf(delim, 0)
          require(d >= 0, "multipart body has no boundary")
          d + delim.length
        }
      var done = false
      while (!done) {
        if (at(cursor, "--".getBytes(ISO_8859_1))) done = true // terminator
        else {
          if (at(cursor, "\r\n".getBytes(ISO_8859_1))) cursor += 2
          val headerEnd = indexOf(crlfcrlf, cursor)
          require(headerEnd >= 0, "unterminated multipart part headers")
          val headerBytes = new Array[Byte](headerEnd - cursor)
          val ro = buf.duplicate(); ro.position(cursor); ro.get(headerBytes)
          val headers = new String(headerBytes, ISO_8859_1)
          val contentStart = headerEnd + crlfcrlf.length
          val next = indexOf(delim, contentStart)
          require(next >= 0, "unterminated multipart part content")
          fileNameOf(headers).foreach { name =>
            val tmp = Files.createTempFile("graft_part", ".bin")
            created += tmp
            val out = FileChannel.open(tmp, StandardOpenOption.WRITE,
              StandardOpenOption.TRUNCATE_EXISTING)
            try {
              var pos = contentStart.toLong
              val end = next.toLong
              while (pos < end) pos += ch.transferTo(pos, end - pos, out)
            } finally out.close()
            parts += name -> tmp
          }
          cursor = next + delim.length
        }
      }
      parts.result()
      } catch { case e: Throwable =>
        // a part extracted before the failure would otherwise be orphaned
        // (the caller's finally only sees the returned Seq) — repeated
        // malformed uploads must not fill the temp volume
        created.foreach(p => try Files.deleteIfExists(p) catch {
          case _: Exception => ()
        })
        throw e
      }
    } finally ch.close()
  }

  /** filename from a part's Content-Disposition; basename only (some
    * agents send a full client path) — None for non-file form fields. */
  private def fileNameOf(headers: String): Option[String] =
    headers.linesIterator
      .find(_.toLowerCase.startsWith("content-disposition:"))
      .flatMap { line =>
        "filename=\"([^\"]*)\"".r.findFirstMatchIn(line).map(_.group(1))
      }
      .map(f => f.substring(math.max(f.lastIndexOf('/'), f.lastIndexOf('\\')) + 1))
      .filter(_.nonEmpty)
}
