package graft.multimodal

/** Pure-JVM WAV (RIFF/WAVE) header parsing: sample rate, channel count,
  * bit depth and frame count from the container's own chunk structure —
  * the audio counterpart of [[ImageHeaders]] (reference treats audio
  * uploads as opaque blobs; typed metadata is what a training pipeline
  * actually filters on: sample rate / duration / channel layout).
  *
  * Walks RIFF chunks rather than assuming the canonical 44-byte layout,
  * so files with LIST/INFO chunks before `fmt ` parse too. Anything
  * unrecognized or truncated decodes to None — never throws on corrupt
  * uploads.
  */
object AudioHeaders {

  /** `frames` is the data-chunk sample-frame count; duration in seconds
    * is `frames.toDouble / sampleRate`. */
  final case class AudioMeta(sampleRate: Int, channels: Int,
      bitsPerSample: Int, frames: Long, format: String)

  def decode(b: Array[Byte]): Option[AudioMeta] = {
    if (b == null || b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'))
      return None
    var sampleRate = 0; var channels = 0; var bits = 0
    var dataBytes = -1L
    // Long cursor: a crafted 32-bit chunk size near Int.MaxValue must
    // walk off the end, not overflow into a negative index and throw
    var i = 12L
    while (i + 8 <= b.length) {
      val p = i.toInt
      val id = new String(b, p, 4, "US-ASCII")
      val size = le32(b, p + 4) & 0xffffffffL
      if (id == "fmt " && i + 24 <= b.length) {
        channels = le16(b, p + 10)
        sampleRate = le32(b, p + 12)
        bits = le16(b, p + 22)
      } else if (id == "data") dataBytes = size
      // chunks are word-aligned: odd sizes carry a pad byte
      i += 8 + size + (size & 1)
    }
    val bytesPerFrame = channels * (bits / 8)
    if (sampleRate <= 0 || channels <= 0 || bits <= 0 || dataBytes < 0 ||
        bytesPerFrame == 0) None
    else Some(AudioMeta(sampleRate, channels, bits,
      dataBytes / bytesPerFrame, "wav"))
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
}
