package graft.multimodal

/** Pure-JVM image header parsing: format + pixel dimensions from magic
  * bytes, no codec libraries. This makes the metadata half of the
  * multimodal path real (reference: pillow's `Image.open(...).size` in
  * dash_apps upload handling) — only pixel decode remains stubbed in
  * [[Multimodal.extractFeatures]].
  *
  * Formats are identified by signature and the dimensions read from the
  * format's own header layout:
  *   - PNG: 8-byte signature, then the IHDR chunk (always first) carries
  *     width/height as big-endian u32 at offsets 16/20.
  *   - JPEG: marker scan from SOI to the first SOF frame header
  *     (0xC0–0xCF minus the non-frame C4/C8/CC), which carries
  *     height/width as big-endian u16.
  *   - GIF: 6-byte version signature, logical-screen width/height as
  *     little-endian u16 at offsets 6/8.
  *   - BMP: "BM", then either the 12-byte BITMAPCOREHEADER (u16 dims) or
  *     any later DIB header (s32 dims, height sign = row order).
  *
  * Anything unrecognized or truncated decodes to None — callers treat the
  * payload as opaque bytes, never throw on corrupt uploads.
  */
object ImageHeaders {

  /** Parsed header: `format` is the short codec name (png/jpeg/gif/bmp). */
  final case class ImageMeta(width: Int, height: Int, format: String)

  def decode(b: Array[Byte]): Option[ImageMeta] =
    if (b == null) None
    else decodePng(b).orElse(decodeJpeg(b)).orElse(decodeGif(b))
      .orElse(decodeBmp(b))
      .filter(m => m.width > 0 && m.height > 0)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private val PngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def decodePng(b: Array[Byte]): Option[ImageMeta] =
    if (b.length >= 24 && b.startsWith(PngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(ImageMeta(be32(b, 16), be32(b, 20), "png"))
    else None

  /** Walk JPEG segments to the first frame header. Stand-alone markers
    * (SOI, EOI, RSTn, TEM) carry no length word; every other segment's
    * length includes its own two bytes. Fill bytes (0xFF padding before a
    * marker) are legal and skipped. */
  private def decodeJpeg(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 1 < b.length && u8(b, i) == 0xff) {
      var j = i + 1
      while (j < b.length && u8(b, j) == 0xff) j += 1 // fill bytes
      if (j >= b.length) return None
      val marker = u8(b, j)
      val isFrame = marker >= 0xc0 && marker <= 0xcf &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc
      if (isFrame)
        return if (j + 8 < b.length)
          Some(ImageMeta(be16(b, j + 6), be16(b, j + 4), "jpeg"))
        else None
      if (marker == 0xd9 || marker == 0xda) return None // EOI / scan data
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i = j + 1
      else {
        if (j + 2 >= b.length) return None
        i = j + 1 + be16(b, j + 1)
      }
    }
    None
  }

  private def decodeGif(b: Array[Byte]): Option[ImageMeta] =
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some(ImageMeta(le16(b, 6), le16(b, 8), "gif"))
    else None

  private def decodeBmp(b: Array[Byte]): Option[ImageMeta] =
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      val dibSize = le32(b, 14)
      if (dibSize == 12) Some(ImageMeta(le16(b, 18), le16(b, 20), "bmp"))
      else if (b.length >= 26 && dibSize >= 16)
        // negative height encodes top-down row order, not a size
        Some(ImageMeta(le32(b, 18), math.abs(le32(b, 22)), "bmp"))
      else None
    } else None
}
