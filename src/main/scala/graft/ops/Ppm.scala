package graft.ops

/** Minimal binary PPM (P6) codec in plain Scala — the REAL image decode
  * for the M2 operator (the container ships no image codec jars, but
  * PPM is self-describing and implementable jar-free, completing the
  * de-stub that [[Wav]] started for audio).
  *
  * The decoder is a proper netpbm header parser: whitespace-separated
  * tokens, `#` comments anywhere in the header, exactly one whitespace
  * byte between the maxval and the raster (per spec — a comment is NOT
  * legal there), and a raster length check — so it decodes P6 files
  * from any writer, not just [[encodeP6]]. Only 1-byte channels
  * (maxval < 256) are supported; wider rasters fail loudly.
  */
object Ppm {

  /** Decoded header + content features of one P6 payload. Channel sums
    * and the max are exact integer folds over the raster — any header
    * slip, interleave bug, or short read changes them. */
  final case class PpmMeta(
      width: Int,
      height: Int,
      maxVal: Int,
      nPixels: Long,
      sumR: Long,
      sumG: Long,
      sumB: Long,
      maxChannel: Int)

  /** P6 writer: header (with a comment line, so round-trip tests
    * exercise the decoder's comment skipping) + interleaved RGB bytes. */
  def encodeP6(width: Int, height: Int, maxVal: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, "dimensions must be positive")
    require(maxVal > 0 && maxVal < 256, s"maxVal $maxVal outside 1..255")
    require(rgb.length == width * height * 3,
      s"raster ${rgb.length} != $width*$height*3")
    val header = s"P6\n# graft synthetic image\n$width $height\n$maxVal\n"
      .getBytes("US-ASCII")
    header ++ rgb
  }

  /** Parse a P6 payload. Throws IllegalArgumentException on malformed
    * input (a decode step must fail loudly, not emit garbage features). */
  def decode(bytes: Array[Byte]): PpmMeta = {
    var pos = 0
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f'
    def skipWsAndComments(): Unit = {
      var go = true
      while (go) {
        while (pos < bytes.length && isWs(bytes(pos))) pos += 1
        if (pos < bytes.length && bytes(pos) == '#')
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else go = false
      }
    }
    def token(): String = {
      skipWsAndComments()
      val start = pos
      while (pos < bytes.length && !isWs(bytes(pos)) && bytes(pos) != '#') pos += 1
      require(pos > start, s"truncated PPM header at byte $start")
      new String(bytes, start, pos - start, "US-ASCII")
    }
    def intToken(what: String): Int = {
      val t = token()
      require(t.forall(_.isDigit), s"non-numeric $what '$t'")
      t.toInt
    }

    val magic = token()
    require(magic == "P6", s"not a binary PPM payload (magic '$magic')")
    val w = intToken("width")
    val h = intToken("height")
    val m = intToken("maxval")
    require(w > 0 && h > 0, s"non-positive dimensions ${w}x$h")
    require(m > 0 && m < 256, s"unsupported maxval $m (1-byte channels only)")
    // exactly ONE whitespace byte separates the maxval from the raster
    require(pos < bytes.length && isWs(bytes(pos)), "missing raster separator")
    pos += 1

    val nPixels = w.toLong * h
    require(bytes.length - pos >= nPixels * 3,
      s"raster overruns payload (need ${nPixels * 3}, have ${bytes.length - pos})")
    var (sumR, sumG, sumB) = (0L, 0L, 0L)
    var maxC = 0
    var i = pos
    val end = pos + (nPixels * 3).toInt
    while (i < end) {
      val r = bytes(i) & 0xff
      val g = bytes(i + 1) & 0xff
      val b = bytes(i + 2) & 0xff
      sumR += r; sumG += g; sumB += b
      if (r > maxC) maxC = r
      if (g > maxC) maxC = g
      if (b > maxC) maxC = b
      i += 3
    }
    PpmMeta(w, h, m, nPixels, sumR, sumG, sumB, maxC)
  }
}
