package graft.operators

/** JVM image codec: hand-rolled byte decoders for the two uncompressed
  * formats (binary PPM (P6), 24-bit BI_RGB BMP) plus REAL compressed-image
  * decode through the JDK's own `javax.imageio` (JPEG/PNG/GIF/TIFF/WBMP —
  * all ship with the JRE and work headless; only video (MP4) genuinely
  * lacks a JDK codec and stays on [[Multimodal]]'s fake container).
  *
  * All functions are executor-side pure code: no driver state, safe inside
  * `mapPartitions` at any scale. ImageIO readers are allocated per call
  * (they are not thread-safe) — amortized fine against per-image decode
  * cost.
  */
object ImageCodec {

  /** Row-major, tightly packed RGB (3 bytes/pixel). */
  case class Image(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == 3 * width * height, "rgb length mismatch")
  }

  /** Decode PPM (P6), 24-bit BMP (fast hand-rolled paths), or any
    * ImageIO-supported compressed format; None for anything else (corrupt
    * rows must not kill the job).
    */
  def decode(bytes: Array[Byte]): Option[Image] =
    decodePpm(bytes).orElse(decodeBmp(bytes))
      .orElse(decodeImageIO(bytes).map(_._2))

  // ---- compressed formats via the JDK's javax.imageio ----

  /** Decode via ImageIO, returning (format name, image) — e.g.
    * ("jpeg", ...), ("png", ...). None when no reader claims the bytes or
    * the payload is corrupt (a truncated JPEG throws inside `read`; that
    * is a dropped row, never a failed task).
    */
  def decodeImageIO(bytes: Array[Byte]): Option[(String, Image)] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
          val bi = reader.read(0)
          Some((fmt, fromBufferedImage(bi)))
        } finally reader.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def fromBufferedImage(bi: java.awt.image.BufferedImage): Image = {
    val w = bi.getWidth
    val h = bi.getHeight
    // getRGB normalizes any color model to sRGB ints — deterministic for
    // a given decode
    val px = bi.getRGB(0, 0, w, h, null, 0, w)
    val rgb = new Array[Byte](3 * w * h)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      rgb(3 * i) = ((p >> 16) & 0xff).toByte
      rgb(3 * i + 1) = ((p >> 8) & 0xff).toByte
      rgb(3 * i + 2) = (p & 0xff).toByte
      i += 1
    }
    Image(w, h, rgb)
  }

  private def toBufferedImage(img: Image): java.awt.image.BufferedImage = {
    val bi = new java.awt.image.BufferedImage(img.width, img.height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](img.width * img.height)
    var i = 0
    while (i < px.length) {
      px(i) = ((img.rgb(3 * i) & 0xff) << 16) |
        ((img.rgb(3 * i + 1) & 0xff) << 8) | (img.rgb(3 * i + 2) & 0xff)
      i += 1
    }
    bi.setRGB(0, 0, img.width, img.height, px, 0, img.width)
    bi
  }

  /** PNG-encode (lossless: `decode(encodePng(img)).rgb` is pixel-exact). */
  def encodePng(img: Image): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(toBufferedImage(img), "png", out)
    out.toByteArray
  }

  /** JPEG-encode (lossy — round-trips approximately; spec-tested). */
  def encodeJpeg(img: Image): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(toBufferedImage(img), "jpg", out)
    out.toByteArray
  }

  // ---- PPM (P6): "P6" <ws> width <ws> height <ws> maxval '\n' raw RGB ----

  def decodePpm(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 10) return None
    if (bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2
    def skipWs(): Boolean = {
      var progressed = false
      var go = true
      while (go && i < bytes.length) {
        val c = bytes(i)
        if (c == '#') { // comment to end of line
          while (i < bytes.length && bytes(i) != '\n') i += 1
          progressed = true
        } else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
          i += 1; progressed = true
        } else go = false
      }
      progressed
    }
    def readInt(): Int = {
      var v = 0
      var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1; any = true
        if (v > (1 << 24)) return -1
      }
      if (any) v else -1
    }
    if (!skipWs()) return None
    val w = readInt(); if (w <= 0) return None
    if (!skipWs()) return None
    val h = readInt(); if (h <= 0) return None
    if (!skipWs()) return None
    val maxval = readInt(); if (maxval != 255) return None
    // exactly ONE whitespace byte after maxval, then raw data
    if (i >= bytes.length) return None
    val sep = bytes(i)
    if (sep != ' ' && sep != '\t' && sep != '\n' && sep != '\r') return None
    i += 1
    val need = 3L * w * h
    if (bytes.length - i < need) return None
    val rgb = java.util.Arrays.copyOfRange(bytes, i, i + need.toInt)
    Some(Image(w, h, rgb))
  }

  def encodePpm(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  // ---- BMP: BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40), 24bpp BI_RGB,
  //      bottom-up rows padded to 4 bytes, pixels stored BGR ----

  def decodeBmp(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 54) return None
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    def le32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val dataOffset = le32(10)
    val headerSize = le32(14)
    if (headerSize < 40) return None
    val w = le32(18)
    val hRaw = le32(22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0 || w > (1 << 20) || h > (1 << 20)) return None
    if (le16(26) != 1) return None // planes
    if (le16(28) != 24) return None // bpp
    if (le32(30) != 0) return None // BI_RGB only
    val rowBytes = (3 * w + 3) & ~3
    if (dataOffset < 54 || dataOffset.toLong + rowBytes.toLong * h > bytes.length)
      return None
    val rgb = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val src = dataOffset + srcRow * rowBytes
      var x = 0
      while (x < w) {
        val s = src + 3 * x
        val d = 3 * (y * w + x)
        rgb(d) = bytes(s + 2)     // R  (BMP stores BGR)
        rgb(d + 1) = bytes(s + 1) // G
        rgb(d + 2) = bytes(s)     // B
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, rgb))
  }

  def encodeBmp(img: Image): Array[Byte] = {
    val rowBytes = (3 * img.width + 3) & ~3
    val dataSize = rowBytes * img.height
    val out = new Array[Byte](54 + dataSize)
    def le32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    def le16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, 54 + dataSize); le32(10, 54)
    le32(14, 40); le32(18, img.width); le32(22, img.height)
    le16(26, 1); le16(28, 24); le32(30, 0); le32(34, dataSize)
    var y = 0
    while (y < img.height) {
      val dst = 54 + (img.height - 1 - y) * rowBytes
      var x = 0
      while (x < img.width) {
        val s = 3 * (y * img.width + x)
        val d = dst + 3 * x
        out(d) = img.rgb(s + 2); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Nearest-neighbor resize — the standard cheap pre-filter for training
    * pipelines (source pixel = floor(dst · src/dst), same mapping as
    * PIL's NEAREST).
    */
  def resizeNearest(img: Image, w: Int, h: Int): Image = {
    require(w > 0 && h > 0, "target dims must be positive")
    val out = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.height / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.width / w).toInt
        val s = 3 * (sy * img.width + sx)
        val d = 3 * (y * w + x)
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    Image(w, h, out)
  }

  /** Exact per-channel pixel sums — integer outputs (no float rounding),
    * the oracle-gateable face of a real decode: any engine that can
    * enumerate the source pixels reproduces them bit-for-bit.
    */
  def channelSums(img: Image): (Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < img.rgb.length) {
      r += img.rgb(i) & 0xff
      g += img.rgb(i + 1) & 0xff
      b += img.rgb(i + 2) & 0xff
      i += 3
    }
    (r, g, b)
  }

  /** 8-dim image feature: mean R, G, B (0..1), mean luminance of the four
    * quadrants (Rec.601 weights), and log10(pixels)/7 as a scale channel —
    * a real (if simple) visual descriptor, deterministic across JVMs.
    */
  def feature(img: Image): Array[Float] = {
    val out = new Array[Double](8)
    val n = img.width.toLong * img.height
    var y = 0
    while (y < img.height) {
      val top = y * 2 < img.height
      var x = 0
      while (x < img.width) {
        val s = 3 * (y * img.width + x)
        val r = img.rgb(s) & 0xff
        val g = img.rgb(s + 1) & 0xff
        val b = img.rgb(s + 2) & 0xff
        out(0) += r; out(1) += g; out(2) += b
        val luma = 0.299 * r + 0.587 * g + 0.114 * b
        val left = x * 2 < img.width
        val q = (if (top) 0 else 2) + (if (left) 0 else 1)
        out(3 + q) += luma
        x += 1
      }
      y += 1
    }
    val quadN = Array.fill(4)(0L)
    // quadrant pixel counts (integer splits)
    val topH = (img.height + 1) / 2
    val leftW = (img.width + 1) / 2
    quadN(0) = topH.toLong * leftW
    quadN(1) = topH.toLong * (img.width - leftW)
    quadN(2) = (img.height - topH).toLong * leftW
    quadN(3) = (img.height - topH).toLong * (img.width - leftW)
    val f = new Array[Float](8)
    f(0) = (out(0) / n / 255.0).toFloat
    f(1) = (out(1) / n / 255.0).toFloat
    f(2) = (out(2) / n / 255.0).toFloat
    var q = 0
    while (q < 4) {
      f(3 + q) = if (quadN(q) == 0) 0f else (out(3 + q) / quadN(q) / 255.0).toFloat
      q += 1
    }
    f(7) = (math.log10(n.toDouble) / 7.0).toFloat
    f
  }
}
