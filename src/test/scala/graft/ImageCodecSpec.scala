package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ImageCodec, Multimodal}
import graft.operators.ImageCodec.Image

class ImageCodecSpec extends AnyFunSuite {

  private def px(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)): Image = {
    val rgb = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      rgb(3 * (y * w + x)) = r.toByte
      rgb(3 * (y * w + x) + 1) = g.toByte
      rgb(3 * (y * w + x) + 2) = b.toByte
    }
    Image(w, h, rgb)
  }

  test("PPM round-trips, including comments and whitespace variants") {
    val img = px(3, 2)((x, y) => (x * 80, y * 100, 255 - x * 80))
    val enc = ImageCodec.encodePpm(img)
    val dec = ImageCodec.decodePpm(enc).get
    assert(dec.width === 3 && dec.height === 2)
    assert(dec.rgb.toSeq === img.rgb.toSeq)
    // header with comment lines
    val weird = ("P6\n# a comment\n3 2\n# another\n255\n").getBytes("US-ASCII") ++
      img.rgb
    val dec2 = ImageCodec.decodePpm(weird).get
    assert(dec2.rgb.toSeq === img.rgb.toSeq)
    // truncated payload rejected
    assert(ImageCodec.decodePpm(enc.dropRight(1)).isEmpty)
    assert(ImageCodec.decodePpm("P6 garbage".getBytes).isEmpty)
  }

  test("BMP round-trips through bottom-up padded rows, BGR order") {
    val img = px(3, 3)((x, y) => (10 * x, 20 * y, 30))
    val enc = ImageCodec.encodeBmp(img)
    val dec = ImageCodec.decodeBmp(enc).get
    assert(dec.width === 3 && dec.height === 3)
    assert(dec.rgb.toSeq === img.rgb.toSeq)
    // non-24bpp rejected
    val bad = enc.clone(); bad(28) = 8
    assert(ImageCodec.decodeBmp(bad).isEmpty)
    assert(ImageCodec.decodeBmp(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("nearest-neighbor resize picks the right source pixels") {
    // 2x2 distinct pixels; upscale to 4x4 quadruples each, downscale to 1x1
    // picks (0,0)
    val img = px(2, 2)((x, y) => (x * 100 + y * 10, 0, 0))
    val up = ImageCodec.resizeNearest(img, 4, 4)
    assert(up.width === 4 && up.height === 4)
    // top-left quadrant all == pixel (0,0)
    for (y <- 0 until 2; x <- 0 until 2)
      assert(up.rgb(3 * (y * 4 + x)) === img.rgb(0))
    // bottom-right quadrant all == pixel (1,1)
    for (y <- 2 until 4; x <- 2 until 4)
      assert((up.rgb(3 * (y * 4 + x)) & 0xff) === 110)
    val down = ImageCodec.resizeNearest(img, 1, 1)
    assert(down.rgb(0) === img.rgb(0))
  }

  test("feature: channel means, quadrant lumas, scale channel") {
    // pure red image: mean R = 1, G = B = 0; all quadrant lumas = 0.299
    val red = px(4, 4)((_, _) => (255, 0, 0))
    val f = ImageCodec.feature(red)
    assert(math.abs(f(0) - 1.0f) < 1e-6)
    assert(f(1) === 0.0f && f(2) === 0.0f)
    for (q <- 3 to 6) assert(math.abs(f(q) - 0.299f) < 1e-3)
    assert(math.abs(f(7) - (math.log10(16.0) / 7.0).toFloat) < 1e-6)
    // left/right asymmetry shows up in the quadrant channels
    val half = px(4, 4)((x, _) => if (x < 2) (255, 255, 255) else (0, 0, 0))
    val fh = ImageCodec.feature(half)
    assert(fh(3) > 0.9f && fh(5) > 0.9f) // left quadrants bright
    assert(fh(4) < 0.1f && fh(6) < 0.1f) // right quadrants dark
  }

  test("ImageIO path: PNG round-trips pixel-exact, JPEG approximately, corrupt bytes tolerated") {
    val img = px(16, 12)((x, y) => ((x * 7 + y * 13) % 256, (x * 3 + y * 5) % 256, (x + y) % 256))
    // PNG is lossless: full pixel equality through encode→ImageIO decode
    val png = ImageCodec.encodePng(img)
    val (pngFmt, pngDec) = ImageCodec.decodeImageIO(png).get
    assert(pngFmt === "png")
    assert(pngDec.width === 16 && pngDec.height === 12)
    assert(pngDec.rgb.toSeq === img.rgb.toSeq)
    // exact channel sums survive the round trip (the q95 gate's property)
    assert(ImageCodec.channelSums(pngDec) === ImageCodec.channelSums(img))
    // JPEG is lossy: dims exact, pixels close (smooth gradient — DCT error
    // stays small), mean absolute error bounded
    val jpg = ImageCodec.encodeJpeg(img)
    val (jpgFmt, jpgDec) = ImageCodec.decodeImageIO(jpg).get
    assert(jpgFmt === "jpeg")
    assert(jpgDec.width === 16 && jpgDec.height === 12)
    val mae = img.rgb.zip(jpgDec.rgb)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.sum.toDouble / img.rgb.length
    assert(mae < 32.0, s"JPEG decode too far from source (mae=$mae)")
    // decode() dispatches: PPM/BMP via the byte decoders, PNG/JPEG via
    // ImageIO, and decodeImage reports the format
    assert(Multimodal.decodeImage(png).map(_._1) === Some("png"))
    assert(Multimodal.decodeImage(jpg).map(_._1) === Some("jpeg"))
    // corrupt payloads: truncated PNG/JPEG and garbage all → None, no throw
    assert(ImageCodec.decodeImageIO(png.take(20)) === None)
    assert(ImageCodec.decodeImageIO(jpg.take(20)) === None)
    assert(ImageCodec.decodeImageIO(Array.fill[Byte](64)(0x42)) === None)
    assert(ImageCodec.decodeImageIO(null) === None)
    assert(ImageCodec.decodeImageIO(Array.emptyByteArray) === None)
  }

  test("Multimodal decode routes JPEG/PNG payloads through ImageIO with real features") {
    val spark = Graft.session("image-codec-spec", "local[4]", 4)
    import spark.implicits._
    val img = px(10, 8)((x, y) => (x * 20, y * 30, 64))
    val rows = Seq(
      (1L, ImageCodec.encodePng(img)),
      (2L, ImageCodec.encodeJpeg(img))).toDF("doc_id", "media")
    val dec = Multimodal.decode(spark, rows, "doc_id", "media").collect()
      .map(r => r.id -> r).toMap
    assert(dec(1L).format === "png" && dec(1L).width === 10 && dec(1L).height === 8)
    assert(dec(2L).format === "jpeg" && dec(2L).width === 10)
    // PNG decode is exact, so its feature equals the source image's
    assert(dec(1L).feature.toSeq === ImageCodec.feature(img).toSeq)
    // resize of an ImageIO payload re-encodes PNG at the new dims
    val resized = Multimodal.decode(spark,
      Multimodal.resize(spark, rows.where($"doc_id" === 1), "doc_id", "media", 5, 4).toDF(),
      "id", "media").head()
    assert(resized.format === "png" && resized.width === 5 && resized.height === 4)
    assert(resized.feature.toSeq ===
      ImageCodec.feature(ImageCodec.resizeNearest(img, 5, 4)).toSeq)
  }

  test("Multimodal decode and resize use the real codec for PPM/BMP payloads") {
    val spark = Graft.session("image-codec-spec", "local[4]", 4)
    import spark.implicits._
    val img = px(8, 6)((x, y) => (x * 30, y * 40, 128))
    val rows = Seq(
      (1L, ImageCodec.encodePpm(img)),
      (2L, ImageCodec.encodeBmp(img)),
      (3L, Multimodal.encodeFake("vid", 320, 240, 10, Array[Byte](1, 2, 3))),
      (4L, Array[Byte](9, 9, 9))) // corrupt — dropped
      .toDF("doc_id", "media")
    val dec = Multimodal.decode(spark, rows, "doc_id", "media").collect()
      .map(r => r.id -> r).toMap
    assert(dec.keySet === Set(1L, 2L, 3L))
    assert(dec(1L).format === "ppm" && dec(1L).width === 8 && dec(1L).height === 6)
    assert(dec(2L).format === "bmp" && dec(2L).width === 8 && dec(2L).height === 6)
    // PPM and BMP of the SAME pixels produce the SAME real feature
    assert(dec(1L).feature.toSeq === dec(2L).feature.toSeq)
    assert(dec(3L).format === "vid" && dec(3L).frames === 10)
    // real resize: decoded dims change AND pixel content is the resize
    val resized = Multimodal.decode(spark,
      Multimodal.resize(spark, rows.where($"doc_id" === 1), "doc_id", "media", 4, 3).toDF(),
      "id", "media").head()
    assert(resized.width === 4 && resized.height === 3)
    val expect = ImageCodec.feature(ImageCodec.resizeNearest(img, 4, 3))
    assert(resized.feature.toSeq === expect.toSeq)
  }
}
