package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Jpeg, Multimodal}
import graft.ops.Multimodal.{MediaRow, PpmCodec}

/** The REAL baseline-JPEG path: bit-lossless round trip on the exact
  * integer DC family, two-directional conformance against the JDK's
  * libjpeg-derived ImageIO codec (my decode of ImageIO's encode AND
  * ImageIO's decode of my encode, within the ±1 IDCT variance T.81
  * Annex A allows), malformed/out-of-scope quarantine, and the
  * per-partition Spark decode over payload columns.
  */
class JpegCodecSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def grayRaster(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(w * h)(i => f(i % w, i / w).toByte)

  private def imageIoDecodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not parse the stream")
    val w = img.getWidth; val h = img.getHeight
    // raw raster samples: getRGB on TYPE_BYTE_GRAY routes through a
    // gray->sRGB colorspace conversion (gamma), NOT the decoded values
    val lum = Array.tabulate(w * h)(i => img.getRaster.getSample(i % w, i / w, 0))
    (w, h, lum)
  }

  private def imageIoEncode(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out), "no JPEG writer")
    out.toByteArray
  }

  test("block-constant rasters with even offsets round-trip bit-exactly") {
    // 3x2 blocks, values 100,102,...,110 — DC quantization is exact
    // integer arithmetic, so decode must reproduce the input verbatim
    val w = 24; val h = 16
    val y = grayRaster(w, h)((x, yy) => 100 + 2 * ((yy / 8) * 3 + x / 8))
    val dec = Jpeg.decode(Jpeg.encodeGray(w, h, y)).get
    assert(dec.width === w && dec.height === h)
    var i = 0
    while (i < w * h) {
      val g = dec.rgb(i * 3) & 0xff
      assert(g === (y(i) & 0xff), s"pixel $i: got $g want ${y(i) & 0xff}")
      assert((dec.rgb(i * 3 + 1) & 0xff) === g && (dec.rgb(i * 3 + 2) & 0xff) === g,
        "grayscale must replicate into all three channels")
      i += 1
    }
  }

  test("conformance A: ImageIO decodes MY encode within the +-1 IDCT variance") {
    // a real gradient — nonzero AC coefficients down the whole zigzag
    val w = 40; val h = 24
    val y = grayRaster(w, h)((x, yy) => (x * 5 + yy * 3) % 256)
    val bytes = Jpeg.encodeGray(w, h, y)
    val (iw, ih, ref) = imageIoDecodeGray(bytes)
    assert(iw === w && ih === h)
    val mine = Jpeg.decode(bytes).get
    var maxDiff = 0
    var i = 0
    while (i < w * h) {
      maxDiff = math.max(maxDiff, math.abs((mine.rgb(i * 3) & 0xff) - ref(i)))
      i += 1
    }
    assert(maxDiff <= 1, s"decoders disagree by $maxDiff (> the T.81 IDCT variance)")
  }

  test("conformance B: MY decoder reads ImageIO's gray encode like ImageIO does") {
    val w = 32; val h = 24
    val buf = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until h).foreach(yy => (0 until w).foreach { x =>
      val g = (x * 7 + yy * 11) % 256
      buf.getRaster.setSample(x, yy, 0, g) // raw sample; setRGB would gamma-convert
    })
    val bytes = imageIoEncode(buf)
    val (iw, ih, ref) = imageIoDecodeGray(bytes)
    val mine = Jpeg.decode(bytes)
      .getOrElse(fail("my decoder rejected a stock ImageIO baseline gray stream"))
    assert(mine.width === iw && mine.height === ih)
    var maxDiff = 0
    var i = 0
    while (i < iw * ih) {
      maxDiff = math.max(maxDiff, math.abs((mine.rgb(i * 3) & 0xff) - ref(i)))
      i += 1
    }
    assert(maxDiff <= 1, s"gray conformance off by $maxDiff")
  }

  test("conformance C: MY decoder reads ImageIO's 4:2:0 COLOR encode (solid color)") {
    // solid color: any chroma upsampling strategy agrees, isolating the
    // interleaved-MCU walk + YCbCr->RGB math from upsample flavor
    val w = 24; val h = 16
    val buf = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    (0 until h).foreach(yy => (0 until w).foreach(x => buf.setRGB(x, yy, 0x4080c0)))
    val bytes = imageIoEncode(buf)
    val mine = Jpeg.decode(bytes)
      .getOrElse(fail("my decoder rejected a stock ImageIO 4:2:0 color stream"))
    assert(mine.width === w && mine.height === h)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    var i = 0
    while (i < w * h) {
      val rgb = ref.getRGB(i % w, i / w)
      maxDiff = math.max(maxDiff,
        math.abs((mine.rgb(i * 3) & 0xff) - ((rgb >> 16) & 0xff)) max
          math.abs((mine.rgb(i * 3 + 1) & 0xff) - ((rgb >> 8) & 0xff)) max
          math.abs((mine.rgb(i * 3 + 2) & 0xff) - (rgb & 0xff)))
      i += 1
    }
    assert(maxDiff <= 1, s"color conformance off by $maxDiff")
  }

  test("non-multiple-of-8 dimensions round through edge replication") {
    val w = 13; val h = 9
    val y = grayRaster(w, h)((x, yy) => 96 + 2 * ((x / 8) + (yy / 8)))
    val dec = Jpeg.decode(Jpeg.encodeGray(w, h, y)).get
    assert(dec.width === w && dec.height === h)
    // interior of the first block is constant 96 — must survive exactly
    assert((dec.rgb(0) & 0xff) === 96)
  }

  test("malformed and out-of-scope streams quarantine as None, never throw") {
    val good = Jpeg.encodeGray(16, 16, grayRaster(16, 16)((_, _) => 128))
    assert(Jpeg.decode(Array.empty[Byte]) === None, "empty")
    assert(Jpeg.decode(Array[Byte](1, 2, 3)) === None, "garbage")
    assert(Jpeg.decode(good.take(10)) === None, "truncated in APP0")
    assert(Jpeg.decode(good.dropRight(good.length / 2)) === None, "truncated entropy data")
    val wrongMagic = good.clone(); wrongMagic(1) = 0x00
    assert(Jpeg.decode(wrongMagic) === None, "bad SOI")
    // flip SOF0 -> SOF2 (progressive) with its segment intact: scope gate
    val prog = good.clone()
    var i = 2
    var flipped = false
    while (i + 1 < prog.length && !flipped) {
      if ((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0) {
        prog(i + 1) = 0xc2.toByte; flipped = true
      }
      i += 1
    }
    assert(flipped && Jpeg.decode(prog) === None, "progressive must quarantine")
  }

  test("0xFF fill bytes before markers are T.81-legal padding, not corruption") {
    // B.1.1.2: any number of 0xFF bytes may precede a marker code.
    // Splice extra 0xFF padding in front of every marker segment after
    // SOI and assert the stream still decodes to the same raster.
    val w = 16; val h = 16
    val y = grayRaster(w, h)((x, _) => 100 + 2 * (x / 8))
    val good = Jpeg.encodeGray(w, h, y)
    val out = new java.io.ByteArrayOutputStream()
    out.write(good(0)); out.write(good(1)) // SOI verbatim
    var i = 2
    var inEntropy = false
    while (i < good.length) {
      if (!inEntropy && (good(i) & 0xff) == 0xff && i + 1 < good.length &&
          (good(i + 1) & 0xff) != 0x00) {
        out.write(0xff); out.write(0xff) // two fill bytes before the marker
        if ((good(i + 1) & 0xff) == 0xda) inEntropy = true // SOS: stop splicing
      }
      out.write(good(i)); i += 1
    }
    val padded = out.toByteArray
    assert(padded.length > good.length, "padding was spliced")
    val dec = Jpeg.decode(padded)
    assert(dec.isDefined, "fill-byte-padded stream must decode")
    val ref = Jpeg.decode(good).get
    assert(dec.get.rgb.sameElements(ref.rgb) &&
      dec.get.width === ref.width && dec.get.height === ref.height)
    // padding that runs straight into EOF still quarantines cleanly
    assert(Jpeg.decode(good.take(2) ++ Array.fill(5)(0xff.toByte)) === None)
  }

  test("encodeGray rejects dimensions that overflow the 16-bit SOF0 fields") {
    intercept[IllegalArgumentException] {
      Jpeg.encodeGray(65536, 1, new Array[Byte](65536))
    }
    intercept[IllegalArgumentException] {
      Jpeg.encodeGray(1, 70000, new Array[Byte](70000))
    }
  }

  test("Spark decode path: features for clean rows, quarantine for corrupt") {
    val rows = (0L until 6L).map { id =>
      val v = (100 + 2 * id).toInt
      val bytes0 = Jpeg.encodeGray(16, 8, grayRaster(16, 8)((_, _) => v))
      val bytes = if (id == 3) bytes0.take(6) else bytes0
      MediaRow(id, "image", bytes, bytes.length.toLong, "jpeg")
    }
    val out = Jpeg.decodeJpegFeatures(spark.createDataset(rows))
      .collect().sortBy(_.media_id)
    assert(out.count(_.n_frames == 0) === 1 && out(3).n_frames === 0)
    out.filter(_.n_frames == 1).foreach { f =>
      val v = (100 + 2 * f.media_id).toDouble
      assert(f.features(0) === 16.0 && f.features(1) === 8.0)
      assert(f.features(2) === v, s"mean_gray for ${f.media_id}")
    }
  }
}
