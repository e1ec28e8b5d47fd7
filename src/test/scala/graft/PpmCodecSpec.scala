package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal
import graft.ops.Multimodal.{MediaRow, PpmCodec}

/** The REAL image path: PPM (P6) encode/decode round-trip, malformed
  * quarantine, nearest-neighbour resize, channel statistics, and the
  * per-partition Spark decode over binary payload columns.
  */
class PpmCodecSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def px(r: Int, g: Int, b: Int) = Seq(r.toByte, g.toByte, b.toByte)

  /** 4x2: left half pure red, right half pure blue. */
  private val halves = PpmCodec.Image(4, 2,
    (Seq.fill(2)(px(255, 0, 0)) ++ Seq.fill(2)(px(0, 0, 255)) ++
      Seq.fill(2)(px(255, 0, 0)) ++ Seq.fill(2)(px(0, 0, 255))).flatten.toArray)

  test("encode/decode round-trips bytes exactly; comments and whitespace parse") {
    val decoded = PpmCodec.decode(PpmCodec.encode(halves)).get
    assert(decoded.width === 4 && decoded.height === 2)
    assert(decoded.rgb.toSeq === halves.rgb.toSeq)
    val commented = ("P6\n# a comment\n 4 \n# another\n2\n255\n"
      .getBytes("US-ASCII") ++ halves.rgb)
    assert(PpmCodec.decode(commented).map(_.rgb.toSeq) === Some(halves.rgb.toSeq))
  }

  test("malformed inputs quarantine as None, never throw") {
    val good = PpmCodec.encode(halves)
    assert(PpmCodec.decode("P5\n4 2\n255\n".getBytes("US-ASCII") ++ halves.rgb) === None,
      "wrong magic")
    assert(PpmCodec.decode(good.dropRight(1)) === None, "truncated raster")
    assert(PpmCodec.decode("P6\n0 2\n255\nxx".getBytes("US-ASCII")) === None, "zero dim")
    assert(PpmCodec.decode("P6\n4 2\n65535\n".getBytes("US-ASCII")) === None, "16-bit maxval")
    assert(PpmCodec.decode(Array.empty[Byte]) === None, "empty")
  }

  test("nearest-neighbour resize picks exact source pixels") {
    val small = PpmCodec.resize(halves, 2, 1)
    // x=0 -> sx=0 (red), x=1 -> sx=2 (blue); y=0 -> sy=0
    assert(small.rgb.toSeq === (px(255, 0, 0) ++ px(0, 0, 255)))
    val big = PpmCodec.resize(small, 4, 2)
    assert(big.width === 4 && big.height === 2)
  }

  test("channel statistics are exact on the two-tone image") {
    val f = PpmCodec.features(halves)
    assert(f(0) === 4.0 && f(1) === 2.0)
    assert(f(2) === 127.5 && f(3) === 0.0 && f(4) === 127.5) // half red, half blue
    val lumaR = 0.299 * 255; val lumaB = 0.114 * 255
    assert(math.abs(f(5) - (lumaR + lumaB) / 2) < 1e-9)
    assert(math.abs(f(6) - math.abs(lumaR - lumaB) / 2) < 1e-9)
  }

  test("per-partition Spark decode: good rows featurize, bad rows quarantine with n_frames=0") {
    val good = PpmCodec.encode(halves)
    val rows = Seq(
      MediaRow(1L, "image", good, good.length.toLong, "ppm"),
      MediaRow(2L, "image", "not an image".getBytes("US-ASCII"), 12L, "ppm"),
      MediaRow(3L, "image", PpmCodec.encode(PpmCodec.resize(halves, 8, 8)), 0L, "ppm"))
    val ds = spark.createDataset(rows)
    val out = Multimodal.decodePpmFeatures(ds).collect().map(f => f.media_id -> f).toMap
    assert(out(1L).n_frames === 1 && out(1L).features(0) === 4.0)
    assert(out(2L).n_frames === 0 && out(2L).features.isEmpty)
    assert(out(3L).n_frames === 1 && out(3L).features(0) === 8.0)
    // resize-on-decode normalizes resolution before featurizing
    val resized = Multimodal.decodePpmFeatures(ds, resizeTo = Some((2, 2)))
      .collect().map(f => f.media_id -> f).toMap
    assert(resized(1L).features(0) === 2.0 && resized(3L).features(0) === 2.0)
  }
}
