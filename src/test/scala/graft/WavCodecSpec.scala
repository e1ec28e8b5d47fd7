package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal
import graft.ops.Multimodal.{MediaRow, WavCodec}

/** The REAL audio path: WAV (RIFF/PCM16) encode/decode round-trip,
  * unknown-chunk skipping, malformed quarantine, exact signal
  * statistics, and the per-partition Spark decode.
  */
class WavCodecSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def squareWave(n: Int, period: Int, amp: Short): Array[Short] =
    Array.tabulate(n)(i => if ((i / (period / 2)) % 2 == 0) amp else (-amp).toShort)

  test("encode/decode round-trips samples, rate, and channels") {
    val a = WavCodec.Audio(8000, 1, squareWave(800, 8, 1000))
    val d = WavCodec.decode(WavCodec.encode(a)).get
    assert(d.sampleRate === 8000 && d.channels === 1)
    assert(d.samples.toSeq === a.samples.toSeq)
    val st = WavCodec.Audio(16000, 2, Array[Short](1, 2, 3, 4, 5, 6))
    assert(WavCodec.decode(WavCodec.encode(st)).get.channels === 2)
  }

  test("unknown chunks are skipped like a real reader") {
    val a = WavCodec.Audio(8000, 1, Array[Short](100, -100, 100, -100))
    val canonical = WavCodec.encode(a)
    // splice a LIST chunk (5 bytes + pad) between fmt and data
    val (head, tail) = canonical.splitAt(36)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++ Array[Byte](0)
    val riffLen = java.nio.ByteBuffer.wrap(canonical, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt + list.length
    val spliced = head ++ list ++ tail
    java.nio.ByteBuffer.wrap(spliced, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(riffLen)
    assert(WavCodec.decode(spliced).map(_.samples.toSeq) === Some(a.samples.toSeq))
  }

  test("malformed inputs quarantine as None, never throw") {
    val good = WavCodec.encode(WavCodec.Audio(8000, 1, squareWave(100, 4, 500)))
    assert(WavCodec.decode(good.dropRight(3)) === None, "truncated data")
    assert(WavCodec.decode("FFIR".getBytes("US-ASCII") ++ good.drop(4)) === None, "bad magic")
    val nonPcm = good.clone()
    nonPcm(20) = 3 // IEEE float codec tag
    assert(WavCodec.decode(nonPcm) === None, "non-PCM")
    val lyingSize = good.clone()
    java.nio.ByteBuffer.wrap(lyingSize, 40, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(Int.MaxValue - 7)
    assert(WavCodec.decode(lyingSize) === None, "lying data-chunk size")
    assert(WavCodec.decode(Array.empty[Byte]) === None, "empty")
  }

  test("signal statistics are exact on a square wave") {
    // 8000 Hz, 1 s, period 8 → amplitude constant ±1000:
    // rms = 1000/32768, one sign flip every 4 samples → zcr = 1999 Hz
    val a = WavCodec.Audio(8000, 1, squareWave(8000, 8, 1000))
    val f = WavCodec.features(a)
    assert(f(0) === 1.0)
    assert(math.abs(f(1) - 1000.0 / 32768) < 1e-12)
    assert(f(2) === 1999.0)
  }

  test("per-partition Spark decode: good rows featurize, bad rows quarantine") {
    val good = WavCodec.encode(WavCodec.Audio(8000, 1, squareWave(400, 4, 2000)))
    val rows = Seq(
      MediaRow(1L, "audio", good, good.length.toLong, "wav"),
      MediaRow(2L, "audio", "definitely not riff".getBytes("US-ASCII"), 19L, "wav"))
    val out = Multimodal.decodeWavFeatures(spark.createDataset(rows))
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).n_frames === 1 && math.abs(out(1L).features(0) - 0.05) < 1e-12)
    assert(out(2L).n_frames === 0 && out(2L).features.isEmpty)
  }
}
