package graft.ops

/** REAL baseline JPEG (ITU-T T.81 sequential DCT) codec — pure JVM, no
  * native libraries, closing the codec slot SURVEY §7.5h reserved for
  * JNI/FFI image bindings the same way [[Multimodal.PpmCodec]] closed
  * the raster slot: an actual bitstream walk, not a stub.
  *
  * Decoder scope (what real baseline interchange streams use):
  *  - marker parse: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS/RSTn/EOI;
  *  - 8-bit quantization tables, canonical Huffman tables (T.81 §C.2);
  *  - 1- or 3-component scans, sampling factors h,v ∈ {1,2} with the
  *    full interleaved-MCU layout (so libjpeg/ImageIO 4:2:0 color
  *    output decodes, not just this encoder's own 4:4:4);
  *  - byte-stuffing (FF 00), restart-marker DC-predictor resets;
  *  - dequant → separable double-precision IDCT → level shift/clamp →
  *    (for color) JFIF YCbCr→RGB.
  * Anything outside that — progressive SOF2, arithmetic coding, 12-bit
  * precision, 4-component CMYK — QUARANTINES (None), never throws: the
  * q_safe_cast contract applied to binary intake, same as the PPM/WAV
  * codecs. Conformance is spec-pinned against the JDK's own libjpeg-
  * derived ImageIO decoder (JpegCodecSpec: my decode of ImageIO's
  * encode, and ImageIO's decode of my encode, within the ±1 IDCT
  * variance T.81 Annex A allows).
  *
  * Encoder scope: grayscale baseline (one component, 4:4:4), Annex K
  * luminance quantization + Huffman tables — enough to plant
  * deterministic payloads whose decode the DuckDB oracle can restate
  * arithmetically (per-8×8-block-constant rasters: every AC quantizes
  * to zero and the DC path is exact integer arithmetic, so block
  * values round-trip bit-exactly while still exercising DC prediction,
  * Huffman coding, and the MCU walk).
  *
  * The production swap at 100 TB is unchanged from the PPM story: this
  * object's encode/decode are the only seams; a libjpeg-turbo FFI
  * binding drops in behind the same signatures. The naive O(64²)
  * per-block IDCT is the clarity choice — the AAN fast path is a
  * drop-in replacement documented there.
  */
object Jpeg {

  // ---- tables (ITU-T T.81 Annex K) ------------------------------------

  /** Annex K Table K.1 luminance quantization, natural (row-major) order. */
  private[ops] val QLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Zig-zag scan: zigzag index -> natural index. */
  private[ops] val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // std luminance DC: (BITS, HUFFVAL) per T.81 K.3.1
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  // std luminance AC per T.81 K.3.2
  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  private val CosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }
  private val C: Array[Double] = Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  // ---- canonical Huffman (T.81 §C.2) ----------------------------------

  /** (code, length) per symbol — encoder side. */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = scala.collection.mutable.Map[Int, (Int, Int)]()
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len)) {
        out(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.toMap
  }

  /** Decoder side: MINCODE/MAXCODE/VALPTR per length (F.2.2.3). */
  private final class DecodeTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val huffVal: Array[Int] = vals
    locally {
      var code = 0; var k = 0
      for (len <- 1 to 16) {
        if (bits(len) == 0) { maxCode(len) = -1 }
        else {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len); k += bits(len)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
  }

  // ---- bit I/O ---------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** pad the final partial byte with 1-bits (F.1.2.3). */
    def flush(): Unit = if (nbits > 0) put(0xff, 8 - nbits)
  }

  /** Entropy-segment reader: un-stuffs FF 00, stops at any marker. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var hitMarker = false
    /** next bit, or -1 on exhausted/marker (decode then quarantines). */
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= bytes.length) return -1
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= bytes.length) return -1
          val b2 = bytes(pos) & 0xff
          if (b2 == 0x00) { pos += 1 } // stuffed FF
          else { hitMarker = true; pos -= 1; return -1 }
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bitsValue(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val b = bit(); if (b < 0) return Int.MinValue
        v = (v << 1) | b; i += 1
      }
      v
    }
    /** drop the partial byte (before a restart marker). */
    def align(): Unit = nbits = 0
  }

  private def decodeHuffSym(r: BitReader, t: DecodeTable): Int = {
    var code = 0
    var len = 0
    while (len < 16) {
      val b = r.bit(); if (b < 0) return -1
      code = (code << 1) | b
      len += 1
      if (t.maxCode(len) >= 0 && code <= t.maxCode(len) && code >= t.minCode(len))
        return t.huffVal(t.valPtr(len) + code - t.minCode(len))
    }
    -1
  }

  /** DIFF/AC magnitude decode (F.2.2.1 EXTEND). */
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  // ---- encoder (grayscale baseline) ------------------------------------

  /** Magnitude category + code bits for a signed value (F.1.2.1). */
  private def magnitude(v: Int): (Int, Int) = {
    if (v == 0) return (0, 0)
    val a = math.abs(v)
    var n = 0
    while ((a >> n) != 0) n += 1
    val bitsV = if (v > 0) v else v + (1 << n) - 1
    (n, bitsV)
  }

  /** Encode an 8-bit grayscale raster as a baseline JFIF JPEG.
    * Dimensions need not be multiples of 8 (edge pixels replicate into
    * the partial blocks, the standard move).
    */
  def encodeGray(width: Int, height: Int, y: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && y.length == width * height,
      s"raster shape mismatch: $width x $height vs ${y.length} bytes")
    // SOF0/APP0 carry dimensions as 16-bit fields (T.81 B.2.2): larger
    // values would silently truncate into a structurally corrupt stream.
    require(width <= 65535 && height <= 65535,
      s"baseline JPEG dimensions are 16-bit: $width x $height")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      payload.foreach(b => out.write(b & 0xff))
    }
    marker(0xd8) // SOI
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0
    seg(0xdb, 0 +: ZigZag.map(QLum(_))) // DQT: table 0, 8-bit, zigzag order
    seg(0xc0, Array(8, (height >> 8) & 0xff, height & 0xff,
      (width >> 8) & 0xff, width & 0xff, 1, 1, 0x11, 0)) // SOF0 gray
    seg(0xc4, 0x00 +: (DcLumBits.drop(1) ++ DcLumVals)) // DHT DC 0
    seg(0xc4, 0x10 +: (AcLumBits.drop(1) ++ AcLumVals)) // DHT AC 0
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0)) // SOS
    val dcT = buildEncodeTable(DcLumBits, DcLumVals)
    val acT = buildEncodeTable(AcLumBits, AcLumVals)
    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val tmp = new Array[Double](64)
    val coef = new Array[Int](64)
    var prevDc = 0
    var by = 0
    while (by < height) {
      var bx = 0
      while (bx < width) {
        // load block with edge replication, level-shifted
        var i = 0
        while (i < 64) {
          val px = math.min(bx + i % 8, width - 1)
          val py = math.min(by + i / 8, height - 1)
          block(i) = (y(py * width + px) & 0xff) - 128.0
          i += 1
        }
        // forward DCT — SEPARABLE row/column passes (8 mults per
        // output per pass instead of the 64 of the naive double sum;
        // the zero AC terms of constant blocks still cancel exactly,
        // so the integer-DC family stays bit-stable) + quantize
        var u0 = 0
        while (u0 < 8) { // tmp(u, y) = Σx block(y, x)·cos(x, u)
          var yy = 0
          while (yy < 8) {
            var s = 0.0
            var x = 0
            while (x < 8) { s += block(yy * 8 + x) * CosTab(x)(u0); x += 1 }
            tmp(u0 * 8 + yy) = s
            yy += 1
          }
          u0 += 1
        }
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            var s = 0.0
            var yy = 0
            while (yy < 8) { s += tmp(u * 8 + yy) * CosTab(yy)(v); yy += 1 }
            val f = 0.25 * C(u) * C(v) * s
            coef(v * 8 + u) = math.rint(f / QLum(v * 8 + u)).toInt
            u += 1
          }
          v += 1
        }
        // DC diff
        val (dn, db) = magnitude(coef(0) - prevDc)
        prevDc = coef(0)
        val (dcCode, dcLen) = dcT(dn)
        bw.put(dcCode, dcLen); if (dn > 0) bw.put(db, dn)
        // AC run-length in zigzag order
        var run = 0
        var zi = 1
        while (zi < 64) {
          val c = coef(ZigZag(zi))
          if (c == 0) run += 1
          else {
            while (run > 15) { val (zc, zl) = acT(0xf0); bw.put(zc, zl); run -= 16 }
            val (an, ab) = magnitude(c)
            val (code, len) = acT((run << 4) | an)
            bw.put(code, len); bw.put(ab, an)
            run = 0
          }
          zi += 1
        }
        if (run > 0) { val (ec, el) = acT(0x00); bw.put(ec, el) } // EOB
        bx += 8
      }
      by += 8
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder (baseline sequential) -----------------------------------

  private final case class Component(id: Int, h: Int, v: Int, tq: Int,
                                     var dcTable: Int = 0, var acTable: Int = 0)

  /** Baseline decode to an RGB24 [[Multimodal.PpmCodec.Image]]
    * (grayscale replicates Y into the three channels, so every
    * downstream feature/resize/aHash path is format-agnostic). None on
    * anything malformed or out of the baseline scope — quarantine,
    * never throw.
    */
  def decode(bytes: Array[Byte]): Option[Multimodal.PpmCodec.Image] =
    try decodeImpl(bytes) catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImpl(bytes: Array[Byte]): Option[Multimodal.PpmCodec.Image] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    var pos = 2
    val qTables = new Array[Array[Int]](4)
    val dcTables = new Array[DecodeTable](4)
    val acTables = new Array[DecodeTable](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    def u16(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    while (pos + 4 <= bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) return None
      // T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
      // marker code — skip padding so conformant streams from other
      // encoders don't quarantine on the second 0xFF.
      while (pos + 4 <= bytes.length && (bytes(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 4 > bytes.length) return None // fill bytes ran into EOF
      val m = bytes(pos + 1) & 0xff
      pos += 2
      m match {
        case 0xd9 => return None // EOI before any scan
        case 0x01 => () // TEM, no payload
        case mm if mm >= 0xd0 && mm <= 0xd7 => () // stray RST
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // progressive/arithmetic/hierarchical: out of scope
        case _ =>
          if (pos + 2 > bytes.length) return None
          val len = u16(pos)
          if (len < 2 || pos + len > bytes.length) return None
          val end = pos + len
          var p = pos + 2
          m match {
            case 0xdb => // DQT (possibly several tables)
              while (p < end) {
                val pq = (bytes(p) & 0xff) >> 4
                val tq = bytes(p) & 0x0f
                if (pq != 0 || tq > 3 || p + 65 > end) return None // 8-bit only
                val t = new Array[Int](64)
                var i = 0
                while (i < 64) { t(ZigZag(i)) = bytes(p + 1 + i) & 0xff; i += 1 }
                qTables(tq) = t
                p += 65
              }
            case 0xc4 => // DHT (possibly several tables)
              while (p < end) {
                val tc = (bytes(p) & 0xff) >> 4
                val th = bytes(p) & 0x0f
                if (tc > 1 || th > 3 || p + 17 > end) return None
                val bits = new Array[Int](17)
                var total = 0
                var i = 1
                while (i <= 16) { bits(i) = bytes(p + i) & 0xff; total += bits(i); i += 1 }
                if (p + 17 + total > end) return None
                val vals = new Array[Int](total)
                i = 0
                while (i < total) { vals(i) = bytes(p + 17 + i) & 0xff; i += 1 }
                val t = new DecodeTable(bits, vals)
                if (tc == 0) dcTables(th) = t else acTables(th) = t
                p += 17 + total
              }
            case 0xc0 | 0xc1 => // SOF0/1 (extended sequential decodes the same)
              if (p + 6 > end) return None
              if ((bytes(p) & 0xff) != 8) return None // 8-bit precision only
              height = u16(p + 1); width = u16(p + 3)
              val nc = bytes(p + 5) & 0xff
              if (width <= 0 || height <= 0 || (nc != 1 && nc != 3)) return None
              if (p + 6 + 3 * nc > end) return None
              comps = Array.tabulate(nc) { i =>
                val q = p + 6 + 3 * i
                val hv = bytes(q + 1) & 0xff
                Component(bytes(q) & 0xff, hv >> 4, hv & 0x0f, bytes(q + 2) & 0xff)
              }
              if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 || c.tq > 3))
                return None
            case 0xdd => // DRI
              if (len != 4) return None
              restartInterval = u16(p)
            case 0xda => // SOS → entropy-coded data follows
              if (comps == null) return None
              val ns = bytes(p) & 0xff
              if (ns != comps.length || p + 1 + 2 * ns + 3 > end) return None
              var i = 0
              while (i < ns) {
                val cid = bytes(p + 1 + 2 * i) & 0xff
                val tt = bytes(p + 2 + 2 * i) & 0xff
                val comp = comps.find(_.id == cid).getOrElse(return None)
                comp.dcTable = tt >> 4; comp.acTable = tt & 0x0f
                i += 1
              }
              return decodeScan(bytes, end, comps, width, height,
                qTables, dcTables, acTables, restartInterval)
            case _ => () // APPn/COM: skip
          }
          pos = end
      }
    }
    None // no SOS reached
  }

  private def decodeScan(bytes: Array[Byte], scanStart: Int, comps: Array[Component],
                         width: Int, height: Int, qTables: Array[Array[Int]],
                         dcTables: Array[DecodeTable], acTables: Array[DecodeTable],
                         restartInterval: Int): Option[Multimodal.PpmCodec.Image] = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // per-component plane at its own (subsampled) resolution
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planeH = comps.map(c => mcusY * 8 * c.v)
    val planes = comps.indices.map(i => new Array[Byte](planeW(i) * planeH(i))).toArray
    comps.foreach { c =>
      if (qTables(c.tq) == null) return None
      if (dcTables(c.dcTable) == null || acTables(c.acTable) == null) return None
    }
    val r = new BitReader(bytes, scanStart)
    val prevDc = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val itmp = new Array[Double](64)
    val pix = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // RSTn: aligned marker, reset predictors
        r.align()
        if (r.pos + 2 > bytes.length || (bytes(r.pos) & 0xff) != 0xff) return None
        val m = bytes(r.pos + 1) & 0xff
        if (m < 0xd0 || m > 0xd7) return None
        r.pos += 2
        r.hitMarker = false
        java.util.Arrays.fill(prevDc, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qTables(c.tq)
        var bv = 0
        while (bv < c.v) {
          var bh = 0
          while (bh < c.h) {
            // one block: DC + AC entropy decode into natural order
            java.util.Arrays.fill(coef, 0)
            val dn = decodeHuffSym(r, dcTables(c.dcTable))
            if (dn < 0 || dn > 15) return None
            val diffBits = if (dn == 0) 0 else r.bitsValue(dn)
            if (diffBits == Int.MinValue) return None
            prevDc(ci) += extend(diffBits, dn)
            coef(0) = prevDc(ci) * q(0)
            var zi = 1
            while (zi < 64) {
              val rs = decodeHuffSym(r, acTables(c.acTable))
              if (rs < 0) return None
              if (rs == 0x00) zi = 64 // EOB
              else if (rs == 0xf0) zi += 16 // ZRL
              else {
                zi += rs >> 4
                val an = rs & 0x0f
                if (zi > 63) return None
                val ab = r.bitsValue(an)
                if (ab == Int.MinValue) return None
                val nat = ZigZag(zi)
                coef(nat) = extend(ab, an) * q(nat)
                zi += 1
              }
            }
            // IDCT — SEPARABLE row/column passes (the clarity-first
            // double-precision form; AAN integer is the next speed
            // tier). g(x, v) = Σu C(u)·coef(v,u)·cos(x, u); zero
            // coefficients contribute exactly 0.0, so the integer-DC
            // family decodes bit-identically to the naive double sum.
            var xx0 = 0
            while (xx0 < 8) {
              var v = 0
              while (v < 8) {
                var s = 0.0
                var u = 0
                while (u < 8) { s += C(u) * coef(v * 8 + u) * CosTab(xx0)(u); u += 1 }
                itmp(xx0 * 8 + v) = s
                v += 1
              }
              xx0 += 1
            }
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                var s = 0.0
                var v = 0
                while (v < 8) { s += C(v) * itmp(xx * 8 + v) * CosTab(yy)(v); v += 1 }
                val p0 = math.rint(s / 4.0).toInt + 128
                pix(yy * 8 + xx) = if (p0 < 0) 0 else if (p0 > 255) 255 else p0
                xx += 1
              }
              yy += 1
            }
            // place into the component plane
            val ox = (mx * c.h + bh) * 8
            val oy = (my * c.v + bv) * 8
            var py = 0
            while (py < 8) {
              var px = 0
              while (px < 8) {
                planes(ci)((oy + py) * planeW(ci) + ox + px) = pix(py * 8 + px).toByte
                px += 1
              }
              py += 1
            }
            bh += 1
          }
          bv += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // assemble RGB24 at full resolution (nearest upsample per component)
    val rgb = new Array[Byte](width * height * 3)
    var y0 = 0
    while (y0 < height) {
      var x0 = 0
      while (x0 < width) {
        val o = (y0 * width + x0) * 3
        if (comps.length == 1) {
          val g = planes(0)((y0 * comps(0).v / vMax) * planeW(0) + x0 * comps(0).h / hMax)
          rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
        } else {
          def sample(ci: Int): Int = {
            val c = comps(ci)
            val sx = x0 * c.h / hMax
            val sy = y0 * c.v / vMax
            planes(ci)(sy * planeW(ci) + sx) & 0xff
          }
          val yv = sample(0).toDouble
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          def clamp(d: Double): Byte = {
            val v = math.rint(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          rgb(o) = clamp(yv + 1.402 * cr)
          rgb(o + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
          rgb(o + 2) = clamp(yv + 1.772 * cb)
        }
        x0 += 1
      }
      y0 += 1
    }
    Some(Multimodal.PpmCodec.Image(width, height, rgb))
  }

  /** Per-partition REAL JPEG decode over payload rows — same
    * quarantine contract as [[Multimodal.decodePpmFeatures]]: parsed
    * rows carry (n_frames = 1, the PPM feature vector over the decoded
    * raster); malformed/out-of-scope payloads surface with n_frames =
    * 0 and empty features — quarantined, never dropped, never
    * throwing.
    */
  def decodeJpegFeatures(media: org.apache.spark.sql.Dataset[Multimodal.MediaRow],
                         resizeTo: Option[(Int, Int)] = None)
      : org.apache.spark.sql.Dataset[Multimodal.MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { row =>
        decode(row.bytes) match {
          case Some(img0) =>
            val img = resizeTo.map { case (w, h) => Multimodal.PpmCodec.resize(img0, w, h) }
              .getOrElse(img0)
            Multimodal.MediaFeatures(row.media_id, row.kind, 1, Multimodal.PpmCodec.features(img))
          case None =>
            Multimodal.MediaFeatures(row.media_id, row.kind, 0, Array.empty[Double])
        }
      }
    }
  }
}
