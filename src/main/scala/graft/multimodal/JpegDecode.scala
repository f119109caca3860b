package graft.multimodal

/** Baseline sequential JPEG pixel decoder — pure JVM, no libraries:
  * segment walk (DQT/DHT/SOF0/SOF1/DRI/SOS), canonical Huffman
  * decoding (ITU-T T.81 §F.2.2.3 mincode/maxcode/valptr), entropy scan
  * with 0xFF00 byte-stuffing and restart-marker resync, dequantize +
  * de-zigzag, separable float IDCT, sampling-factor upsample (4:4:4,
  * 4:2:0, 4:2:2, and any h/v ≤ 4 via the same generic replicate path),
  * BT.601 YCbCr→RGB. Completes the format trio of native readers
  * (NGB, OPUS, OOXML) — the reference delegates all media to
  * out-of-scope tooling (`bruker_ftir_parser.py:7` posture), we walk
  * the bytes.
  *
  * Refuses (None, never throws): progressive (SOF2) and arithmetic
  * (SOF9+) coding, hierarchical frames, 12-bit precision, scans that
  * don't cover every frame component, and any truncated/hostile
  * structure — same refusal posture as the PNG palette and WAV
  * hostile-length paths.
  *
  * Output: (width, height, channels, samples) — interleaved row-major,
  * top-down, gray (1 component) or RGB (3 components, YCbCr decoded).
  */
private[multimodal] object JpegDecode {

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab: Int = 0
    var acTab: Int = 0
  }

  /** Control-flow exceptions inside the entropy loop; every public
    * path catches them into a None. */
  private final class Refuse(msg: String) extends RuntimeException(msg, null, false, false)
  private def refuse(msg: String): Nothing = throw new Refuse(msg)

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table per T.81 §C.2/§F.2.2.3. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // mincode/maxcode/valptr indexed by code length 1..16
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { minCode(l) = 0; maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
      if (k != vals.length) refuse("DHT count mismatch")
    }
  }

  /** Entropy-coded bit reader: 0xFF00 stuffing, markers surface as
    * [[MarkerInScan]] so the MCU loop can resync on RSTn. */
  private final class MarkerInScan(val marker: Int) extends RuntimeException(null, null, false, false)

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0

    def readBit(): Int = {
      if (cnt == 0) {
        if (pos >= b.length) refuse("truncated scan")
        val byte = b(pos) & 0xff
        pos += 1
        if (byte == 0xff) {
          if (pos >= b.length) refuse("truncated after 0xff")
          val next = b(pos) & 0xff
          if (next == 0x00) pos += 1 // stuffed data byte
          else { pos += 1; throw new MarkerInScan(next) }
        }
        buf = byte
        cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    /** Byte-align and consume an expected restart marker. */
    def resyncRestart(expected: Int): Unit = {
      cnt = 0
      // walk to the marker: any residual bytes, then optional 0xff
      // fill bytes, then the marker byte itself
      while (pos + 1 < b.length &&
        !((b(pos) & 0xff) == 0xff && (b(pos + 1) & 0xff) != 0x00)) pos += 1
      while (pos + 2 < b.length && (b(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 1 >= b.length) refuse("missing restart marker")
      val m = b(pos + 1) & 0xff
      if (m != 0xd0 + expected) refuse(s"restart marker out of order: $m")
      pos += 2
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def decodeHuff(r: BitReader, t: HuffTable): Int = {
    var code = r.readBit()
    var l = 1
    while (code > t.maxCode(l)) {
      if (l >= 16) refuse("invalid Huffman code")
      code = (code << 1) | r.readBit()
      l += 1
    }
    t.values(t.valPtr(l) + code - t.minCode(l))
  }

  // 1D IDCT basis: C(u)·cos((2x+1)uπ/16)/2, so out = Bᵀ·F·B per block
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Separable 8×8 IDCT, `coef` in natural order, output row-major. */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: tmp(u, x) over each coefficient row u=v-dim
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(y * 8 + u) * Basis(u)(x); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // columns
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += tmp(v * 8 + x) * Basis(v)(yy); v += 1 }
        val px = math.round(s).toInt + 128 // level shift
        out(yy * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        yy += 1
      }
      x += 1
    }
  }

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  /** Decode to (width, height, channels, interleaved samples). */
  def decode(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    try Some(decodeOrThrow(b))
    catch { case _: Refuse | _: MarkerInScan | _: ArrayIndexOutOfBoundsException |
                 _: NegativeArraySizeException => None }

  private def decodeOrThrow(b: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      refuse("not a JPEG")
    // guard the synthetic-payload regime: dims are capped below, but a
    // hostile header could still claim 65k×65k×3 (~12 GiB); refuse
    // anything whose output exceeds 1 GiB
    val quant = Array.ofDim[Int](4, 64) // zigzag order as stored
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var off = 2

    while (true) {
      if (off + 1 >= b.length) refuse("no SOS before EOF")
      if ((b(off) & 0xff) != 0xff) refuse("expected marker")
      var mOff = off + 1
      while (mOff < b.length && (b(mOff) & 0xff) == 0xff) mOff += 1 // fill bytes
      if (mOff >= b.length) refuse("truncated marker")
      val marker = b(mOff) & 0xff
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) { off = mOff + 1 }
      else if (marker == 0xd9) refuse("EOI before SOS")
      else {
        if (mOff + 2 >= b.length) refuse("truncated length")
        val len = u16(b, mOff + 1)
        if (len < 2 || mOff + 1 + len > b.length) refuse("hostile segment length")
        val seg = mOff + 3 // first payload byte
        val segEnd = mOff + 1 + len
        marker match {
          case 0xdb => // DQT — possibly several tables
            var p = seg
            while (p < segEnd) {
              val pq = (b(p) & 0xf0) >> 4
              val tq = b(p) & 0x0f
              if (tq > 3 || pq > 1) refuse("bad DQT")
              if (pq == 1 && segEnd - p < 129) refuse("truncated DQT")
              if (pq == 0 && segEnd - p < 65) refuse("truncated DQT")
              var i = 0
              while (i < 64) {
                quant(tq)(i) =
                  if (pq == 0) b(p + 1 + i) & 0xff
                  else u16(b, p + 1 + 2 * i)
                i += 1
              }
              p += (if (pq == 0) 65 else 129)
            }
          case 0xc4 => // DHT — possibly several tables
            var p = seg
            while (p < segEnd) {
              val tc = (b(p) & 0xf0) >> 4
              val th = b(p) & 0x0f
              if (tc > 1 || th > 3) refuse("bad DHT")
              if (segEnd - p < 17) refuse("truncated DHT")
              val bits = Array.tabulate(16)(i => b(p + 1 + i) & 0xff)
              val n = bits.sum
              if (n > 256 || segEnd - p < 17 + n) refuse("truncated DHT values")
              val vals = Array.tabulate(n)(i => b(p + 17 + i) & 0xff)
              val tab = new HuffTable(bits, vals)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              p += 17 + n
            }
          case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
            if (len < 8) refuse("short SOF")
            val precision = b(seg) & 0xff
            if (precision != 8) refuse("only 8-bit precision")
            height = u16(b, seg + 1)
            width = u16(b, seg + 3)
            val nc = b(seg + 5) & 0xff
            if (width == 0 || height == 0) refuse("zero dimension")
            if (nc != 1 && nc != 3) refuse("only gray or YCbCr")
            if (width.toLong * height * nc > (1L << 30)) refuse("output too large")
            if (len < 8 + 3 * nc) refuse("truncated SOF")
            comps = Array.tabulate(nc) { i =>
              val o = seg + 6 + 3 * i
              val hv = b(o + 1) & 0xff
              val c = Component(b(o) & 0xff, (hv >> 4) & 0xf, hv & 0xf, b(o + 2) & 0x0f)
              if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3)
                refuse("bad sampling factors")
              c
            }
          case m if m >= 0xc2 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
            refuse("progressive/arithmetic/hierarchical unsupported")
          case 0xdd => // DRI
            if (len < 4) refuse("short DRI")
            restartInterval = u16(b, seg)
          case 0xda => // SOS — baseline: single scan, then done
            if (comps == null) refuse("SOS before SOF")
            val ns = b(seg) & 0xff
            if (ns != comps.length) refuse("scan must cover all components")
            var i = 0
            while (i < ns) {
              val cid = b(seg + 1 + 2 * i) & 0xff
              val tabs = b(seg + 2 + 2 * i) & 0xff
              val c = comps.find(_.id == cid).getOrElse(refuse("unknown scan component"))
              c.dcTab = (tabs >> 4) & 0xf
              c.acTab = tabs & 0xf
              if (c.dcTab > 3 || c.acTab > 3) refuse("bad scan tables")
              i += 1
            }
            return decodeScan(b, segEnd, comps, width, height, quant,
              dcTabs, acTabs, restartInterval)
          case _ => () // APPn, COM, anything else with a length: skip
        }
        off = segEnd
      }
    }
    refuse("unreachable")
  }

  private def decodeScan(b: Array[Byte], scanStart: Int, comps: Array[Component],
                         width: Int, height: Int, quant: Array[Array[Int]],
                         dcTabs: Array[HuffTable], acTabs: Array[HuffTable],
                         restartInterval: Int): (Int, Int, Int, Array[Byte]) = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // one full-resolution-at-its-sampling plane per component
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = comps.indices.map(i =>
      new Array[Byte](planeW(i) * planeH(i))).toArray
    val dcPred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    val r = new BitReader(b, scanStart)
    var mcu = 0
    val nMcus = mcusX * mcusY
    var restartCount = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        r.resyncRestart(restartCount & 7)
        restartCount += 1
        java.util.Arrays.fill(dcPred, 0)
      }
      val mcuX = mcu % mcusX
      val mcuY = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = quant(c.tq)
        val dcT = dcTabs(c.dcTab)
        val acT = acTabs(c.acTab)
        if (dcT == null || acT == null) refuse("missing Huffman table")
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val t = decodeHuff(r, dcT)
            if (t > 11) refuse("bad DC category")
            dcPred(ci) += extend(r.receive(t), t)
            coef(0) = dcPred(ci) * q(0)
            // AC, run-length in zigzag order
            var k = 1
            while (k < 64) {
              val rs = decodeHuff(r, acT)
              val run = (rs >> 4) & 0xf
              val size = rs & 0xf
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += run
                if (k > 63) refuse("AC index out of range")
                coef(Zigzag(k)) = extend(r.receive(size), size) * q(k)
                k += 1
              }
            }
            idct(coef, block)
            // place into the component plane
            val px0 = (mcuX * c.h + bx) * 8
            val py0 = (mcuY * c.v + by) * 8
            val pw = planeW(ci)
            val plane = planes(ci)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              val rowOff = (py0 + yy) * pw + px0
              while (xx < 8) {
                plane(rowOff + xx) = block(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // upsample (nearest/replicate) + color convert
    val nc = comps.length
    val out = new Array[Byte](width * height * nc)
    if (nc == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * pw, out, y * width, width)
        y += 1
      }
    } else {
      val py = planes(0); val pb = planes(1); val pr = planes(2)
      val wy = planeW(0); val wb = planeW(1); val wr = planeW(2)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          // each component samples at (x * h / hMax, y * v / vMax)
          def s(plane: Array[Byte], pw: Int, c: Component): Int = {
            val sx = x * c.h / hMax
            val syy = y * c.v / vMax
            plane(syy * pw + sx) & 0xff
          }
          val yv = s(py, wy, comps(0)).toDouble
          val cb = s(pb, wb, comps(1)) - 128.0
          val cr = s(pr, wr, comps(2)) - 128.0
          val o = (y * width + x) * 3
          def clamp(d: Double): Byte = {
            val v = math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          out(o) = clamp(yv + 1.402 * cr)
          out(o + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yv + 1.772 * cb)
          x += 1
        }
        y += 1
      }
    }
    (width, height, nc, out)
  }
}
