package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable.ArrayBuffer

/** Minimal MJPEG-in-AVI (RIFF) container support — the real video
  * ingest path that pairs with the real JPEG pixel decoder the way
  * q60 paired real still-image codecs with the PNG/PPM writers: the
  * writer emits the canonical skeleton (`hdrl` with avih/strh/strf,
  * `movi` with one `00dc` chunk per JPEG frame, an `idx1` keyframe
  * index), and the walker is a plain RIFF chunk scan that descends
  * into LIST chunks and collects video-stream payloads, skipping
  * unknown chunks by declared size — tolerant of JUNK padding and
  * vendor lists the way real files require. Format per Microsoft's
  * public RIFF/AVI documentation; all sizes little-endian, chunks
  * word-aligned. */
object Avi {

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def le(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = body.length & 1
    val bb = le(8 + body.length + pad)
    bb.put(fourcc(id)).putInt(body.length).put(body)
    bb.array() // trailing pad byte (if any) stays zero
  }

  private def list(typ: String, body: Array[Byte]): Array[Byte] = {
    val bb = le(12 + body.length)
    bb.put(fourcc("LIST")).putInt(4 + body.length).put(fourcc(typ)).put(body)
    bb.array()
  }

  /** Mux pre-encoded JPEG frames into an MJPEG AVI. */
  def encodeMjpeg(w: Int, h: Int, fps: Int,
                  frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0 && fps > 0, "dimensions and fps must be positive")
    require(frames.nonEmpty, "an AVI needs at least one frame")
    val avih = le(56)
      .putInt(1000000 / fps) // dwMicroSecPerFrame
      .putInt(0).putInt(0)
      .putInt(0x10) // AVIF_HASINDEX
      .putInt(frames.length).putInt(0)
      .putInt(1) // one stream
      .putInt(0).putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    val strh = le(56)
      .put(fourcc("vids")).put(fourcc("MJPG"))
      .putInt(0).putInt(0).putInt(0)
      .putInt(1) // dwScale
      .putInt(fps) // dwRate
      .putInt(0).putInt(frames.length)
      .putInt(0).putInt(-1).putInt(0)
      .putShort(0.toShort).putShort(0.toShort)
      .putShort(w.toShort).putShort(h.toShort)
    val strf = le(40) // BITMAPINFOHEADER
      .putInt(40).putInt(w).putInt(h)
      .putShort(1.toShort).putShort(24.toShort)
      .put(fourcc("MJPG")).putInt(w * h * 3)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    val hdrl = list("hdrl", chunk("avih", avih.array()) ++
      list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
    val moviBody = frames.map(f => chunk("00dc", f))
      .foldLeft(Array.emptyByteArray)(_ ++ _)
    val movi = list("movi", moviBody)
    val idx = new ByteArrayOutputStream()
    var off = 4 // offset of the first chunk id from the 'movi' fourcc
    frames.foreach { f =>
      idx.write(le(16).put(fourcc("00dc")).putInt(0x10) // AVIIF_KEYFRAME
        .putInt(off).putInt(f.length).array())
      off += 8 + f.length + (f.length & 1)
    }
    val body = fourcc("AVI ") ++ hdrl ++ movi ++ chunk("idx1", idx.toByteArray)
    val bb = le(8 + body.length)
    bb.put(fourcc("RIFF")).putInt(body.length).put(body)
    bb.array()
  }

  private def id4(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  /** All complete video frame payloads (`##dc`/`##db` chunks) in
    * stream order. Nil for anything that is not a RIFF AVI; a
    * truncated tail stops the walk without emitting a partial
    * frame. */
  def frames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes.length < 12 || id4(bytes, 0) != "RIFF" ||
        id4(bytes, 8) != "AVI ") return Nil
    val out = ArrayBuffer.empty[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var p = start
      var ok = true
      while (ok && p + 8 <= end) {
        val id = id4(bytes, p)
        val sz = ByteBuffer.wrap(bytes, p + 4, 4)
          .order(ByteOrder.LITTLE_ENDIAN).getInt
        val bodyStart = p + 8
        if (sz < 0 || bodyStart + sz > end) ok = false // truncated/corrupt
        else {
          if (id == "LIST" && sz >= 4) walk(bodyStart + 4, bodyStart + sz)
          else if (id.charAt(0).isDigit && id.charAt(1).isDigit &&
                   id.charAt(2) == 'd' &&
                   (id.charAt(3) == 'c' || id.charAt(3) == 'b'))
            out += java.util.Arrays.copyOfRange(bytes, bodyStart, bodyStart + sz)
          p = bodyStart + sz + (sz & 1)
        }
      }
    }
    walk(12, bytes.length)
    out.toSeq
  }
}
