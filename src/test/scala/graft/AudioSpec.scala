package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Audio
import graft.multimodal.Audio._
import graft.multimodal.Multimodal.MediaRecord

class AudioSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("WAV encode/decode round-trips PCM16 exactly") {
    val pcm = Array.tabulate(800)(i => (math.sin(i * 0.1) * 12000).toShort)
    val wav = Wav.encode(8000, 1, pcm)
    val m = Wav.meta(wav).get
    assert(m == AudioMeta(8000, 1, 16, 800, 100, "wav"))
    assert(Wav.samples(wav).get.sameElements(pcm))
  }

  test("chunk walk tolerates extra chunks and honors odd-length padding") {
    val pcm = Array.tabulate(100)(i => (i * 100).toShort)
    val base = Wav.encode(4000, 2, pcm)
    // splice an odd-length LIST chunk (5 bytes + 1 pad) between
    // "WAVE" and "fmt " — a common provenance/metadata chunk spot
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = base.take(12) ++ extra ++ base.drop(12)
    // fix the RIFF size field (not validated by our reader, but honest)
    val m = Wav.meta(spliced).get
    assert(m.sampleRate == 4000 && m.channels == 2 && m.nSamples == 50)
    assert(Wav.samples(spliced).get.sameElements(pcm))
  }

  test("8-bit PCM decodes unsigned-recentered; truncated/non-PCM refuse") {
    // hand-built 8-bit mono file: samples 128 (silence) and 255/0 (rails)
    val data = Array[Byte](128.toByte, 255.toByte, 0, 128.toByte)
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
    bb.put("data".getBytes).putInt(data.length).put(data)
    val wav = bb.array()
    val s = Wav.samples(wav).get
    assert(s(0) == 0 && s(3) == 0)
    assert(s(1) == ((255 - 128) << 8).toShort && s(2) == ((0 - 128) << 8).toShort)
    // truncated data payload: refuse rather than misdecode
    assert(Wav.meta(wav.dropRight(2)).isEmpty)
    // IEEE-float format tag (3) is not PCM: refuse
    val nonPcm = wav.clone(); nonPcm(20) = 3
    assert(Wav.meta(nonPcm).isEmpty)
  }

  test("hostile chunk lengths refuse cleanly; partial trailing frame truncates") {
    val pcm = Array.tabulate(10)(_.toShort)
    val base = Wav.encode(8000, 1, pcm)
    // splice a JUNK chunk declaring a near-Int.MaxValue length: the
    // walk must refuse (None), not overflow to a negative array index
    for (lenBytes <- Seq(
        Array[Byte](0xfc.toByte, 0xff.toByte, 0xff.toByte, 0x7f), // 0x7ffffffc
        Array.fill[Byte](4)(0xff.toByte))) {                      // 0xffffffff
      val spliced = base.take(12) ++ "JUNK".getBytes("US-ASCII") ++
        lenBytes ++ base.drop(12)
      assert(Wav.meta(spliced).isEmpty)
      assert(Wav.samples(spliced).isEmpty)
    }
    // stereo data chunk with a trailing PARTIAL frame (7 samples = 3
    // full frames + 1 stray): meta counts whole frames and samples()
    // truncates to agree — no partial frame leaks into re-encoding
    val ragged = Wav.encode(4000, 2, Array.tabulate(7)(_.toShort))
    val m = Wav.meta(ragged).get
    assert(m.nSamples == 3)
    assert(Wav.samples(ragged).get.length == 6)
  }

  test("audio features: rms and peak on known signals, distributed") {
    val half = Array.fill(1000)(16384.toShort) // constant +0.5
    val silent = Array.fill(500)(0.toShort)
    val ds = Seq(
      MediaRecord(0L, Wav.encode(8000, 1, half)),
      MediaRecord(1L, Wav.encode(8000, 1, silent)),
      MediaRecord(2L, Array[Byte](9, 9, 9))). // undecodable drops
      toDS()
    val out = Audio.extractFeatures(ds).collect().map(r => r.media_id -> r).toMap
    assert(out.keySet == Set(0L, 1L))
    assert(math.abs(out(0L).rms - 0.5) < 1e-9)
    assert(math.abs(out(0L).peak - 0.5) < 1e-9)
    assert(out(0L).duration_ms == 125) // 1000 frames @ 8 kHz
    assert(out(1L).rms == 0.0 && out(1L).peak == 0.0)
  }

  test("downsample decimates frames; non-dividing factors refuse") {
    val pcm = Array.tabulate(1600)(i => (i * 17).toShort)
    val wav = Wav.encode(8000, 1, pcm)
    val down = Audio.downsample(wav, 2).get
    val m = Wav.meta(down).get
    assert(m.sampleRate == 4000 && m.nSamples == 800)
    assert(m.durationMs == Wav.meta(wav).get.durationMs) // time base kept
    assert(Wav.samples(down).get.sameElements(
      pcm.indices.collect { case i if i % 2 == 0 => pcm(i) }))
    // stereo: whole frames survive (both channels of every kept frame)
    val st = Wav.encode(8000, 2, Array.tabulate(1600)(_.toShort))
    val std = Audio.downsample(st, 4).get
    assert(Wav.meta(std).get.channels == 2)
    assert(Wav.samples(std).get.take(4).toSeq == Seq(0, 1, 8, 9))
    // 8000 / 3 is not integral: refuse rather than drift the clock
    assert(Audio.downsample(wav, 3).isEmpty)
  }

  test("trimSilence cuts edge windows, keeps interior pauses, aligns with slicing") {
    val rate = 8000
    val win = 1000 // samples per 125 ms window @ 8 kHz mono
    val tone = Array.tabulate(win)(i => (math.sin(i * 0.3) * 16000).toShort)
    val quiet = Array.fill(win)(0.toShort)
    // [silence, silence, tone, silence(interior), tone, silence]
    val pcm = quiet ++ quiet ++ tone ++ quiet ++ tone ++ quiet
    val wav = Wav.encode(rate, 1, pcm)
    val trimmed = Audio.trimSilence(wav, windowMs = 125, threshold = 0.05).get
    // edges trimmed, the interior pause preserved
    assert(Wav.samples(trimmed).get.sameElements(tone ++ quiet ++ tone))
    // window framing matches sliceWindows: re-slicing the trimmed clip
    // yields exactly the kept windows of the original slicing
    import spark.implicits._
    val ds = Seq(MediaRecord(1L, trimmed)).toDS()
    val wins = Audio.sliceWindows(ds, windowMs = 125).collect()
    assert(wins.length == 3)
    assert(wins.forall(w => Wav.samples(w.window).get.length == win))
    // an all-silent clip drops from the distributed operator
    val allQuiet = Seq(MediaRecord(2L, Wav.encode(rate, 1, quiet))).toDS()
    assert(Audio.trimSilenceAll(allQuiet, 125, 0.05).isEmpty)
    // and the distributed resample path round-trips
    val re = Audio.resampleAll(Seq(MediaRecord(3L, wav)).toDS(), 2).collect()
    assert(re.length == 1 && Wav.meta(re.head.content).get.sampleRate == 4000)
  }

  test("window slicing: fixed-duration segments, stride, trailing partial kept") {
    // 1.1 s @ 8 kHz mono → 250 ms windows: 4 full + 1 partial
    val pcm = Array.tabulate(8800)(i => i.toShort)
    val ds = Seq(MediaRecord(7L, Wav.encode(8000, 1, pcm))).toDS()
    val wins = Audio.sliceWindows(ds, windowMs = 250).collect().sortBy(_.window_idx)
    assert(wins.map(_.window_idx).toSeq == Seq(0, 1, 2, 3, 4))
    val decoded = wins.map(w => Wav.samples(w.window).get)
    assert(decoded.take(4).forall(_.length == 2000))
    assert(decoded.last.length == 800) // trailing partial
    // windows re-concatenate to the original signal exactly
    assert(decoded.flatten.sameElements(pcm))
    // stride keeps every 2nd window
    val strided = Audio.sliceWindows(ds, windowMs = 250, stride = 2).collect()
    assert(strided.map(_.window_idx).sorted.toSeq == Seq(0, 2, 4))
    // stereo: windows respect frame (not sample) boundaries
    val st = Seq(MediaRecord(8L, Wav.encode(4000, 2, Array.tabulate(4000)(_.toShort)))).toDS()
    val sw = Audio.sliceWindows(st, windowMs = 250).collect()
    assert(sw.forall(w => Wav.meta(w.window).get.channels == 2))
    assert(sw.map(w => Wav.samples(w.window).get.length).sum == 4000)
  }

  test("audio window signatures: exact levels for constant segments, " +
    "tail window fingerprints, non-WAV contributes nothing") {
    import graft.multimodal.AudioDedup
    // 400-frame constant segments at amp 3*4096 and 5*4096, plus a
    // 100-frame truncated outro at 2*4096
    val pcm = Array.fill(400)((3 * 4096).toShort) ++
      Array.fill(400)((5 * 4096).toShort) ++
      Array.fill(100)((2 * 4096).toShort)
    val ds = Seq(
      MediaRecord(1L, Wav.encode(8000, 1, pcm)),
      MediaRecord(2L, Array[Byte](1, 2, 3, 4))).toDS() // not a WAV
    val sig = AudioDedup.windowSignatures(ds)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // constant amp m*4096 -> rms = peak = m/8 -> hash = 8m*64 + 8m
    assert(sig((1L, 0L)) == 520L * 3)
    assert(sig((1L, 1L)) == 520L * 5)
    assert(sig((1L, 2L)) == 520L * 2) // the partial tail still hashes
    assert(sig.size == 3) // the non-WAV payload emitted no rows
  }
}
