package graft.multimodal

import org.apache.spark.sql.Dataset

/** Audio-column handling: real pure-JVM WAV (RIFF/WAVE) PCM codec —
  * chunk-walk header parse, 8/16-bit sample decode, writer — plus the
  * distributed feature-extraction and window-slicing operators a
  * training pipeline runs over an audio corpus (duration/energy
  * filtering, fixed-window segmentation for encoder batches).
  *
  * Same design as [[Multimodal]]: media travels as an opaque `binary`
  * column; decode runs partition-wise via typed `mapPartitions`; a
  * codec for compressed formats (mp3/flac via JNI or an ffmpeg pipe)
  * would slot in behind the same signatures. WAV itself is REAL here
  * end-to-end.
  */
object Audio {

  /** Typed metadata from a WAV payload. `durationMs` is derived:
    * nSamples / sampleRate. */
  case class AudioMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
                       nSamples: Long, durationMs: Long, format: String)

  case class AudioMetaRecord(media_id: Long, meta: AudioMeta)
  case class AudioFeatureRecord(media_id: Long, duration_ms: Long,
                                rms: Double, peak: Double)
  case class AudioWindowRecord(media_id: Long, window_idx: Int,
                               window: Array[Byte])

  /** Real RIFF/WAVE reader + writer: PCM (format tag 1) at 8 or
    * 16 bits, any channel count/sample rate; chunk walk honors the
    * RIFF even-byte padding rule and tolerates extra chunks (LIST,
    * fact, ...) before/after `fmt `/`data`. */
  object Wav {
    def isWav(b: Array[Byte]): Boolean =
      b.length >= 12 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    private def u16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

    /** Locate a chunk by 4CC: (dataOffset, dataLength). Chunks are
      * word-aligned — odd lengths are followed by a pad byte. The walk
      * offset is a Long: a hostile declared length near Int.MaxValue
      * would overflow an Int offset to negative and crash the task on
      * a negative array index — here it just walks past the buffer end
      * and refuses cleanly. */
    private def chunk(b: Array[Byte], id: String): Option[(Int, Int)] = {
      val want = id.getBytes("US-ASCII")
      var off = 12L
      while (off + 8 <= b.length) {
        val o = off.toInt
        val len = u32(b, o + 4) // 0 .. 0xffffffff
        val matches = (0 until 4).forall(i => b(o + i) == want(i))
        if (matches) {
          return if (off + 8 + len <= b.length) Some((o + 8, len.toInt))
          else None // truncated payload: refuse, don't misdecode
        }
        off += 8 + len + (len & 1)
      }
      None
    }

    def meta(b: Array[Byte]): Option[AudioMeta] =
      if (!isWav(b)) None
      else for {
        (fmtOff, fmtLen) <- chunk(b, "fmt ") if fmtLen >= 16
        if u16(b, fmtOff) == 1 // PCM only
        ch = u16(b, fmtOff + 2) if ch > 0
        rate = u32(b, fmtOff + 4).toInt if rate > 0
        bits = u16(b, fmtOff + 14) if bits == 8 || bits == 16
        (_, dataLen) <- chunk(b, "data")
        frames = dataLen.toLong / (ch * bits / 8)
      } yield AudioMeta(rate, ch, bits, frames,
        frames * 1000L / rate, "wav")

    /** Interleaved samples normalized to 16-bit signed (8-bit PCM is
      * unsigned per spec — recentered and scaled). Decode length is
      * truncated to whole frames (`meta.nSamples × channels`) so a
      * data chunk with a trailing partial frame can't make samples()
      * disagree with the metadata frame count (or leak a partial frame
      * into [[sliceWindows]] re-encoding). */
    def samples(b: Array[Byte]): Option[Array[Short]] = meta(b).flatMap { m =>
      chunk(b, "data").map { case (off, _) =>
        val n = (m.nSamples * m.channels).toInt
        if (m.bitsPerSample == 16) {
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            out(i) = ((b(off + 2 * i) & 0xff) | (b(off + 2 * i + 1) << 8)).toShort
            i += 1
          }
          out
        } else {
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            out(i) = (((b(off + i) & 0xff) - 128) << 8).toShort
            i += 1
          }
          out
        }
      }
    }

    /** Minimal PCM16 writer: canonical 44-byte header + data. */
    def encode(sampleRate: Int, channels: Int, pcm: Array[Short]): Array[Byte] = {
      val dataLen = pcm.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * channels * 2) // byte rate
        .putShort((channels * 2).toShort).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      pcm.foreach(bb.putShort)
      bb.array()
    }
  }

  /** Integer-factor decimation: keep every `factor`-th frame (all
    * channels of it), sample rate divides by the factor. Only exact
    * divisions are allowed (8 kHz / 2 → 4 kHz); a non-dividing factor
    * refuses rather than silently drifting the clip's time base.
    * (Proper band-limited resampling needs a DSP library; plain
    * decimation is the standard cheap pass for oversampled speech
    * corpora headed into a 16 kHz encoder.) */
  def downsample(b: Array[Byte], factor: Int): Option[Array[Byte]] =
    if (factor <= 0) None
    else for {
      m <- Wav.meta(b)
      if m.sampleRate % factor == 0
      s <- Wav.samples(b)
    } yield {
      val nFrames = s.length / m.channels
      val kept = (nFrames + factor - 1) / factor
      val out = new Array[Short](kept * m.channels)
      var f = 0
      while (f < kept) {
        var c = 0
        while (c < m.channels) {
          out(f * m.channels + c) = s(f * factor * m.channels + c)
          c += 1
        }
        f += 1
      }
      Wav.encode(m.sampleRate / factor, m.channels, out)
    }

  /** Trim leading/trailing silence at `windowMs` granularity: windows
    * whose RMS (on the [-1, 1) scale) is below `threshold` are cut
    * from both ends; interior silence stays (it is content — pauses).
    * Window framing matches [[sliceWindows]] exactly, so a trimmed
    * clip re-slices on the same boundaries. An all-silent clip yields
    * an empty (0-sample) WAV — [[trimSilenceAll]] drops those. */
  def trimSilence(b: Array[Byte], windowMs: Int,
                  threshold: Double): Option[Array[Byte]] =
    for {
      m <- Wav.meta(b)
      s <- Wav.samples(b)
    } yield {
      val fpw = math.max((m.sampleRate.toLong * windowMs / 1000L).toInt, 1)
      val spw = fpw * m.channels
      val nWin = (s.length + spw - 1) / spw
      def rms(w: Int): Double = {
        val start = w * spw
        val end = math.min(start + spw, s.length)
        var sum = 0.0
        var i = start
        while (i < end) { val v = s(i) / 32768.0; sum += v * v; i += 1 }
        if (end == start) 0.0 else math.sqrt(sum / (end - start))
      }
      val loud = (0 until nWin).filter(rms(_) >= threshold)
      if (loud.isEmpty) Wav.encode(m.sampleRate, m.channels, Array.empty)
      else Wav.encode(m.sampleRate, m.channels,
        java.util.Arrays.copyOfRange(s, loud.head * spw,
          math.min((loud.last + 1) * spw, s.length)))
    }

  /** Distributed decimation; non-dividing factors and undecodable
    * payloads drop. */
  def resampleAll(ds: Dataset[Multimodal.MediaRecord],
                  factor: Int): Dataset[Multimodal.MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r =>
      downsample(r.content, factor).map(Multimodal.MediaRecord(r.media_id, _))))
  }

  /** Distributed edge-silence trimming; clips that trim to nothing
    * (all-silence) drop — the curation filter this operator exists
    * for. */
  def trimSilenceAll(ds: Dataset[Multimodal.MediaRecord], windowMs: Int,
                     threshold: Double): Dataset[Multimodal.MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r =>
      trimSilence(r.content, windowMs, threshold)
        .filter(out => Wav.meta(out).exists(_.nSamples > 0))
        .map(Multimodal.MediaRecord(r.media_id, _))))
  }

  /** Decode typed audio metadata, partition-wise; undecodable
    * payloads drop (anti-join ids downstream for the failure set). */
  def decodeMeta(ds: Dataset[Multimodal.MediaRecord]): Dataset[AudioMetaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r =>
      Wav.meta(r.content).map(m => AudioMetaRecord(r.media_id, m))))
  }

  /** Per-clip scalar features — duration, RMS energy and peak on the
    * [-1, 1) normalized scale — the standard cheap signals for
    * filtering silence/clipping before an expensive encoder pass. */
  def extractFeatures(ds: Dataset[Multimodal.MediaRecord]): Dataset[AudioFeatureRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { r =>
      for {
        m <- Wav.meta(r.content)
        s <- Wav.samples(r.content)
      } yield {
        var sumSq = 0.0
        var peak = 0.0
        var i = 0
        while (i < s.length) {
          val v = s(i) / 32768.0
          sumSq += v * v
          val a = math.abs(v)
          if (a > peak) peak = a
          i += 1
        }
        val rms = if (s.isEmpty) 0.0 else math.sqrt(sumSq / s.length)
        AudioFeatureRecord(r.media_id, m.durationMs, rms, peak)
      }
    })
  }

  /** Fixed-duration window slicing (the audio analogue of
    * [[Multimodal.sampleFrames]]): each clip splits into
    * `windowMs`-long segments re-encoded as standalone WAV payloads,
    * keeping every `stride`-th window. flatMap shape — one output row
    * per kept window, still fully distributed. A trailing partial
    * window is kept (real segmenters pad or keep; we keep —
    * deterministic and lossless). */
  def sliceWindows(ds: Dataset[Multimodal.MediaRecord], windowMs: Int,
                   stride: Int = 1): Dataset[AudioWindowRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { r =>
      for {
        m <- Wav.meta(r.content).toSeq
        s <- Wav.samples(r.content).toSeq
        framesPerWindow = math.max((m.sampleRate.toLong * windowMs / 1000L).toInt, 1)
        samplesPerWindow = framesPerWindow * m.channels
        (win, idx) <- s.grouped(samplesPerWindow).zipWithIndex
        if idx % stride == 0
      } yield AudioWindowRecord(r.media_id, idx,
        Wav.encode(m.sampleRate, m.channels, win))
    })
  }
}
