package graft.functions

/** Pure-JVM WAV (RIFF) decoder + audio feature kernels — the AUDIO leg
  * of the multimodal column plumbing ([[ImageCodec]] is the image leg).
  * Written against the public RIFF/WAVE format: `RIFF <size> WAVE`
  * followed by chunks; `fmt ` carries (audioFormat, channels,
  * sampleRate, bitsPerSample), `data` carries the PCM payload. Supports
  * PCM (format 1) 8-bit unsigned and 16-bit signed little-endian, any
  * channel count (channels mix down to mono by averaging — features are
  * content descriptors, not a playback path).
  *
  * Everything is integer/float arithmetic in a fixed order, so the same
  * bytes produce the same features on every executor, every retry, every
  * platform — the determinism contract all engine hashes follow. Malformed
  * or truncated payloads return None/null, never throw: a feature
  * extractor that kills the task on one bad file does not survive a
  * billion-file corpus. */
object WavCodec {

  /** Decoded mono audio: normalized samples in [-1, 1]. */
  final case class Wav(sampleRate: Int, channels: Int,
      samples: Array[Float])

  private def u16(b: Array[Byte], o: Int): Int = LittleEndian.u16(b, o)
  private def u32(b: Array[Byte], o: Int): Long = LittleEndian.u32(b, o)

  /** RIFF/WAVE → mono float samples; None on anything malformed. */
  def decode(bytes: Array[Byte]): Option[Wav] = {
    try {
      if (bytes == null || bytes.length < 44) return None
      if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
          bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
          bytes(10) == 'V' && bytes(11) == 'E')) return None
      var off = 12
      var fmtOk = false
      var channels = 0; var rate = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      while (off + 8 <= bytes.length && (!fmtOk || dataOff < 0)) {
        val id = new String(bytes, off, 4, "US-ASCII")
        val len = u32(bytes, off + 4)
        if (len < 0 || len > Int.MaxValue - 8) return None
        val body = off + 8
        id match {
          case "fmt " if len >= 16 && body + 16 <= bytes.length =>
            val audioFormat = u16(bytes, body)
            channels = u16(bytes, body + 2)
            rate = u32(bytes, body + 4).toInt
            bits = u16(bytes, body + 14)
            fmtOk = audioFormat == 1 && channels >= 1 && channels <= 8 &&
              rate > 0 && (bits == 8 || bits == 16)
            if (!fmtOk) return None
          case "data" =>
            dataOff = body
            dataLen = math.min(len, (bytes.length - body).toLong).toInt
          case _ => ()
        }
        // chunks are word-aligned: odd sizes carry a pad byte
        off = body + len.toInt + (len.toInt & 1)
      }
      if (!fmtOk || dataOff < 0 || dataLen <= 0) return None
      val bytesPerSample = bits / 8
      val frameBytes = bytesPerSample * channels
      val nFrames = dataLen / frameBytes
      if (nFrames <= 0) return None
      // cap header-declared allocations (same discipline as ImageCodec):
      // 64M mono samples ≈ 25 min @ 44.1 kHz
      if (nFrames > (1 << 26)) return None
      val out = new Array[Float](nFrames)
      var i = 0
      while (i < nFrames) {
        var acc = 0.0f
        var c = 0
        while (c < channels) {
          val o = dataOff + (i * channels + c) * bytesPerSample
          val s =
            if (bits == 8) ((bytes(o) & 0xff) - 128) / 128.0f
            else {
              val v = u16(bytes, o)
              val signed = if (v >= 0x8000) v - 0x10000 else v
              signed / 32768.0f
            }
          acc += s
          c += 1
        }
        out(i) = acc / channels
        i += 1
      }
      Some(Wav(rate, channels, out))
    } catch { case _: Exception => None }
  }

  /** Scalar content features, milli-quantized for stable cross-engine
    * display: (duration_ms, rms_milli, peak_milli, zcr_milli — zero
    * crossings per sample ×1000, silence_milli — fraction of samples
    * with |x| < 0.01, ×1000). */
  final case class Features(durationMs: Long, sampleRate: Int,
      channels: Int, rmsMilli: Long, peakMilli: Long, zcrMilli: Long,
      silenceMilli: Long)

  def features(w: Wav): Features = {
    val n = w.samples.length
    var sumSq = 0.0; var peak = 0.0f; var zc = 0L; var silent = 0L
    var i = 0
    while (i < n) {
      val x = w.samples(i)
      sumSq += x.toDouble * x.toDouble
      val ax = math.abs(x)
      if (ax > peak) peak = ax
      if (ax < 0.01f) silent += 1
      if (i > 0 && (w.samples(i - 1) >= 0) != (x >= 0)) zc += 1
      i += 1
    }
    Features(
      durationMs = n.toLong * 1000L / w.sampleRate,
      sampleRate = w.sampleRate,
      channels = w.channels,
      rmsMilli = math.round(math.sqrt(sumSq / n) * 1000),
      peakMilli = math.round(peak.toDouble * 1000),
      zcrMilli = if (n > 1) math.round(zc.toDouble / (n - 1) * 1000) else 0L,
      silenceMilli = math.round(silent.toDouble / n * 1000))
  }

  /** 64-bit energy-contour fingerprint (the dHash idea on the time axis):
    * split the signal into 65 equal frames, bit i = energy(frame i+1) >
    * energy(frame i), MSB-first. Amplitude-INVARIANT (uniform gain scales
    * every frame energy equally, comparisons unchanged) and robust to
    * mild noise; near-dup audio then reuses the 4×16-bit band LSH +
    * Hamming verify the image axis uses. Returns None for signals too
    * short to frame (< 65 samples). */
  def fingerprint64(w: Wav): Option[Long] = {
    val frames = 65
    val n = w.samples.length
    if (n < frames) return None
    val energy = new Array[Double](frames)
    var f = 0
    while (f < frames) {
      val from = (n.toLong * f / frames).toInt
      val until = (n.toLong * (f + 1) / frames).toInt
      var s = 0.0
      var i = from
      while (i < until) { val x = w.samples(i); s += x.toDouble * x.toDouble; i += 1 }
      energy(f) = s / math.max(1, until - from)
      f += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      bits = (bits << 1) | (if (energy(i + 1) > energy(i)) 1L else 0L)
      i += 1
    }
    Some(bits)
  }

  /** Static entry point for the codegen expression
    * ([[AudioFingerprintExpr]]): boxed Long or null, no Option crossing
    * the generated-code boundary. */
  def fingerprint64OrNull(bytes: Array[Byte]): java.lang.Long =
    decode(bytes).flatMap(fingerprint64) match {
      case Some(v) => java.lang.Long.valueOf(v)
      case None => null
    }

  /** Minimal PCM16 mono WAV writer — the test-fixture twin of decode
    * (spec round-trips rely on it; also the re-encode path of a
    * normalize step). */
  def encodePcm16(sampleRate: Int, samples: Array[Float]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def w16(v: Int): Unit = LittleEndian.w16(out, v)
    def w32(v: Long): Unit = LittleEndian.w32(out, v)
    out.write("RIFF".getBytes("US-ASCII")); w32(36L + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16L)
    w16(1); w16(1); w32(sampleRate.toLong); w32(sampleRate.toLong * 2)
    w16(2); w16(16)
    out.write("data".getBytes("US-ASCII")); w32(dataLen.toLong)
    samples.foreach { x =>
      val clamped = math.max(-1.0f, math.min(1.0f, x))
      w16(math.round(clamped * 32767.0f))
    }
    out.toByteArray
  }
}
