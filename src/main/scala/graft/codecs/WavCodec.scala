package graft.codecs

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM PCM WAV codec — the audio leg of the multimodal corpus
  * (opaque `binary` column + typed metadata, decode + feature-extract as
  * distributed kernels; public RIFF/WAVE format, PCM 16-bit mono).
  * Features are INTEGER-exact (sum of squares, zero crossings) so the
  * audio queries hash-match a SQL oracle bit-for-bit. */
object WavCodec {

  /** Encode 16-bit mono PCM samples at `rate` Hz. */
  def encode(samples: Array[Short], rate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("ASCII"))
    buf.put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(rate)
      .putInt(rate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits
    buf.put("data".getBytes("ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode: returns (samples, rate). Walks RIFF chunks (fmt before data),
    * accepts PCM 16-bit mono only. */
  def decode(bytes: Array[Byte]): (Array[Short], Int) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length > 44 &&
      new String(bytes, 0, 4, "ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "ASCII") == "WAVE", "not a WAV")
    var o = 12
    var rate = -1
    var samples: Array[Short] = null
    while (o + 8 <= bytes.length && (rate < 0 || samples == null)) {
      val id = new String(bytes, o, 4, "ASCII")
      val len = buf.getInt(o + 4)
      // a corrupt/hostile length field must not stall the walk (len < 0
      // stops o advancing) or overrun the buffer (len > remaining)
      require(len >= 0 && o + 8 + len <= bytes.length,
        s"WAV chunk '$id' at $o claims $len bytes of ${bytes.length - o - 8} remaining")
      id match {
        case "fmt " =>
          require(buf.getShort(o + 8) == 1, "PCM only")
          require(buf.getShort(o + 10) == 1, "mono only")
          require(buf.getShort(o + 22) == 16, "16-bit only")
          rate = buf.getInt(o + 12)
        case "data" =>
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) {
            samples(i) = buf.getShort(o + 8 + i * 2)
            i += 1
          }
        case _ =>
      }
      o += 8 + len + (len & 1)
    }
    require(rate > 0 && samples != null, "missing fmt/data chunk")
    (samples, rate)
  }

  /** Windowed integer features: per window of `win` samples (tail window
    * may be short), (n, sumSq, zeroCrossings) — energy and ZCR are the
    * classic audio-quality/VAD features; integer-exact for SQL oracles. */
  def windowFeatures(samples: Array[Short], win: Int)
      : Array[(Int, Long, Long, Long)] = {
    val out = Array.newBuilder[(Int, Long, Long, Long)]
    var w = 0
    var i = 0
    while (i < samples.length) {
      val end = math.min(i + win, samples.length)
      var sumSq = 0L
      var zc = 0L
      var j = i
      while (j < end) {
        val s = samples(j).toLong
        sumSq += s * s
        if (j > i && (samples(j) < 0) != (samples(j - 1) < 0)) zc += 1
        j += 1
      }
      out += ((w, (end - i).toLong, sumSq, zc))
      w += 1
      i = end
    }
    out.result()
  }

  /** Silence trimming (the VAD gate): windows whose energy (sum of
    * squared samples) falls below `energyThreshold` are silent; the clip
    * keeps everything between the first and last loud window. Returns
    * (nWindows, leadingSilent, trailingSilent, keptSamples) — keptSamples
    * counts the samples of the kept window span (0 when every window is
    * silent). Integer-exact, so thresholds carry no float risk. */
  def trimSilence(samples: Array[Short], win: Int,
      energyThreshold: Long): (Long, Long, Long, Long) = {
    val feats = windowFeatures(samples, win)
    val silent = feats.map(_._3 < energyThreshold)
    val lead = silent.takeWhile(identity).length
    val trail =
      if (lead == silent.length) 0 // all-silent: the lead run took it all
      else silent.reverse.takeWhile(identity).length
    val kept = feats.slice(lead, feats.length - trail).map(_._2).sum
    (feats.length.toLong, lead.toLong, trail.toLong, kept)
  }

  /** Voice-activity SEGMENTATION (the utterance splitter): where
    * [[trimSilence]] keeps one span, this returns EVERY maximal run of
    * consecutive loud windows (energy >= threshold) as its own segment —
    * the pass an ASR corpus pipeline runs to split long recordings into
    * utterances before transcription. Returns one row per segment:
    * (segIdx, startWin, nWin, energySum), integer-exact so the
    * gaps-and-islands SQL form reproduces it bit-for-bit. Per-clip
    * kernel, zero shuffle. */
  def vadSegments(samples: Array[Short], win: Int,
      energyThreshold: Long): Seq[(Long, Long, Long, Long)] = {
    val out = Seq.newBuilder[(Long, Long, Long, Long)]
    var seg = -1L; var start = -1L; var nw = 0L; var es = 0L
    windowFeatures(samples, win).foreach { case (w, _, ss, _) =>
      if (ss >= energyThreshold) {
        if (start < 0) { seg += 1; start = w.toLong; nw = 0L; es = 0L }
        nw += 1; es += ss
      } else if (start >= 0) {
        out += ((seg, start, nw, es)); start = -1L
      }
    }
    if (start >= 0) out += ((seg, start, nw, es))
    out.result()
  }

  /** Decimate-by-2 resampling with a 2-tap box pre-filter: each output
    * sample is the floor-mean of an input pair ((a+b) >> 1 — arithmetic
    * shift = floor, integer-exact for the full Short range). A trailing
    * odd sample is dropped (floor(n/2) outputs). The 2-tap box is the
    * standard cheap anti-alias decimator; a production pipeline would
    * swap in a longer FIR — this fixes the CONTRACT (pairing, floor
    * rounding, odd-tail drop) that any kernel upgrade must keep.
    * Per-clip kernel, no shuffle. */
  def downsample2(samples: Array[Short]): Array[Short] = {
    val n = samples.length / 2
    val out = new Array[Short](n)
    var j = 0
    while (j < n) {
      out(j) = ((samples(2 * j) + samples(2 * j + 1)) >> 1).toShort
      j += 1
    }
    out
  }

  /** RATIONAL-rate resampling by 2:3 (e.g. 48 kHz -> 32 kHz): output
    * sample k sits at source position 3k/2 — even k reads source(3k/2)
    * directly, odd k is the floor-mean of the straddling pair
    * ((a + b) >> 1, the same exact dyadic interpolation contract as
    * [[downsample2]]). Generalizes the by-2 decimator to the rational
    * ratios real corpora need (44.1/48 -> 16 family). Output count =
    * the first k whose source taps run past the end — even k needs
    * sample 3k/2, odd k needs the PAIR ((3k-1)/2, (3k+1)/2), so there
    * is no single closed form across parities (n = 1000 -> 667 but
    * n = 2 -> 1: k = 1's pair needs a 3rd sample). Per-clip kernel, no
    * shuffle, integer-exact. */
  def resample2of3(samples: Array[Short]): Array[Short] = {
    val n = samples.length
    // k valid iff its last source tap index <= n-1:
    //   even k: tap 3k/2        -> k <= (2n-2)/3
    //   odd k:  taps (3k+-1)/2  -> (3k+1)/2 <= n-1
    val out = Array.newBuilder[Short]
    var k = 0
    var ok = true
    while (ok) {
      if (k % 2 == 0) {
        val i = 3 * k / 2
        if (i < n) out += samples(i) else ok = false
      } else {
        val i = (3 * k - 1) / 2
        if (i + 1 < n)
          out += ((samples(i) + samples(i + 1)) >> 1).toShort
        else ok = false
      }
      k += 1
    }
    out.result()
  }

  /** Peak-normalization gain as an exact power-of-two shift: the loudness
    * normalization every audio corpus pass runs before training. Returns
    * (peak, shift) where peak = max |sample| and shift is the LARGEST
    * s >= 0 with peak << s <= target (so one more doubling would clip).
    * Power-of-two gain keeps the op integer-exact end to end — a float
    * gain factor would make the gate engine-specific; production swaps
    * in fractional gain on the same measured peak. All-zero input gets
    * shift 0 (nothing to amplify; any shift would be vacuous). */
  def gainShift(samples: Array[Short], target: Int = 32767): (Long, Int) = {
    require(target > 0, s"gainShift: target must be positive, got $target")
    var peak = 0L
    var i = 0
    while (i < samples.length) {
      val a = math.abs(samples(i).toLong)
      if (a > peak) peak = a
      i += 1
    }
    if (peak == 0L) (0L, 0)
    else {
      var shift = 0
      while ((peak << (shift + 1)) <= target) shift += 1
      // peak itself may already exceed target (hot clip): shift stays 0
      (peak, shift)
    }
  }
}
