package graft.codecs

import org.apache.spark.sql.{DataFrame, Dataset}

/** Video-modality plumbing for the training-data pipeline: clips are
  * opaque BINARY columns (here real GIF89a containers — the one video
  * container a bare JVM can both write and decode; MP4/H.264 would slot
  * into the same kernel but no codec ships in this sandbox, same
  * constraint that keeps the reference's `make_mp4` shelling to ffmpeg).
  *
  * The Spark-side shape is the part that matters at 100 TB: one typed
  * `flatMap` per clip (no shuffle, no driver involvement), a per-TASK
  * reader instance (ImageIO readers are stateful and not thread-safe),
  * frame decode ON the executor, and only tiny per-frame feature rows
  * leave the task — the decoded pixel planes never enter a shuffle. */
object VideoOps {

  /** Per-sampled-frame features: every `every`-th frame of each clip is
    * decoded and reduced to integer stats (8-bit gray intensities):
    * (clip_id, frame_idx, w, h, sum_intensity, nonblack) — integer-exact,
    * so any two engines that decode the same frames agree bit-for-bit. */
  def frameStats(clips: Dataset[(Long, Array[Byte])], every: Int): DataFrame = {
    require(every > 0, s"frameStats: `every` must be positive, got $every")
    val spark = clips.sparkSession
    import spark.implicits._
    clips.flatMap { case (clipId, bytes) =>
      val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      try {
        rd.setInput(javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
        val n = rd.getNumImages(true)
        (0 until n by every).iterator.map { f =>
          val img = rd.read(f)
          val w = img.getWidth; val h = img.getHeight
          var sum = 0L; var nonblack = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = img.getRGB(x, y) & 0xFF
              sum += g
              if (g != 0) nonblack += 1
              x += 1
            }
            y += 1
          }
          (clipId, f, w, h, sum, nonblack)
        }.toArray.iterator
      } finally rd.dispose()
    }.toDF("clip_id", "frame_idx", "w", "h", "sum_intensity", "nonblack")
  }

  /** Frame-rate RESAMPLING (fps conversion): select, for each target
    * timestamp k/dstFps, the NEAREST source frame (half-up rounding) —
    * the temporal normalization a video corpus pass runs so every clip
    * trains at one fps (the a3 decimator's video sibling; upsampling
    * duplicates nearest frames by the same rule). Pure integer selection:
    * src(k) = min(n-1, (2*k*srcFps + dstFps) / (2*dstFps)) for
    * k < ceil(n*dstFps/srcFps); each selected frame decodes to integer
    * gray features. Same per-clip no-shuffle kernel shape as
    * [[frameStats]]. */
  /** The pure (out_idx -> src_frame) selection of [[fpsResample]],
    * factored out so the clamp and upsampling-duplication branches are
    * unit-testable without a decoder: nOut = ceil(n*dstFps/srcFps)
    * outputs, src(k) = min(n-1, round_half_up(k*srcFps/dstFps)). */
  def fpsSelect(n: Int, srcFps: Int, dstFps: Int): Seq[(Int, Int)] = {
    require(srcFps > 0 && dstFps > 0,
      s"fpsSelect: fps must be positive, got src=$srcFps dst=$dstFps")
    require(n >= 0, s"fpsSelect: negative frame count $n")
    val nOut = ((n.toLong * dstFps + srcFps - 1) / srcFps).toInt
    (0 until nOut).map { k =>
      (k, math.min(n - 1L, (2L * k * srcFps + dstFps) / (2L * dstFps)).toInt)
    }
  }

  def fpsResample(clips: Dataset[(Long, Array[Byte])], srcFps: Int,
      dstFps: Int): DataFrame = {
    require(srcFps > 0 && dstFps > 0,
      s"fpsResample: fps must be positive, got src=$srcFps dst=$dstFps")
    val spark = clips.sparkSession
    import spark.implicits._
    clips.flatMap { case (clipId, bytes) =>
      val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      try {
        rd.setInput(javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
        val n = rd.getNumImages(true)
        fpsSelect(n, srcFps, dstFps).iterator.map { case (k, src) =>
          val img = rd.read(src)
          val w = img.getWidth; val h = img.getHeight
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += img.getRGB(x, y) & 0xFF; x += 1 }
            y += 1
          }
          (clipId, k.toLong, src.toLong, sum)
        }.toArray.iterator
      } finally rd.dispose()
    }.toDF("clip_id", "out_idx", "src_frame", "sum_intensity")
  }

  /** Scene-change detection: decode every frame, compute the SAD (sum of
    * absolute 8-bit gray differences) between each consecutive pair, and
    * flag a cut where SAD exceeds `threshold`. Integer-exact like
    * [[frameStats]] — the shot-segmentation primitive of a video
    * curation pipeline; same per-clip no-shuffle kernel shape. Emits one
    * row per frame transition: (clip_id, frame_idx, sad, is_cut) with
    * frame_idx the LATER frame of the pair.
    *
    * Contract: every frame must be stored FULL-SIZE (as [[graft.sources.GifWriter]]
    * writes them). GIFs whose later frames are delta sub-rectangles
    * (common encoder output, with disposal-method compositing) would
    * need frame compositing before differencing — such a clip fails
    * LOUDLY here (size-mismatch error), it is never silently mis-scored. */
  def sceneCuts(clips: Dataset[(Long, Array[Byte])],
      threshold: Long): DataFrame = {
    require(threshold >= 0, s"sceneCuts: threshold must be >= 0, got $threshold")
    val spark = clips.sparkSession
    import spark.implicits._
    clips.flatMap { case (clipId, bytes) =>
      val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      try {
        rd.setInput(javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
        val n = rd.getNumImages(true)
        var prev: Array[Int] = null
        (0 until n).iterator.flatMap { f =>
          val img = rd.read(f)
          val w = img.getWidth; val h = img.getHeight
          val cur = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { cur(y * w + x) = img.getRGB(x, y) & 0xFF; x += 1 }
            y += 1
          }
          val row = if (prev != null) {
            require(prev.length == cur.length,
              s"sceneCuts: clip $clipId frame $f is ${w}x$h but the previous " +
                "frame differs — delta-encoded (sub-rectangle) GIF frames need " +
                "compositing before SAD; this reader requires full-size frames")
            var sad = 0L
            var i = 0
            while (i < cur.length) { sad += math.abs(cur(i) - prev(i)); i += 1 }
            Some((clipId, f, sad, sad > threshold))
          } else None
          prev = cur
          row
        }.toArray.iterator
      } finally rd.dispose()
    }.toDF("clip_id", "frame_idx", "sad", "is_cut")
  }

  /** Temporal CLIP WINDOWING — the video analog of token chunking
    * (TextOps.chunkTokens): split each video into winFrames-frame
    * training clips stepped by `stride` (overlapping when stride <
    * winFrames; the tail window may be shorter; window starts are
    * emitted while start < nFrames so every frame lands in at least one
    * window). Each frame decodes ONCE per clip; windows are cut over
    * the per-frame gray-sum array in memory. The position-weighted
    * checksum (sum of (offset+1) x frame gray-sum) pins frame ORDER
    * within the window, not just membership. Same per-clip no-shuffle
    * kernel shape as [[frameStats]]. Emits (clip_id, win_idx,
    * first_frame, n_frames, wsum). */
  /** Per-frame integer gray-sums of one GIF clip, decoded with a
    * per-call reader instance (ImageIO readers are stateful) — the
    * shared kernel of [[clipWindows]] and [[keyFrames]]. */
  private def graySums(bytes: Array[Byte]): Array[Long] = {
    val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    try {
      rd.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      Array.tabulate(rd.getNumImages(true)) { f =>
        val img = rd.read(f)
        val w = img.getWidth; val h = img.getHeight
        var s = 0L; var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { s += (img.getRGB(x, y) & 0xFF); x += 1 }
          y += 1
        }
        s
      }
    } finally rd.dispose()
  }

  /** Window bounds over an n-frame clip: (win_idx, first, len) with
    * starts every `stride` while start < n — the one windowing contract
    * [[clipWindows]] and [[keyFrames]] share. */
  private def windowBounds(n: Int, winFrames: Int,
      stride: Int): Seq[(Int, Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int, Int)]
    var wi = 0
    while (wi * stride < n) {
      val first = wi * stride
      out += ((wi, first, math.min(winFrames, n - first)))
      wi += 1
    }
    out.result()
  }

  def clipWindows(clips: Dataset[(Long, Array[Byte])], winFrames: Int,
      stride: Int): DataFrame = {
    require(winFrames > 0, s"clipWindows: winFrames must be > 0, got $winFrames")
    require(stride > 0 && stride <= winFrames,
      s"clipWindows: stride must be in [1, winFrames], got $stride")
    val spark = clips.sparkSession
    import spark.implicits._
    clips.flatMap { case (clipId, bytes) =>
      val gsum = graySums(bytes)
      windowBounds(gsum.length, winFrames, stride).iterator
        .map { case (wi, first, len) =>
          var wsum = 0L; var j = 0
          while (j < len) { wsum += (j + 1).toLong * gsum(first + j); j += 1 }
          (clipId, wi, first, len, wsum)
        }
    }.toDF("clip_id", "win_idx", "first_frame", "n_frames", "wsum")
  }

  /** KEYFRAME selection — the representative-frame pick of video
    * curation (thumbnailing, dedup keys, caption targets): each clip is
    * cut into `winFrames`-frame windows stepped by `stride` (same
    * windowing contract as [[clipWindows]]), and each window elects the
    * frame with the LARGEST gray-sum; ties go to the SMALLEST frame
    * index so the choice is deterministic. Gray-sums are integers from
    * the decoded 8-bit planes, so two engines decoding the same frames
    * elect identical keyframes — no float scoring to drift. Production
    * swaps in a sharper salience score (e.g. Laplacian energy) over the
    * same argmax contract. Per-clip kernel, frames decode once, no
    * shuffle. Emits (clip_id, win_idx, key_frame, key_gsum). */
  def keyFrames(clips: Dataset[(Long, Array[Byte])], winFrames: Int,
      stride: Int): DataFrame = {
    require(winFrames > 0, s"keyFrames: winFrames must be > 0, got $winFrames")
    require(stride > 0 && stride <= winFrames,
      s"keyFrames: stride must be in [1, winFrames], got $stride")
    val spark = clips.sparkSession
    import spark.implicits._
    clips.flatMap { case (clipId, bytes) =>
      val gsum = graySums(bytes)
      windowBounds(gsum.length, winFrames, stride).iterator
        .map { case (wi, first, len) =>
          var best = first
          var j = 1
          while (j < len) {
            if (gsum(first + j) > gsum(best)) best = first + j
            j += 1
          }
          (clipId, wi, best, gsum(best))
        }
    }.toDF("clip_id", "win_idx", "key_frame", "key_gsum")
  }
}
