package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column handling: image/audio/video as opaque `binary` content
 * with typed metadata, plus the feature-extraction plumbing a training-data
 * pipeline needs.
 *
 * Decode comes in two tiers. Images (PNG/JPEG/BMP/GIF) and 16-bit PCM WAV
 * decode for REAL with the JDK's own codecs (`javax.imageio`,
 * `javax.sound.sampled` — see the "REAL in-JVM codec path" section below):
 * actual pixels and samples from actual compressed bytes, exact-integer
 * statistics out. Video CONTAINERS demux for real too — the RIFF-AVI
 * chunk walk ([[demuxAviFrames]]) splits container bytes into per-frame
 * payloads (MJPEG/PNG frames then ride the imageio path); only codecs the
 * JVM cannot decode (H.264 frame payloads) stay out of scope, with
 * [[sampleFrames]] as the metadata-level planner. Both tiers share the
 * plumbing that must survive
 * a 100 TB corpus: decode runs via `mapPartitions` so each task amortizes
 * codec setup over a whole batch of rows, the exact shape a Pandas
 * UDF / native codec would plug into, and content stays one opaque binary
 * column so parquet scans of metadata-only queries never read the bytes
 * (column pruning).
 */
object Multimodal {

  /** Typed media row: opaque payload + structured metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String,            // image | audio | video
      format: String,          // png | jpg | wav | mp4 | ...
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Int,
      content: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      feature: Array[Float])   // fixed-size fake embedding

  val FeatureDim = 16

  /**
   * STUB decode/feature-extract: a real deployment replaces the body marked
   * below with a codec call (e.g. JNI decode or an Arrow batch handed to a
   * Python worker). Deterministic fake: 16-bin byte histogram, L1-normalized
   * — exercises the full distributed plumbing (binary column -> per-partition
   * batch -> fixed-width vector) with verifiable output.
   */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // >>> per-partition setup: a real impl opens the codec ONCE here <<<
      rows.map { m =>
        // >>> STUB: replace with real decode of m.content <<<
        val hist = new Array[Float](FeatureDim)
        var i = 0
        while (i < m.content.length) {
          hist((m.content(i) & 0xff) / (256 / FeatureDim)) += 1f
          i += 1
        }
        val total = math.max(1f, m.content.length.toFloat)
        MediaFeatures(m.media_id, m.kind, m.content.length.toLong,
          hist.map(_ / total))
      }
    }
  }

  /** STUB resize: metadata-only transform (a real impl re-encodes content). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(m => m.copy(width = w, height = h))
  }

  /** METADATA-ONLY frame sampling: emits one row per sampled frame index
    * from duration metadata without touching content bytes. For containers
    * the JVM can actually split, use [[demuxFrames]] (real RIFF-AVI chunk
    * walk -> frame payload table); this remains the planning-level sampler
    * for formats with no in-JVM payload path (H.264 et al.). */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Int): DataFrame = {
    val df = media.toDF()
    df.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), greatest(col("duration_ms"), lit(0)),
          lit(everyMs))).as("frame_ms"))
  }

  /** Build a deterministic media table from the documents fixture: content =
    * UTF-8 bytes of the text (the opaque-binary stand-in), metadata derived
    * from doc stats. Exercises the real schema end-to-end. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        element_at(array(lit("png"), lit("wav"), lit("mp4")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 10).cast("int").as("duration_ms"),
        col("text").cast("binary").as("content"))
      .as[MediaRow]
  }

  /** Metadata-only projection — demonstrates that content bytes are pruned
    * from the scan (check `.explain`: ReadSchema excludes `content`). */
  def metadataSummary(media: Dataset[MediaRow]): DataFrame =
    media.toDF().groupBy("kind", "format")
      .agg(count("*").as("n"),
        sum(col("duration_ms").cast("long")).as("total_ms"))

  // ==================== REAL in-JVM codec path ====================
  // The stub above stands in for formats the JVM cannot decode (video).
  // For images and PCM WAV the JDK itself ships codecs — javax.imageio
  // (PNG/JPEG/BMP/GIF) and javax.sound.sampled — so the decode below is
  // REAL: actual pixels and samples come out of actual compressed bytes,
  // with the same mapPartitions batch shape the stub documents. All
  // emitted statistics are exact integers (sums, histograms), so results
  // are bit-identical on any JVM regardless of codec internals.

  final case class DecodedImage(media_id: Long, width: Int, height: Int,
      n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long,
      luma_hist: Seq[Long])

  /** Decode images with the JDK's own codecs and emit exact pixel
    * statistics: per-channel sums and a 16-bin integer-luma histogram
    * (luma = (299r+587g+114b)/1000, exact integer math). Fails loudly on
    * bytes no JDK codec accepts — silent nulls would poison a corpus. */
  def decodeImages(media: Dataset[(Long, Array[Byte])])
      : Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no tmp-file churn per task
      rows.map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, s"media $id: no JDK codec for these bytes")
        val (w, h) = (img.getWidth, img.getHeight)
        var sr = 0L; var sg = 0L; var sb = 0L
        val hist = new Array[Long](16)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
            sr += r; sg += g; sb += b
            hist(((r * 299 + g * 587 + b * 114) / 1000) >> 4) += 1
            x += 1
          }
          y += 1
        }
        DecodedImage(id, w, h, w.toLong * h, sr, sg, sb,
          scala.collection.immutable.ArraySeq.unsafeWrapArray(hist))
      }
    }
  }

  /** REAL resize: decode, nearest-neighbor sample (explicit integer pixel
    * mapping `sx = x*srcW/w` — deterministic on every platform, unlike
    * interpolating Graphics2D paths), re-encode PNG. Emitted bytes may
    * differ across PNG encoder versions; the PIXELS are exact — compare
    * via [[decodeImages]], not byte equality. */
  def resizeImages(media: Dataset[(Long, Array[Byte])], w: Int, h: Int)
      : Dataset[(Long, Array[Byte])] = {
    require(w > 0 && h > 0, s"resize to ${w}x$h")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { case (id, bytes) =>
        val src = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(src != null, s"media $id: no JDK codec for these bytes")
        val dst = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          val sy = y * src.getHeight / h
          var x = 0
          while (x < w) {
            dst.setRGB(x, y, src.getRGB(x * src.getWidth / w, sy))
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", out)
        (id, out.toByteArray)
      }
    }
  }

  final case class WavInfo(media_id: Long, sample_rate: Int, channels: Int,
      n_frames: Long, peak_abs: Int, sum_abs: Long)

  /** Decode 16-bit PCM WAV with javax.sound.sampled and emit exact sample
    * statistics (peak and sum of absolute amplitudes across channels). */
  def decodeWav(media: Dataset[(Long, Array[Byte])]): Dataset[WavInfo] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          require(f.getSampleSizeInBits == 16,
            s"media $id: expected 16-bit PCM, got ${f.getSampleSizeInBits}")
          // 16-bit alone is not enough: a PCM_UNSIGNED (or float) stream
          // would decode as signed garbage silently — fail loudly instead
          require(f.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"media $id: expected PCM_SIGNED, got ${f.getEncoding}")
          val data = in.readAllBytes()
          var peak = 0; var sum = 0L
          var i = 0
          while (i + 1 < data.length) {
            val s =
              if (f.isBigEndian) (data(i) << 8) | (data(i + 1) & 0xff)
              else (data(i + 1) << 8) | (data(i) & 0xff)
            val a = math.abs(s)
            if (a > peak) peak = a
            sum += a
            i += 2
          }
          WavInfo(id, f.getSampleRate.toInt, f.getChannels,
            data.length / f.getFrameSize, peak, sum)
        } finally in.close()
      }
    }
  }

  /** Deterministic test-pattern PNG: an id-seeded gradient with stripes —
    * REAL compressed PNG bytes for driving the codec path end-to-end. */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 255 / math.max(1, w - 1)) & 0xff
        val g = (y * 255 / math.max(1, h - 1)) & 0xff
        val b = (((x + y + id) % 8) * 32).toInt & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic FAMILY-pattern PNG for near-duplicate demos: ids in the
    * same family (`id / 10`) share a gradient+stripe base image and each id
    * perturbs exactly one pixel row (`y == id % h`, blue inverted) — so
    * sibling images are perceptual near-duplicates whose [[imageAHash]]
    * distance depends on whether the 8x8 sampling grid hits the perturbed
    * row. Every pixel is pure integer arithmetic of (x, y, id), and PNG is
    * lossless, so an external engine can replay the DECODED pixels — and
    * the hash — from the formula without any codec. */
  def syntheticPngFamily(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val fam = id / 10
        // family-unique gradient offsets: without them, families sharing a
        // stripe phase (fam % 8) render IDENTICAL images and the near-dup
        // classes grow with the corpus instead of the family size
        val r = ((x * 255 / math.max(1, w - 1)) + (fam % 7) * 36).toInt % 256
        val g = ((y * 255 / math.max(1, h - 1)) + (fam % 11) * 23).toInt % 256
        val base = (((x + y + fam) % 8) * 32).toInt & 0xff
        val b = if (y == (id % h)) 255 - base else base
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  final case class ImageHash(media_id: Long, ahash: Long)

  /** 64-bit average-hash (aHash) perceptual image fingerprint: decode with
    * the JDK codec, nearest-neighbor-sample an 8x8 luma grid (the same
    * integer pixel mapping as [[resizeImages]], the same integer luma as
    * [[decodeImages]]), and set bit `y*8+x` iff the cell's luma STRICTLY
    * exceeds the 64-cell mean — compared as `luma*64 > total`, so the hash
    * is exact integer arithmetic end to end: no float, no platform or
    * encoder dependence, replayable by any engine that can reproduce the
    * pixels. Near-duplicate images differ in few bits; feed the result to
    * [[Dedup.hammingNearDups]] (bits = 64) for corpus-wide pairs. */
  def imageAHash(media: Dataset[(Long, Array[Byte])]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { case (id, bytes) => ImageHash(id, ahashBytes(id, bytes)) }
    }
  }

  /** Decode one image and compute its 64-bit aHash — the per-row core of
    * [[imageAHash]], shared with [[sceneCuts]]. Caller is expected to have
    * disabled the ImageIO disk cache once per partition. */
  private[ops] def ahashBytes(id: Long, bytes: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"media $id: no JDK codec for these bytes")
    val (sw, sh) = (img.getWidth, img.getHeight)
    val luma = new Array[Long](64)
    var tot = 0L
    var i = 0
    while (i < 64) {
      val p = img.getRGB((i & 7) * sw / 8, (i >> 3) * sh / 8)
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      val l = (r * 299L + g * 587L + b * 114L) / 1000L
      luma(i) = l; tot += l
      i += 1
    }
    var hsh = 0L
    i = 0
    while (i < 64) { if (luma(i) * 64 > tot) hsh |= (1L << i); i += 1 }
    hsh
  }

  /** Shot-boundary (scene-cut) detection over a per-frame image table —
    * the first pass of any video curation pipeline (segment before
    * captioning/sampling; near-static shots collapse to one keyframe).
    * Each frame is decoded and aHashed in the scan stage ([[ahashBytes]]
    * — real codec, exact-integer hash); a CUT is a consecutive-frame step
    * whose hamming distance STRICTLY exceeds `threshold` bits. The step
    * pass is one `lag` window per media ordered by frame index — state
    * bounded by a clip's frame count, never the corpus, so the shape
    * survives 100 TB of video rows. Output per clip: frame count, cut
    * count, summed and maximal step distances (exact BIGINTs). */
  def sceneCuts(frames: Dataset[(Long, Int, Array[Byte])],
      threshold: Int): DataFrame = {
    import frames.sparkSession.implicits._
    val hashed = frames.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { case (id, idx, bytes) => (id, idx, ahashBytes(id, bytes)) }
    }.toDF("media_id", "frame_idx", "ahash")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy(col("frame_idx").asc)
    hashed.withColumn("prev", lag(col("ahash"), 1).over(w))
      .withColumn("ham", expr("bit_count(ahash ^ prev)").cast("long"))
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("ham") > threshold, 1L).otherwise(0L)).as("n_cuts"),
        coalesce(sum(when(col("ham") > threshold, col("ham"))), lit(0L))
          .as("sum_cut_hamming"),
        coalesce(max(col("ham")), lit(0L)).as("max_hamming"))
  }

  /**
   * Keyframe selection — the video-summarization step after shot
   * detection: segment each clip into scenes at aHash steps (the
   * [[sceneCuts]] rule, strictly > `threshold` hamming bits) and pick the
   * SHARPEST frame of each scene as its representative (argmax Laplacian
   * energy, ties to the earliest frame — the standard "caption one frame
   * per shot" preprocessing for video-text training data; blurred
   * motion/transition frames lose to crisp ones).
   *
   * Scale shape: ONE decode per frame computes both the 8×8 aHash and
   * the interior Laplacian sum off the same luma grid (decode dominates
   * — never decode twice); the scene assignment is a per-clip lag +
   * running-sum window (state bounded by clip length); the argmax is one
   * combine-enabled min(struct) aggregate. All integers; the oracle
   * replays pixels, hash, stencil, cuts and the pick.
   */
  def keyframes(frames: Dataset[(Long, Int, Array[Byte])],
      threshold: Int): DataFrame = {
    import frames.sparkSession.implicits._
    val scored = frames.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { case (id, idx, bytes) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, s"media $id: no JDK codec for these bytes")
        val (sw, sh) = (img.getWidth, img.getHeight)
        val l = Array.ofDim[Long](8, 8)
        var tot = 0L
        var gy = 0
        while (gy < 8) {
          var gx = 0
          while (gx < 8) {
            val p = img.getRGB(gx * sw / 8, gy * sh / 8)
            val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff
            val b = p & 0xff
            l(gy)(gx) = (r * 299L + g * 587L + b * 114L) / 1000L
            tot += l(gy)(gx)
            gx += 1
          }
          gy += 1
        }
        var hsh = 0L
        var i = 0
        while (i < 64) {
          if (l(i >> 3)(i & 7) * 64 > tot) hsh |= (1L << i)
          i += 1
        }
        var sharp = 0L
        gy = 1
        while (gy < 7) {
          var gx = 1
          while (gx < 7) {
            sharp += math.abs(4 * l(gy)(gx) - l(gy)(gx - 1) -
              l(gy)(gx + 1) - l(gy - 1)(gx) - l(gy + 1)(gx))
            gx += 1
          }
          gy += 1
        }
        (id, idx, hsh, sharp)
      }
    }.toDF("media_id", "frame_idx", "ahash", "sharp")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy(col("frame_idx").asc)
    scored
      .withColumn("prev", lag(col("ahash"), 1).over(w))
      .withColumn("cut",
        when(expr("bit_count(ahash ^ prev)").cast("long") > threshold, 1L)
          .otherwise(0L))
      .withColumn("scene_id", sum(col("cut")).over(w))
      .groupBy("media_id", "scene_id")
      .agg(count(lit(1)).as("n_frames"),
        min(struct((-col("sharp")).as("ns"),
          col("frame_idx").cast("long").as("ki"))).as("p"))
      .select(col("media_id"), col("scene_id"), col("n_frames"),
        col("p.ki").as("keyframe_idx"), (-col("p.ns")).as("sharpness"))
  }

  final case class ImageSharpness(media_id: Long, sharpness: Long,
    lap_max: Long)

  /** Laplacian sharpness score — the blur gate of an image curation
    * pipeline (the variance-of-Laplacian idea in exact integers): sample
    * the same 8x8 luma grid as [[imageAHash]], take the 4-neighbour
    * Laplacian response |4·l − l_left − l_right − l_up − l_down| at the
    * 36 interior cells, and report the exact sum and max. Defocused or
    * flat images score near zero; textured/sharp ones score high. Pure
    * integer arithmetic over decoded pixels — replayable by any engine
    * that can reproduce the pixels, no float variance. */
  def imageSharpness(media: Dataset[(Long, Array[Byte])])
      : Dataset[ImageSharpness] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, s"media $id: no JDK codec for these bytes")
        val (sw, sh) = (img.getWidth, img.getHeight)
        val l = Array.ofDim[Long](8, 8)
        var gy = 0
        while (gy < 8) {
          var gx = 0
          while (gx < 8) {
            val p = img.getRGB(gx * sw / 8, gy * sh / 8)
            val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff
            val b = p & 0xff
            l(gy)(gx) = (r * 299L + g * 587L + b * 114L) / 1000L
            gx += 1
          }
          gy += 1
        }
        var tot = 0L; var mx = 0L
        gy = 1
        while (gy < 7) {
          var gx = 1
          while (gx < 7) {
            val v = math.abs(4 * l(gy)(gx) - l(gy)(gx - 1) -
              l(gy)(gx + 1) - l(gy - 1)(gx) - l(gy + 1)(gx))
            tot += v; if (v > mx) mx = v
            gx += 1
          }
          gy += 1
        }
        ImageSharpness(id, tot, mx)
      }
    }
  }

  final case class AudioActivity(media_id: Long, n_frames: Long,
    n_active: Long, n_segments: Long, longest_run: Long, total_energy: Long)

  /** Energy-threshold voice-activity detection (VAD) — the segmentation
    * gate an audio training pipeline runs before transcription: frames
    * are the same 65-way split as [[audioEnergyHash]] (sample i → frame
    * i·65/n, exact |amplitude| sums), a frame is ACTIVE iff
    * `energy · n_frames > total_energy` (strictly above the clip mean —
    * scale-free, so the gate is amplitude-invariant), and segments are
    * maximal active runs. The run-length scan happens INSIDE the per-clip
    * map (a clip's frame count is bounded by construction) — no window,
    * no shuffle: pure scan-stage projection, the 100 TB shape. */
  def audioActivity(media: Dataset[(Long, Array[Byte])])
      : Dataset[AudioActivity] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          require(f.getSampleSizeInBits == 16 && f.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"media $id: need 16-bit PCM_SIGNED, got ${f.getEncoding}")
          val data = in.readAllBytes()
          val n = data.length / 2
          val energy = new Array[Long](65)
          var i = 0
          while (i < n) {
            val o = 2 * i
            val s =
              if (f.isBigEndian) (data(o) << 8) | (data(o + 1) & 0xff)
              else (data(o + 1) << 8) | (data(o) & 0xff)
            energy((i.toLong * 65 / n).toInt) += math.abs(s)
            i += 1
          }
          var tot = 0L
          var b = 0
          while (b < 65) { tot += energy(b); b += 1 }
          var nAct = 0L; var nSeg = 0L; var longest = 0L; var run = 0L
          b = 0
          while (b < 65) {
            if (energy(b) * 65 > tot) {
              if (run == 0) nSeg += 1
              run += 1; nAct += 1
              if (run > longest) longest = run
            } else run = 0
            b += 1
          }
          AudioActivity(id, 65L, nAct, nSeg, longest, tot)
        } finally in.close()
      }
    }
  }

  final case class PHash(media_id: Long, phash: Long)

  /** Fixed-point DCT-II basis, C(u,x) = round(cos((2x+1)·u·π/16) · 4096):
    * computed ONCE here and interpolated as integer literals into the
    * oracle SQL, so both engines multiply the identical table — the
    * transcendental never crosses an engine boundary. */
  val DctBasis: Array[Array[Long]] = Array.tabulate(8, 8) { (u, x) =>
    math.round(math.cos((2 * x + 1) * u * math.Pi / 16.0) * 4096.0)
  }

  /** 64-bit DCT perceptual hash (pHash): decode, sample the same 8x8 luma
    * grid as [[imageAHash]], apply an exact-integer 2D DCT-II with the
    * fixed-point [[DctBasis]] table, and set bit u·8+v iff that AC
    * coefficient STRICTLY exceeds the median (defined as the 32nd
    * smallest of the 63 AC values — a pure order statistic, so tie order
    * never matters). Where aHash thresholds raw luminance (fooled by a
    * global brightness ramp), pHash thresholds spectral shape — robust to
    * brightness/contrast shifts that preserve structure. Integer end to
    * end (|coef| ≤ 64·4096²·255 ≈ 2.7e11), replayable by any engine that
    * can reproduce the pixels. Feed to [[Dedup.hammingNearDups]] for
    * corpus-wide pairs, exactly like aHash. */
  def imagePHash(media: Dataset[(Long, Array[Byte])]): Dataset[PHash] = {
    import media.sparkSession.implicits._
    val basis = DctBasis
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, s"media $id: no JDK codec for these bytes")
        val (sw, sh) = (img.getWidth, img.getHeight)
        val l = new Array[Long](64) // index y*8+x
        var i = 0
        while (i < 64) {
          val p = img.getRGB((i & 7) * sw / 8, (i >> 3) * sh / 8)
          val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
          l(i) = (r * 299L + g * 587L + b * 114L) / 1000L
          i += 1
        }
        val f = new Array[Long](64) // index u*8+v
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            var s = 0L
            var x = 0
            while (x < 8) {
              var y = 0
              while (y < 8) {
                s += basis(u)(x) * basis(v)(y) * l(y * 8 + x)
                y += 1
              }
              x += 1
            }
            f(u * 8 + v) = s
            v += 1
          }
          u += 1
        }
        val ac = java.util.Arrays.copyOfRange(f, 1, 64)
        java.util.Arrays.sort(ac)
        val med = ac(31) // 32nd smallest of 63
        var h = 0L
        var b = 1
        while (b < 64) {
          if (f(b) > med) h |= (1L << b)
          b += 1
        }
        PHash(id, h)
      }
    }
  }

  final case class ImageEntropy(media_id: Long, n_levels: Long,
      entropy_bits_x64: Long)

  /** Whole-bit luminance entropy over the standard 8x8 sample grid — the
    * flat-image / screenshot gate of image curation: a single-color image
    * scores 0, a textured photo scores high. Shannon entropy needs log2;
    * the whole-bit form Σ c·(bits(N) − bits(c)) (N = 64 samples) is exact
    * integer arithmetic, replayable anywhere — the same
    * transcendental-free trick as the text surprisal score. Returned
    * scaled by N (=64): divide by 64.0 for bits-per-pixel. */
  def imageEntropy(media: Dataset[(Long, Array[Byte])])
      : Dataset[ImageEntropy] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, s"media $id: no JDK codec for these bytes")
        val (sw, sh) = (img.getWidth, img.getHeight)
        val counts = new java.util.HashMap[Long, Long]()
        var i = 0
        while (i < 64) {
          val p = img.getRGB((i & 7) * sw / 8, (i >> 3) * sh / 8)
          val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
          val l = (r * 299L + g * 587L + b * 114L) / 1000L
          counts.merge(l, 1L, (a, x) => a + x)
          i += 1
        }
        def bits(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
        var e = 0L
        val it = counts.values().iterator()
        while (it.hasNext) { val c = it.next(); e += c * (bits(64L) - bits(c)) }
        ImageEntropy(id, counts.size().toLong, e)
      }
    }
  }

  final case class TileHash(media_id: Long, tile: Int, thash: Long)

  /** Per-TILE perceptual hashes for PARTIAL-overlap detection — the
    * image-space analog of text span dedup: the image splits into
    * tilesX × tilesY regions, each hashed independently with the same
    * exact-integer mean-threshold rule as [[imageAHash]] over a
    * grid × grid luminance sample (grid² bits per tile). Two images
    * sharing a region (collage, crop, watermark re-composite) collide on
    * that tile's hash even when their WHOLE-image hashes differ in many
    * bits. Join on (tile, thash) for candidate pairs; filter hot tile
    * hashes (flat backgrounds) by document frequency, exactly like hot
    * shingles in text dedup. Integer end to end, replayable.
    *
    * MARGIN TRUNCATION: tile width/height are integer divisions
    * (`sw / tilesX`, `sh / tilesY`), so when the image dimensions are not
    * divisible by the tile grid the right/bottom remainder pixels (up to
    * `tilesX-1` columns / `tilesY-1` rows) are never sampled — two images
    * differing ONLY in that margin hash identically. This is intentional
    * (a perceptual hash tolerates edge noise by design) but means the
    * hash is not a full-image integrity check; use a byte digest for
    * that. */
  def imageTileHash(media: Dataset[(Long, Array[Byte])], tilesX: Int = 2,
      tilesY: Int = 2, grid: Int = 4): Dataset[TileHash] = {
    import media.sparkSession.implicits._
    require(grid * grid <= 62, s"grid=$grid overflows a long hash")
    media.flatMap { case (id, bytes) =>
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"media $id: no JDK codec for these bytes")
      val (sw, sh) = (img.getWidth, img.getHeight)
      val (tw, th) = (sw / tilesX, sh / tilesY)
      val n = grid * grid
      for (ty <- 0 until tilesY; tx <- 0 until tilesX) yield {
        val luma = new Array[Long](n)
        var tot = 0L
        var i = 0
        while (i < n) {
          val px = tx * tw + (i % grid) * tw / grid
          val py = ty * th + (i / grid) * th / grid
          val p = img.getRGB(px, py)
          val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff
          val b = p & 0xff
          val l = (r * 299L + g * 587L + b * 114L) / 1000L
          luma(i) = l; tot += l
          i += 1
        }
        var hsh = 0L
        i = 0
        while (i < n) { if (luma(i) * n > tot) hsh |= (1L << i); i += 1 }
        TileHash(id, ty * tilesX + tx, hsh)
      }
    }
  }

  final case class AudioHash(media_id: Long, ehash: Long)

  /** 64-bit energy-difference audio fingerprint (the classic acoustic-hash
    * bit rule): decode 16-bit signed PCM with the JDK codec, split the
    * samples into 65 equal frames (sample i belongs to frame `i*65/n` —
    * integer mapping), take each frame's exact absolute-amplitude energy,
    * and set bit f iff `energy(f) > energy(f+1)` (strict). Integer end to
    * end — replayable by any engine that can reproduce the samples, and
    * robust to local perturbations the way a raw sample hash is not. Feed
    * to [[Dedup.hammingNearDups]] (bits = 64). */
  def audioEnergyHash(media: Dataset[(Long, Array[Byte])])
      : Dataset[AudioHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          require(f.getSampleSizeInBits == 16 && f.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"media $id: need 16-bit PCM_SIGNED, got ${f.getEncoding}")
          val data = in.readAllBytes()
          val n = data.length / 2
          val energy = new Array[Long](65)
          var i = 0
          while (i < n) {
            val o = 2 * i
            val s =
              if (f.isBigEndian) (data(o) << 8) | (data(o + 1) & 0xff)
              else (data(o + 1) << 8) | (data(o) & 0xff)
            energy((i.toLong * 65 / n).toInt) += math.abs(s)
            i += 1
          }
          var hsh = 0L
          var b = 0
          while (b < 64) {
            if (energy(b) > energy(b + 1)) hsh |= (1L << b)
            b += 1
          }
          AudioHash(id, hsh)
        } finally in.close()
      }
    }
  }

  final case class SpectralHash(media_id: Long, shash: Long)

  /** Fixed-point DFT basis for [[audioSpectralHash]]: bin k ∈ 1..4 cycles
    * per 32-sample frame, c/s = round(cos/sin(2π·k·t/32)·1024). Computed
    * once and interpolated into the oracle as literals — the
    * transcendentals never recompute cross-engine. */
  val DftCos: Array[Array[Long]] = Array.tabulate(4, 32) { (k, t) =>
    math.round(math.cos(2 * math.Pi * (k + 1) * t / 32.0) * 1024.0)
  }
  val DftSin: Array[Array[Long]] = Array.tabulate(4, 32) { (k, t) =>
    math.round(math.sin(2 * math.Pi * (k + 1) * t / 32.0) * 1024.0)
  }

  /** 64-bit SPECTRAL audio fingerprint — the frequency-domain complement
    * of [[audioEnergyHash]] (which only sees loudness): each 32-sample
    * frame gets an exact-integer 4-bin DFT power (re² + im² with the
    * fixed-point [[DftCos]]/[[DftSin]] tables), the dominant bin (ties to
    * the lowest) becomes a 2-bit symbol, and the first 32 frames pack
    * into one BIGINT. A pitch-shifted copy moves symbols; an
    * amplitude-scaled copy does not (argmax is scale-invariant) — the
    * Shazam-style constellation idea reduced to its deterministic core.
    * Integer bounds: |sample| < 2^15, |basis| ≤ 1024, 32 terms →
    * |re| ≤ 2^30, re² ≤ 2^60 — exact in BIGINT. Replayable by any engine
    * that can reproduce the samples. */
  def audioSpectralHash(media: Dataset[(Long, Array[Byte])])
      : Dataset[SpectralHash] = {
    import media.sparkSession.implicits._
    val (cosT, sinT) = (DftCos, DftSin)
    media.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          require(f.getSampleSizeInBits == 16 && f.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"media $id: need 16-bit PCM_SIGNED, got ${f.getEncoding}")
          val data = in.readAllBytes()
          val n = data.length / 2
          def sample(i: Int): Long = {
            val o = 2 * i
            if (f.isBigEndian) ((data(o) << 8) | (data(o + 1) & 0xff)).toLong
            else ((data(o + 1) << 8) | (data(o) & 0xff)).toLong
          }
          val nFrames = math.min(n / 32, 32)
          var h = 0L
          var fr = 0
          while (fr < nFrames) {
            var bestK = 0
            var bestP = Long.MinValue
            var k = 0
            while (k < 4) {
              var re = 0L; var im = 0L; var t = 0
              while (t < 32) {
                val x = sample(fr * 32 + t)
                re += x * cosT(k)(t)
                im += x * sinT(k)(t)
                t += 1
              }
              val p = re * re + im * im
              if (p > bestP) { bestP = p; bestK = k } // strict: ties low k
              k += 1
            }
            h |= bestK.toLong << (2 * fr)
            fr += 1
          }
          SpectralHash(id, h)
        } finally in.close()
      }
    }
  }

  /** Deterministic FAMILY-pattern WAV for near-duplicate demos — the audio
    * twin of [[syntheticPngFamily]]: ids sharing `id / 10` render the same
    * triangle wave (family-dependent amplitude and period) and each id
    * SILENCES one 64-sample segment (`start = (id % 61) * 32`). Samples are
    * pure integer arithmetic of (i, id), and WAV PCM is lossless, so an
    * external engine replays the decoded samples — and the
    * [[audioEnergyHash]] — from the formula. Fixed length 2080 samples
    * (65 frames x 32). */
  def syntheticWavFamily(id: Long, sampleRate: Int): Array[Byte] = {
    val n = 2080
    val fam = id / 10
    val amp = 6000 + (fam % 50).toInt * 50
    val period = 32 + (fam % 5).toInt * 16
    // family phase shift: the energy-difference hash is amplitude-invariant
    // (energies scale with amp, the > comparison doesn't), so without a
    // phase term families sharing a period would hash identically and the
    // near-dup classes would grow with the corpus (see PERF_NOTES round 6)
    val phase = (fam % 97).toInt
    val cut0 = (id % 61).toInt * 32
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val j = i + phase
      val ph = j % period
      val tri = if (ph < period / 2) ph else period - ph
      val base = tri * 2 * amp / period * (if ((j / period) % 2 == 0) 1 else -1)
      val s = if (i >= cut0 && i < cut0 + 64) 0 else base
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1,
      true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Deterministic 16-bit mono PCM WAV: an exact integer triangle wave. */
  def syntheticWav(id: Long, sampleRate: Int, nFrames: Int): Array[Byte] = {
    val amp = 8000 + (id % 100).toInt * 10
    val period = 64
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val ph = i % period
      val tri = if (ph < period / 2) ph else period - ph
      val s = (tri * 2 * amp / period) * (if ((i / period) % 2 == 0) 1 else -1)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1,
      true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  // ==================== RIFF-AVI container path ====================
  // Video CONTAINER handling for real: AVI is a public RIFF format
  // (fourcc-tagged, little-endian-sized chunks), so a demuxer is pure
  // byte parsing — no codec needed to split a clip into per-frame
  // payloads. The JVM cannot decode H.264, but an MJPEG or PNG-payload
  // AVI demuxes into frames javax.imageio CAN decode, closing the last
  // stub: container bytes -> frame table -> the real-codec ops above
  // ([[sceneCuts]], [[imageAHash]], [[imagePHash]]).

  /** Build a minimal structurally-valid AVI: RIFF('AVI ') with an hdrl
    * LIST (avih + one strl with strh/strf), a movi LIST holding one
    * '00dc' chunk per frame payload (word-aligned, as RIFF requires),
    * and an idx1 index. `fourcc` is the stream codec tag ('MJPG' for
    * JPEG payloads; this builder does not transcode — payloads are
    * written as given). Deterministic: output is a pure function of the
    * inputs. */
  def syntheticAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
      fourcc: String = "MJPG", usPerFrame: Int = 200000): Array[Byte] = {
    require(frames.nonEmpty, "syntheticAvi needs at least one frame")
    require(fourcc.length == 4, s"fourcc must be 4 bytes, got '$fourcc'")
    val bo = java.nio.ByteOrder.LITTLE_ENDIAN
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1 // RIFF: chunks are word-aligned
      val b = java.nio.ByteBuffer.allocate(8 + body.length + pad).order(bo)
      b.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      b.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + body.length).order(bo)
      b.put("LIST".getBytes("US-ASCII")).putInt(4 + body.length)
        .put(kind.getBytes("US-ASCII")).put(body)
      b.array()
    }
    val maxBytes = frames.map(_.length).max
    val avih = { // MainAVIHeader: 14 little-endian u32 fields
      val b = java.nio.ByteBuffer.allocate(56).order(bo)
      b.putInt(usPerFrame).putInt(maxBytes).putInt(0)
        .putInt(0x10) // AVIF_HASINDEX
        .putInt(frames.size).putInt(0).putInt(1).putInt(maxBytes)
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
      b.array()
    }
    val strh = { // AVIStreamHeader: 'vids' + codec fourcc + rate 1e6/us
      val b = java.nio.ByteBuffer.allocate(56).order(bo)
      b.put("vids".getBytes("US-ASCII")).put(fourcc.getBytes("US-ASCII"))
        .putInt(0).putInt(0).putInt(0)
        .putInt(usPerFrame).putInt(1000000) // scale/rate
        .putInt(0).putInt(frames.size).putInt(maxBytes).putInt(-1).putInt(0)
        .putShort(0.toShort).putShort(0.toShort)
        .putShort(w.toShort).putShort(h.toShort)
      b.array()
    }
    val strf = { // BITMAPINFOHEADER with the codec fourcc as biCompression
      val b = java.nio.ByteBuffer.allocate(40).order(bo)
      b.putInt(40).putInt(w).putInt(h).putShort(1.toShort)
        .putShort(24.toShort).put(fourcc.getBytes("US-ASCII"))
        .putInt(w * h * 3).putInt(0).putInt(0).putInt(0).putInt(0)
      b.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val moviBody = frames.map(f => chunk("00dc", f))
    val movi = list("movi", moviBody.flatten.toArray)
    val idx1 = { // AVIINDEXENTRY per frame: ckid, KEYFRAME, offset, size
      val b = java.nio.ByteBuffer.allocate(16 * frames.size).order(bo)
      var off = 4 // offsets are relative to the 'movi' fourcc
      frames.indices.foreach { i =>
        b.put("00dc".getBytes("US-ASCII")).putInt(0x10)
          .putInt(off).putInt(frames(i).length)
        off += moviBody(i).length
      }
      chunk("idx1", b.array())
    }
    val body = hdrl ++ movi ++ idx1
    val out = java.nio.ByteBuffer.allocate(12 + body.length).order(bo)
    out.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("AVI ".getBytes("US-ASCII")).put(body)
    out.array()
  }

  /** RIFF chunk-walk demuxer: AVI container bytes -> per-frame payloads,
    * in stream order. Walks the top-level RIFF('AVI ') chunks to the
    * 'movi' LIST and collects every video-data chunk ('##dc'/'##db',
    * recursing into 'rec ' grouping LISTs as the format allows). Pure
    * byte parsing, no codec. Fails loudly on non-RIFF bytes or a missing
    * movi LIST — a silent empty frame table would poison a corpus. */
  def demuxAviFrames(avi: Array[Byte]): Seq[Array[Byte]] = {
    val bb = java.nio.ByteBuffer.wrap(avi)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(off: Int): String =
      new String(avi, off, 4, "US-ASCII")
    require(avi.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "AVI ",
      s"not a RIFF AVI container (${avi.length} bytes)")
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def isVideoData(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.endsWith("dc") || id.endsWith("db"))
    // walk the chunk sequence in [off, end); descend into movi/rec LISTs
    def walk(off0: Int, end: Int, inMovi: Boolean): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val id = fourcc(off)
        val size = bb.getInt(off + 4)
        require(size >= 0 && off + 8 + size <= end,
          s"corrupt RIFF chunk '$id' at $off: size $size exceeds $end")
        if (id == "LIST") {
          val kind = fourcc(off + 8)
          if (kind == "movi" || (inMovi && kind == "rec "))
            walk(off + 12, off + 8 + size, inMovi = true)
        } else if (inMovi && isVideoData(id)) {
          frames += java.util.Arrays.copyOfRange(avi, off + 8, off + 8 + size)
        }
        off += 8 + size + (size & 1) // skip the word-alignment pad
      }
    }
    walk(12, avi.length, inMovi = false)
    require(frames.nonEmpty, "RIFF AVI container has no movi video chunks")
    frames.toSeq
  }

  /** Dataset-level demux: (media_id, avi_bytes) -> one row per frame
    * (media_id, frame_idx, frame_bytes) — the frame table [[sceneCuts]] /
    * [[imageAHash]] consume. mapPartitions flatMap: container parsing is
    * per-row byte work in the scan stage; a clip's frames land in the
    * same partition as its container row (no shuffle introduced), and
    * downstream per-clip windows repartition by media_id as they already
    * do. This retires the video-container stub: [[sampleFrames]] remains
    * only for metadata-level sampling of formats with no in-JVM payload
    * path. */
  def demuxFrames(media: Dataset[(Long, Array[Byte])])
      : Dataset[(Long, Int, Array[Byte])] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { case (id, avi) =>
        demuxAviFrames(avi).iterator.zipWithIndex
          .map { case (f, i) => (id, i, f) }
      }
    }
  }
}
