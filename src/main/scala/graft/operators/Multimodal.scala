package graft.operators

import graft.GraftSession.table
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extraction /
  * resize / frame-sampling pipelines.
  *
  * The Spark-side plumbing is real — binary schema, per-partition
  * batched iteration, explode shapes, codegen'd expressions. All three
  * modalities decode for REAL with JDK built-ins: images through
  * [[ImageCodec]] (`javax.imageio` — true dimensions, pixel-mean
  * features), audio through [[AudioCodec]] (`javax.sound.sampled` —
  * true sample rate/duration, RMS/peak/ZCR), and AVI/MJPEG video
  * through [[VideoCodec]] (RIFF chunk walk + per-frame `ImageIO` —
  * true dims/frame count/duration, luma/motion features). Payloads no
  * codec recognizes fall back to [[StubCodec]], a clearly-marked
  * DETERMINISTIC stand-in that derives features from md5 of the
  * payload — so every pipeline keeps an exact cross-engine oracle
  * regardless of payload contents.
  *
  * Scale notes: all operators are narrow (no shuffle) over the payload
  * column; at 100 TB the binary column dominates scan cost, so
  * pipelines project metadata/features early and never carry payloads
  * past the first select. Payload-heavy stages are embarrassingly
  * parallel map partitions.
  */
object Multimodal {

  /** Typed decoded-media record (the mapPartitions pipeline output).
    * `width`/`height` are the REAL decoded dimensions when the payload
    * is a decodable image; `sample_rate`/`duration_ms` the REAL stream
    * properties when it is decodable audio; 0 otherwise (stub
    * fallback).
    */
  final case class DecodedMedia(
      media_id: Long, kind: String, n_bytes: Long, checksum: String,
      width: Int, height: Int, sample_rate: Int, duration_ms: Long,
      n_frames: Int, features: Array[Float])

  /** ======================= REAL CODEC =======================
    * Actual image decoding via `javax.imageio` — JDK built-in, no new
    * dependencies. Returns None when the payload is not a decodable
    * image (wrong magic bytes, truncated, or a non-image kind), in
    * which case the pipeline falls back to [[StubCodec]] so every row
    * still produces deterministic, oracle-able output.
    *
    * Features (FeatureDim floats in [0,1)): mean R, mean G, mean B,
    * mean luma — each /256. Pixel access is ROW-BULK (`getRGB`'s
    * scanline overload into a reusable buffer): one array conversion
    * call per row instead of w·h per-pixel virtual calls + bounds
    * checks — the decode hot loop's dominant cost at scale. Values are
    * bit-identical to the per-pixel form (same ARGB conversion, same
    * integer sums); memory stays O(width), never O(pixels).
    */
  object ImageCodec {
    final case class Decoded(width: Int, height: Int, features: Array[Float])

    /** Whole-image channel sums via row-bulk reads: (ΣR, ΣG, ΣB).
      * Shared by [[decode]] and the video codec's luma mean.
      */
    private[operators] def rgbSums(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
      val (w, h) = (img.getWidth, img.getHeight)
      val rowBuf = new Array[Int](w)
      var (r, g, b) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var x = 0
        while (x < w) {
          val p = rowBuf(x)
          r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
          x += 1
        }
        y += 1
      }
      (r, g, b)
    }

    def decode(payload: Array[Byte]): Option[Decoded] =
      try {
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
          .map { img =>
            val (w, h) = (img.getWidth, img.getHeight)
            val (r, g, b) = rgbSums(img)
            val n = (w.toLong * h).toDouble
            val luma = (0.299 * r + 0.587 * g + 0.114 * b) / n / 256.0
            Decoded(w, h, Array(
              (r / n / 256.0).toFloat, (g / n / 256.0).toFloat,
              (b / n / 256.0).toFloat, luma.toFloat))
          }
      } catch { case _: java.io.IOException => None }

    /** 64-bit difference hash (dHash) — the standard perceptual image
      * fingerprint: downsample to a 9×8 luma grid (area mean per cell,
      * integer arithmetic — no resampling-library variance), then bit
      * (y,x) = cell(y,x) brighter than cell(y,x+1). Near-identical
      * images (re-encodes, small edits, minor crops) land within a few
      * bits; unrelated images differ in ~32. None for images smaller
      * than the grid.
      */
    def dhash(img: java.awt.image.BufferedImage): Option[Long] = {
      val (w, h) = (img.getWidth, img.getHeight)
      if (w < 9 || h < 8) return None
      // cell (gy, gx) = mean luma (×1000, integer) over its pixel
      // block. Row-bulk traversal: each scanline is fetched ONCE with
      // getRGB's array overload and split across its row of cells —
      // same integer sums as the per-pixel form (bit-identical hash,
      // fixture-asserted), one conversion call per row instead of
      // 72 block-nested per-pixel calls re-walking the image
      val cellSum = Array.ofDim[Long](8, 9)
      val xBound = Array.tabulate(10)(gx => gx * w / 9)
      val rowBuf = new Array[Int](w)
      var gy = 0
      while (gy < 8) {
        val y0 = gy * h / 8; val y1 = (gy + 1) * h / 8
        var y = y0
        while (y < y1) {
          img.getRGB(0, y, w, 1, rowBuf, 0, w)
          var gx = 0
          while (gx < 9) {
            var x = xBound(gx); val xEnd = xBound(gx + 1)
            var s = 0L
            while (x < xEnd) {
              val p = rowBuf(x)
              s += 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
              x += 1
            }
            cellSum(gy)(gx) += s
            gx += 1
          }
          y += 1
        }
        gy += 1
      }
      val cell = Array.tabulate(8, 9) { (cy, cx) =>
        val rows = (cy + 1) * h / 8 - cy * h / 8
        cellSum(cy)(cx) / (rows.toLong * (xBound(cx + 1) - xBound(cx)))
      }
      var bits = 0L
      var i = 0
      while (i < 64) {
        val (y, x) = (i / 8, i % 8)
        if (cell(y)(x) > cell(y)(x + 1)) bits |= 1L << (63 - i)
        i += 1
      }
      Some(bits)
    }
  }

  /** ======================= REAL AUDIO CODEC =======================
    * Actual audio decoding via `javax.sound.sampled` — JDK built-in
    * (WAV/AIFF/AU containers, PCM payloads), no new dependencies.
    * Returns None when the payload is not a decodable audio stream, in
    * which case the pipeline falls back to [[StubCodec]] — mirroring
    * exactly how [[ImageCodec]] handles non-images.
    *
    * Features (FeatureDim floats in [0,1)): RMS amplitude, peak
    * amplitude, zero-crossing rate, normalized sample rate (/192 kHz).
    * The sample loop runs on the executor inside mapPartitions; frames
    * stream through a bounded buffer, never materialized whole.
    */
  object AudioCodec {
    final case class Decoded(
        sampleRate: Int, durationMs: Long, features: Array[Float])
    def decode(payload: Array[Byte]): Option[Decoded] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = ais.getFormat
          // restrict to the PCM_SIGNED 16-bit layout (the standard WAV
          // payload); exotic encodings fall back to the stub
          if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16) None
          else {
            val sr = fmt.getSampleRate.toInt
            val frames = ais.getFrameLength
            val durationMs = if (sr > 0 && frames >= 0) frames * 1000L / sr else 0L
            val big = fmt.isBigEndian
            val buf = new Array[Byte](8192)
            var (sumSq, nSamples, zeroCross) = (0.0, 0L, 0L)
            var (peak, prev) = (0, 0)
            var read = ais.read(buf)
            while (read > 0) {
              var i = 0
              while (i + 1 < read) {
                val s =
                  if (big) (buf(i) << 8) | (buf(i + 1) & 0xff)
                  else (buf(i + 1) << 8) | (buf(i) & 0xff)
                sumSq += s.toDouble * s; nSamples += 1
                if (math.abs(s) > peak) peak = math.abs(s)
                if ((s > 0 && prev < 0) || (s < 0 && prev > 0)) zeroCross += 1
                prev = s
                i += 2
              }
              read = ais.read(buf)
            }
            if (nSamples == 0) None
            else {
              val rms = math.sqrt(sumSq / nSamples) / 32768.0
              val zcr = zeroCross.toDouble / nSamples
              Some(Decoded(sr, durationMs, Array(
                rms.toFloat, (peak / 32768.0).toFloat, zcr.toFloat,
                math.min(0.999, sr / 192000.0).toFloat)))
            }
          }
        } finally ais.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException                               => None
      }

    /** 64-bit energy-delta fingerprint: Σ|sample| per 65 equal
      * windows (exact Long sums — |s| ≤ 2¹⁵ so even 2⁴⁸ samples per
      * window cannot overflow), bit i = window i+1 strictly louder
      * than window i. None for non-audio or < 65 samples.
      */
    def fingerprint(payload: Array[Byte]): Option[Long] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = ais.getFormat
          if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16) None
          else {
            val nSamples = ais.getFrameLength * fmt.getChannels
            if (nSamples < 65) None
            else {
              val big = fmt.isBigEndian
              val energy = new Array[Long](65)
              val buf = new Array[Byte](8192)
              var idx = 0L
              var read = ais.read(buf)
              while (read > 0) {
                var i = 0
                while (i + 1 < read) {
                  val s =
                    if (big) (buf(i) << 8) | (buf(i + 1) & 0xff)
                    else (buf(i + 1) << 8) | (buf(i) & 0xff)
                  // window index by exact integer scaling — the same
                  // partition every engine/locale would compute
                  val w = ((idx * 65) / nSamples).toInt
                  if (w < 65) energy(w) += math.abs(s)
                  idx += 1
                  i += 2
                }
                read = ais.read(buf)
              }
              var h = 0L
              var b = 0
              while (b < 64) {
                if (energy(b + 1) > energy(b)) h |= (1L << b)
                b += 1
              }
              Some(h)
            }
          }
        } finally ais.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException                               => None
      }
  }

  /** ======================= REAL VIDEO CODEC =======================
    * Actual video container parsing for AVI (RIFF) with MJPEG frames —
    * pure JDK: the RIFF/LIST chunk walk is ~60 lines of byte
    * arithmetic, and each '00dc'/'00db' frame chunk is a JFIF JPEG that
    * `javax.imageio` decodes like any other image. Returns None when
    * the payload is not a parseable AVI, falling back to [[StubCodec]]
    * exactly like the image and audio codecs.
    *
    * Decoded properties: true width/height/frame count from the `avih`
    * header, duration from dwMicroSecPerFrame × frames. Features
    * (FeatureDim floats in [0,1)): first-frame mean luma, last-frame
    * mean luma, |Δluma| between them (a motion proxy), and normalized
    * fps (/120). Only the FIRST and LAST frames are decoded — sampled
    * features, O(1) decode work per payload regardless of length; the
    * full per-frame path is [[videoFrames]].
    */
  object VideoCodec {
    final case class Decoded(
        width: Int, height: Int, nFrames: Int, durationMs: Long,
        features: Array[Float])
    final case class FrameRef(offset: Int, length: Int)

    private def le32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    private def fourCc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    /** RIFF walk: returns (avih header bytes, frame chunk refs), or
      * None if the payload is not an AVI. Bounds-checked throughout —
      * a truncated or hostile payload returns None, never throws.
      */
    private def parseRiff(b: Array[Byte]): Option[(Array[Byte], Seq[FrameRef])] = {
      if (b.length < 12 || fourCc(b, 0) != "RIFF" || fourCc(b, 8) != "AVI ")
        return None
      var avih: Option[Array[Byte]] = None
      val frames = scala.collection.mutable.ArrayBuffer.empty[FrameRef]
      def walk(start: Int, end: Int): Unit = {
        var off = start
        while (off + 8 <= end) {
          val id = fourCc(b, off)
          val size = le32(b, off + 4).toInt
          val dataStart = off + 8
          if (size < 0 || dataStart + size > end) return // truncated
          if (id == "LIST" && size >= 4) {
            walk(dataStart + 4, dataStart + size) // descend past subtype
          } else if (id == "avih" && size >= 40) {
            avih = Some(java.util.Arrays.copyOfRange(b, dataStart, dataStart + 40))
          } else if (id.endsWith("dc") || id.endsWith("db")) {
            frames += FrameRef(dataStart, size)
          }
          off = dataStart + size + (size & 1) // chunks pad to even
        }
      }
      walk(12, b.length)
      avih.map(h => (h, frames.toSeq))
    }

    private def lumaMean(img: java.awt.image.BufferedImage): Double = {
      val (r, g, bl) = ImageCodec.rgbSums(img) // row-bulk, see ImageCodec
      val n = img.getWidth.toLong * img.getHeight
      (0.299 * r + 0.587 * g + 0.114 * bl) / n / 256.0
    }

    private def decodeFrame(b: Array[Byte], f: FrameRef): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        b, f.offset, f.length)))
      catch { case _: java.io.IOException => None }

    def decode(payload: Array[Byte]): Option[Decoded] =
      parseRiff(payload).flatMap { case (avih, frames) =>
        if (frames.isEmpty) None
        else {
          val usPerFrame = le32(avih, 0)
          val w = le32(avih, 32).toInt
          val h = le32(avih, 36).toInt
          val n = frames.size
          val durationMs = usPerFrame * n / 1000L
          val fps = if (usPerFrame > 0) 1e6 / usPerFrame else 0.0
          for {
            first <- decodeFrame(payload, frames.head)
            last <- decodeFrame(payload, frames.last)
          } yield {
            val (l0, l1) = (lumaMean(first), lumaMean(last))
            Decoded(w, h, n, durationMs, Array(
              l0.toFloat, l1.toFloat, math.abs(l1 - l0).toFloat,
              math.min(0.999, fps / 120.0).toFloat))
          }
        }
      }

    /** All frames decoded: (idx, width, height, md5, mean luma) per
      * frame — the executor-side body of [[videoFrames]].
      */
    def decodeAllFrames(payload: Array[Byte]): Seq[(Int, Int, Int, String, Double)] =
      parseRiff(payload).toSeq.flatMap { case (_, frames) =>
        frames.zipWithIndex.flatMap { case (f, i) =>
          decodeFrame(payload, f).map { img =>
            val bytes = java.util.Arrays.copyOfRange(payload, f.offset, f.offset + f.length)
            (i, img.getWidth, img.getHeight, StubCodec.md5hex(bytes), lumaMean(img))
          }
        }
      }
  }

  /** ======================= STUB CODEC =======================
    * Stands in for a real image/audio/video codec. Deterministic:
    * features are md5-derived from the payload bytes. Replace `decode`
    * with a real library call to productionize; everything downstream
    * (schema, batching, partitioning) stays as-is.
    */
  object StubCodec {
    val FeatureDim = 4
    def md5hex(bytes: Array[Byte]): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(bytes).map("%02x".format(_)).mkString
    }
    /** STUB decode: payload → FeatureDim floats in [0,1). */
    def decode(payload: Array[Byte]): Array[Float] =
      (0 until FeatureDim).map { j =>
        val h = md5hex((new String(payload, "UTF-8") + "|" + j).getBytes("UTF-8"))
        (java.lang.Long.parseLong(h.substring(0, 8), 16).toDouble / 4294967296.0).toFloat
      }.toArray
  }

  /** Media catalog over documents: text payloads stand in for encoded
    * media (opaque bytes); kind and dimensions are deterministic
    * functions of the id. Column-pruning note: `meta` is a nested
    * struct so pipelines that only need metadata never touch `payload`.
    */
  def mediaCatalog(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
        (pmod(col("doc_id"), lit(1280)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(720)) + 1).cast("int").as("height"),
        (pmod(col("doc_id"), lit(3)) * 16000 + 8000).cast("int").as("sample_rate")).as("meta"))

  /** Feature extraction as codegen'd Catalyst expressions (oracle-able
    * twin of the typed [[decodePipeline]]): feature j = first 8 hex
    * digits of md5(payload ‖ '|' ‖ j) / 2³².
    */
  def extractFeatures(catalog: DataFrame): DataFrame = {
    def feat(j: Int): Column =
      (conv(substring(md5(concat(col("payload"),
        lit(s"|$j").cast("binary"))), 1, 8), 16, 10).cast("long").cast("double")
        / lit(4294967296.0)).as(s"f$j")
    val fs = (0 until StubCodec.FeatureDim).map(feat)
    catalog.select(
      col("media_id") +: col("kind") +: col("meta.n_bytes").as("n_bytes") +: fs: _*)
  }

  /** The typed per-partition decode pipeline — the Scala analog of a
    * batched decode UDF: one codec instance per partition, rows
    * streamed through it, typed output. Payloads that are REAL images
    * decode through [[ImageCodec]] (true width/height, pixel-mean
    * features); real audio streams decode through [[AudioCodec]]
    * (true sample rate/duration, RMS/peak/ZCR features); everything
    * real AVI/MJPEG containers decode through [[VideoCodec]] (true
    * dimensions, frame count, duration, luma/motion features);
    * everything else falls back to the deterministic [[StubCodec]],
    * whose equality with [[extractFeatures]] is asserted in the test
    * suite (the gate corpus carries text payloads, so the oracle path
    * is always the stub path).
    */
  def decodePipeline(catalog: DataFrame): Dataset[DecodedMedia] = {
    val spark = catalog.sparkSession
    import spark.implicits._
    catalog
      .select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup (real codecs amortize init here)
        it.map { case (id, kind, payload) =>
          val base = DecodedMedia(id, kind, payload.length.toLong,
            StubCodec.md5hex(payload), 0, 0, 0, 0L, 0, null)
          ImageCodec.decode(payload) match {
            case Some(img) =>
              base.copy(width = img.width, height = img.height, features = img.features)
            case None => AudioCodec.decode(payload) match {
              case Some(a) =>
                base.copy(sample_rate = a.sampleRate, duration_ms = a.durationMs,
                  features = a.features)
              case None => VideoCodec.decode(payload) match {
                case Some(v) =>
                  base.copy(width = v.width, height = v.height,
                    duration_ms = v.durationMs, n_frames = v.nFrames,
                    features = v.features)
                case None => base.copy(features = StubCodec.decode(payload))
              }
            }
          }
        }
      }
  }

  /** REAL per-frame extraction for AVI/MJPEG payloads: one output row
    * per decoded frame — (frame_idx, true dims, frame md5, mean luma).
    * Non-video payloads produce no rows. The typed twin of
    * [[frameSample]]'s byte-range sampling: same explode shape, frame
    * BYTES never leave the executor (checksum + scalars only), so at
    * scale nothing payload-sized shuffles.
    */
  def videoFrames(catalog: DataFrame): DataFrame = {
    val spark = catalog.sparkSession
    import spark.implicits._
    catalog
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        VideoCodec.decodeAllFrames(payload).map { case (i, w, h, md5, luma) =>
          (id, i.toLong, w, h, md5, luma)
        }
      }
      .toDF("media_id", "frame_idx", "width", "height", "frame_md5", "mean_luma")
  }

  /** Perceptual fingerprints for decodable image payloads: one
    * (media_id, dhash) row per real image ([[ImageCodec.dhash]] —
    * 64-bit difference hash over a 9×8 luma grid); non-image or
    * sub-grid payloads produce no row. Narrow typed flatMap — payload
    * bytes never leave the executor, only the 8-byte fingerprint.
    */
  def imageDHashes(catalog: DataFrame): DataFrame = {
    val spark = catalog.sparkSession
    import spark.implicits._
    catalog
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        (try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload)))
         catch { case _: java.io.IOException => None })
          .flatMap(ImageCodec.dhash)
          .map(h => (id, h))
      }
      .toDF("media_id", "dhash")
  }

  /** Image near-dup pairs — first-class IMAGE dedup: dHash
    * fingerprints fed through the same banded hamming machinery the
    * text simhash path uses (`Dedup.bandedFingerprintPairs`, 64-bit
    * form), so candidate generation is a banded bucket join over
    * DISTINCT fingerprint values — never an all-pairs comparison
    * (no-cartesian plan-asserted in MultimodalSpec). `maxHamming` ≈ 10
    * is the standard near-duplicate radius for dHash.
    */
  def imageNearDupPairs(catalog: DataFrame, maxHamming: Int = 10): DataFrame =
    Dedup.bandedFingerprintPairs(
      imageDHashes(catalog)
        .select(col("media_id").as("doc_id"), col("dhash").as("fp")),
      bits = 64, maxHamming = maxHamming)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"), col("hamming"))

  /** Perceptual fingerprints for decodable VIDEO payloads: a 64-bit
    * temporal luma-transition hash — the audio energy-delta idea
    * applied to the frame axis. The per-frame mean-luma sequence
    * (real MJPEG decode, [[VideoCodec.decodeAllFrames]]) is resampled
    * to 65 points by index interpolation, and bit i is set iff luma
    * RISES between consecutive points. Order-based, so uniform
    * brightness/gain changes preserve the fingerprint while a
    * re-edit (scene reorder, trim) flips transition bits. Videos with
    * fewer than 2 decodable frames produce no row.
    */
  def videoFingerprints(catalog: DataFrame): DataFrame = {
    val spark = catalog.sparkSession
    import spark.implicits._
    catalog
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val lumas = VideoCodec.decodeAllFrames(payload).map(_._5)
        if (lumas.size < 2) None
        else {
          val n = lumas.size
          def at(i: Int): Double = lumas((i.toLong * (n - 1) / 64).toInt)
          var fp = 0L
          var i = 0
          while (i < 64) {
            if (at(i + 1) > at(i)) fp |= (1L << i)
            i += 1
          }
          Some((id, fp))
        }
      }
      .toDF("media_id", "vfp")
  }

  /** Video near-dup pairs: the temporal fingerprints through the SAME
    * banded hamming machinery as text/image/audio — one decode pass +
    * one banded bucket join, completing the modality set.
    */
  def videoNearDupPairs(catalog: DataFrame, maxHamming: Int = 8): DataFrame =
    Dedup.bandedFingerprintPairs(
      videoFingerprints(catalog)
        .select(col("media_id").as("doc_id"), col("vfp").as("fp")),
      bits = 64, maxHamming = maxHamming)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"), col("hamming"))

  /** Perceptual fingerprints for decodable AUDIO payloads: a 64-bit
    * energy-delta hash (the dHash idea transposed to time) — the
    * sample stream is cut into 65 equal windows, each window's
    * Σ|sample| accumulates exactly in a Long, and bit i is set iff
    * window i+1 is strictly louder than window i. Gain-invariant by
    * construction (uniform scaling preserves the loudness ordering),
    * so the same recording at different volumes collides at hamming 0.
    * Non-audio / sub-65-sample payloads produce no row.
    */
  def audioFingerprints(catalog: DataFrame): DataFrame = {
    val spark = catalog.sparkSession
    import spark.implicits._
    catalog
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        AudioCodec.fingerprint(payload).map(h => (id, h))
      }
      .toDF("media_id", "afp")
  }

  /** Audio near-dup pairs: the energy-delta fingerprints fed through
    * the SAME banded hamming machinery as text simhash and image
    * dHash (`Dedup.bandedFingerprintPairs`) — candidate generation
    * is a banded bucket join over distinct fingerprint values, never
    * an all-pairs comparison. One fingerprint pass + one banded join:
    * the shape that dedups an audio corpus at 100 TB.
    */
  def audioNearDupPairs(catalog: DataFrame, maxHamming: Int = 8): DataFrame =
    Dedup.bandedFingerprintPairs(
      audioFingerprints(catalog)
        .select(col("media_id").as("doc_id"), col("afp").as("fp")),
      bits = 64, maxHamming = maxHamming)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"), col("hamming"))

  /** Frame sampling for video payloads: n equal byte-range "frames"
    * per payload (remainder dropped — sampling), exploded to one row
    * per frame with its checksum. The explode keeps frame bytes out of
    * the output (checksum only) — at scale the payload never shuffles.
    */
  def frameSample(catalog: DataFrame, numFrames: Int = 4): DataFrame = {
    val flen = (col("meta.n_bytes") / numFrames).cast("int")
    catalog
      .where(col("kind") === "video" && flen > 0)
      .select(col("media_id"), col("payload"), flen.as("flen"),
        explode(sequence(lit(0), lit(numFrames - 1))).as("frame_idx"))
      .select(
        col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(substring(col("payload"), col("frame_idx") * col("flen") + 1, col("flen")))
          .as("frame_md5"))
  }

  /** Resize stub: metadata transform (exact target dims) + payload
    * "re-encode" stub (truncation to the area-scaled byte budget).
    * Returns new metadata + checksum of the re-encoded payload.
    */
  def resizeStub(catalog: DataFrame, w: Int, h: Int): DataFrame = {
    val scale = (lit(w.toLong * h) / (col("meta.width").cast("long") * col("meta.height")))
    val newBytes = greatest(lit(1),
      least(col("meta.n_bytes"), ceil(col("meta.n_bytes") * scale))).cast("int")
    catalog
      .where(col("kind") === "image")
      .select(
        col("media_id"),
        lit(w).as("width"), lit(h).as("height"),
        newBytes.cast("long").as("n_bytes"),
        md5(substring(col("payload"), lit(1), newBytes)).as("checksum"))
  }

  // ---------------------------------------------------------------- gate

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_catalog" -> ((s, dir) =>
      mediaCatalog(table(s, dir, "documents"))
        .select(col("media_id"), col("kind"), col("meta.n_bytes").as("n_bytes"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.sample_rate").as("sample_rate"))
        .orderBy("media_id")),
    "mm_features" -> ((s, dir) =>
      extractFeatures(mediaCatalog(table(s, dir, "documents"))).orderBy("media_id")),
    "mm_frames" -> ((s, dir) =>
      frameSample(mediaCatalog(table(s, dir, "documents"))).orderBy("media_id", "frame_idx")),
  )

  private def hex8ToInt(expr: String): String =
    s"""list_sum(list_transform(range(1, 9),
       | i -> CAST((strpos('0123456789abcdef', substr($expr, i, 1)) - 1) AS BIGINT)
       |      * CAST(POWER(16, 8 - i) AS BIGINT)))""".stripMargin.replaceAll("\\s+", " ")

  def oracles: Map[String, String] = Map(
    "mm_catalog" ->
      """SELECT doc_id AS media_id,
        | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(doc_id % 1280 + 1 AS INT) AS width,
        | CAST(doc_id % 720 + 1 AS INT) AS height,
        | CAST((doc_id % 3) * 16000 + 8000 AS INT) AS sample_rate
        |FROM documents ORDER BY media_id""".stripMargin,
    "mm_features" ->
      s"""SELECT doc_id AS media_id,
         | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         | ${(0 until StubCodec.FeatureDim).map(j =>
             s"CAST(${hex8ToInt(s"md5(text || '|$j')")} AS DOUBLE) / 4294967296.0 AS f$j")
             .mkString(",\n ")}
         |FROM documents ORDER BY media_id""".stripMargin,
    "mm_frames" ->
      """WITH v AS (
        | SELECT doc_id AS media_id, text,
        |  CAST(octet_length(encode(text)) // 4 AS INT) AS flen
        | FROM documents WHERE doc_id % 3 = 2 AND octet_length(encode(text)) >= 4)
        |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        | md5(substr(text, frame_idx * flen + 1, flen)) AS frame_md5
        |FROM v, UNNEST(range(0, 4)) AS r(frame_idx)
        |ORDER BY media_id, frame_idx""".stripMargin,
  )
}
