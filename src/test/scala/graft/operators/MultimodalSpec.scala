package graft.operators

import graft.{GraftSession, SparkSpec}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def catalog = Multimodal.mediaCatalog(
    GraftSession.table(spark, Sf0001, "documents"))

  test("catalog: payload is binary, metadata typed, no payload needed for metadata query") {
    val c = catalog
    assert(c.schema("payload").dataType.typeName == "binary")
    val meta = c.select("media_id", "kind", "meta.n_bytes")
    assert(meta.count() == 500)
    // metadata-only read must not scan the payload column
    val plan = meta.queryExecution.optimizedPlan.toString
    assert(!plan.contains("payload") || meta.columns.forall(_ != "payload"))
  }

  test("typed decode pipeline agrees with the expression twin") {
    val viaExpr = Multimodal.extractFeatures(catalog)
      .select("media_id", "f0", "f1", "f2", "f3")
      .collect().map(r => r.getLong(0) ->
        (0 until 4).map(i => r.getDouble(i + 1)).toVector).toMap
    val viaTyped = Multimodal.decodePipeline(catalog)
      .collect().map(d => d.media_id -> d.features.toVector).toMap
    assert(viaExpr.keySet == viaTyped.keySet)
    viaExpr.foreach { case (id, fe) =>
      val ft = viaTyped(id)
      fe.zip(ft).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-6, s"media $id: $a vs $b")
      }
    }
  }

  test("decode pipeline checksum matches md5 of payload") {
    val d = Multimodal.decodePipeline(catalog).head()
    assert(d.checksum.matches("[0-9a-f]{32}"))
    assert(d.features.length == Multimodal.StubCodec.FeatureDim)
    assert(d.features.forall(f => f >= 0f && f < 1f))
  }

  test("real PNG payloads decode to true dimensions and pixel means; non-images fall back to the stub") {
    import spark.implicits._
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val red = png(8, 6, 0xff0000)
    val blue = png(3, 5, 0x0000ff)
    val text = "not an image at all".getBytes("UTF-8")
    val cat = Seq((1L, "image", red), (2L, "image", blue), (3L, "audio", text))
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.decodePipeline(cat).collect().map(d => d.media_id -> d).toMap
    // real decoded dimensions and channel means
    assert(out(1L).width == 8 && out(1L).height == 6)
    assert(out(1L).features(0) > 0.99f && out(1L).features(1) == 0f && out(1L).features(2) == 0f)
    assert(out(2L).width == 3 && out(2L).height == 5 && out(2L).features(2) > 0.99f)
    // real decode output is NOT what the stub would fabricate
    assert(out(1L).features.toSeq != Multimodal.StubCodec.decode(red).toSeq)
    // non-image: no dims, exact stub features (the oracle-able path)
    assert(out(3L).width == 0 && out(3L).height == 0)
    assert(out(3L).features.toSeq == Multimodal.StubCodec.decode(text).toSeq)
  }

  test("image near-dup pairs: re-encode and small edit within radius, unrelated image outside, no cartesian") {
    import spark.implicits._
    def mkPng(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) img.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // structured gradient (dhash needs luma structure, not a flat fill)
    val grad = (x: Int, y: Int) => ((x * 4) << 16) | ((y * 4) << 8) | ((x + y) * 2)
    val base = mkPng(grad)
    val copy = mkPng(grad) // identical content, fresh encode
    val edited = mkPng((x, y) => // small 8x8 patch whited out — flips the
      // local gradient direction, so a few dhash bits move (a blanked
      // patch would NOT: darkening an already-dark corner preserves
      // every adjacent-column comparison on a monotone gradient)
      if (x < 8 && y < 8) 0xffffff else grad(x, y))
    val other = mkPng((x, y) => // reversed gradient — unrelated
      ((255 - x * 4) << 16) | ((255 - y * 4) << 8) | (255 - (x + y) * 2))
    val tiny = mkPng(grad).take(10) // truncated: not decodable, no row
    val cat = Seq((1L, base), (2L, copy), (3L, edited), (4L, other), (5L, tiny))
      .toDF("media_id", "payload")
    val hashes = Multimodal.imageDHashes(cat).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L, 4L)) // truncated payload dropped
    assert(hashes(1L) == hashes(2L)) // deterministic: same pixels, same hash
    val pairs = Multimodal.imageNearDupPairs(cat, maxHamming = 10)
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.contains((1L, 2L)) && got((1L, 2L)) == 0L)
    assert(got.contains((1L, 3L)) && got((1L, 3L)) > 0L) // edit: near, not equal
    assert(!got.keySet.exists { case (a, b) => a == 4L || b == 4L },
      s"unrelated image paired: $got")
    // banded bucket join only — never an all-pairs comparison
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan.take(800))
  }

  test("banded fingerprint pairs find neighbors across the sign bit (shift+mask, not remainder)") {
    import spark.implicits._
    // fpA has bit 63 set; fpC differs from fpA ONLY in bit 63 — hamming 1.
    // A remainder-based band value would sign-flip every band of fpA and
    // miss the agreement pigeonhole guarantees on the other bands.
    val fpA = 0x8000000000000001L
    val fpC = 0x0000000000000001L
    val fpB = 0x8000000000000003L // differs from fpA in bit 1 — hamming 1
    val fp = Seq((1L, fpA), (2L, fpB), (3L, fpC)).toDF("doc_id", "fp")
    val got = Dedup.bandedFingerprintPairs(fp, bits = 64, maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 2L)) == 1L)
    assert(got((1L, 3L)) == 1L, s"sign-boundary neighbor missed: $got")
    assert(!got.contains((2L, 3L))) // hamming 2 — outside the radius
  }

  test("real WAV payloads decode to true sample rate, duration and signal features; non-audio falls back to the stub") {
    import spark.implicits._
    import javax.sound.sampled._
    // 16-bit mono PCM WAV: a 440 Hz sine at full scale, plus silence
    def wav(sampleRate: Int, seconds: Double, amplitude: Double, freqHz: Double): Array[Byte] = {
      val n = (sampleRate * seconds).toInt
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val s = (amplitude * 32767 * math.sin(2 * math.Pi * freqHz * i / sampleRate)).toInt
        pcm(2 * i) = (s & 0xff).toByte          // little-endian
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val sine = wav(16000, 0.5, 0.8, 440)     // 8000 frames, 500 ms
    val silence = wav(8000, 0.25, 0.0, 440)  // all-zero samples
    val text = "definitely not audio".getBytes("UTF-8")
    val cat = Seq((1L, "audio", sine), (2L, "audio", silence), (3L, "video", text))
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.decodePipeline(cat).collect().map(d => d.media_id -> d).toMap

    // true stream properties
    assert(out(1L).sample_rate == 16000 && out(1L).duration_ms == 500)
    assert(out(2L).sample_rate == 8000 && out(2L).duration_ms == 250)
    // signal features: full-scale sine RMS ≈ 0.8/√2, peak ≈ 0.8, ZCR ≈ 2f/sr
    assert(math.abs(out(1L).features(0) - 0.8 / math.sqrt(2)) < 0.01)
    assert(math.abs(out(1L).features(1) - 0.8) < 0.01)
    assert(math.abs(out(1L).features(2) - 2.0 * 440 / 16000) < 0.01)
    assert(out(2L).features(0) == 0f && out(2L).features(1) == 0f)
    // real decode output is NOT what the stub would fabricate
    assert(out(1L).features.toSeq != Multimodal.StubCodec.decode(sine).toSeq)
    // non-audio: no stream properties, exact stub features (oracle path)
    assert(out(3L).sample_rate == 0 && out(3L).duration_ms == 0L)
    assert(out(3L).features.toSeq == Multimodal.StubCodec.decode(text).toSeq)
    // and audio payloads don't get image dims (nor vice versa)
    assert(out(1L).width == 0 && out(1L).height == 0)
  }

  // minimal MJPEG-in-AVI writer: RIFF('AVI ' LIST(hdrl avih) LIST(movi 00dc...))
  private def mjpegAvi(frames: Seq[java.awt.image.BufferedImage], usPerFrame: Int,
      w: Int, h: Int): Array[Byte] = {
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data ++ pad
    }
    def list(subtype: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", subtype.getBytes("US-ASCII") ++ body)
    val avih = new Array[Byte](40)
    System.arraycopy(le32(usPerFrame.toLong), 0, avih, 0, 4)   // dwMicroSecPerFrame
    System.arraycopy(le32(frames.size.toLong), 0, avih, 16, 4) // dwTotalFrames
    System.arraycopy(le32(w.toLong), 0, avih, 32, 4)           // dwWidth
    System.arraycopy(le32(h.toLong), 0, avih, 36, 4)           // dwHeight
    val jpegs = frames.map { img =>
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi", jpegs.map(chunk("00dc", _)).reduce(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }

  private def solidFrame(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  test("real AVI/MJPEG payloads decode to true dims, frame count, duration and luma features") {
    import spark.implicits._
    // 3 frames, 40 ms each: dark → dark → bright (motion from first to last)
    val avi = mjpegAvi(
      Seq(solidFrame(16, 12, 0x101010), solidFrame(16, 12, 0x101010),
        solidFrame(16, 12, 0xf0f0f0)),
      usPerFrame = 40000, w = 16, h = 12)
    val text = "not a video container".getBytes("UTF-8")
    val cat = Seq((1L, "video", avi), (2L, "video", text))
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.decodePipeline(cat).collect().map(d => d.media_id -> d).toMap
    // true container properties
    assert(out(1L).width == 16 && out(1L).height == 12)
    assert(out(1L).n_frames == 3 && out(1L).duration_ms == 120)
    // luma features: first frame dark, last bright, visible motion delta
    assert(out(1L).features(0) < 0.2f && out(1L).features(1) > 0.7f)
    assert(out(1L).features(2) > 0.5f)
    assert(math.abs(out(1L).features(3) - 25.0 / 120.0) < 0.01) // 25 fps
    // real decode output is NOT what the stub would fabricate
    assert(out(1L).features.toSeq != Multimodal.StubCodec.decode(avi).toSeq)
    // non-video: stub features, no container properties
    assert(out(2L).n_frames == 0 && out(2L).duration_ms == 0L)
    assert(out(2L).features.toSeq == Multimodal.StubCodec.decode(text).toSeq)
  }

  test("videoFrames explodes every real frame with true dims and luma; non-video yields nothing") {
    import spark.implicits._
    val avi = mjpegAvi(
      Seq(solidFrame(8, 8, 0x000000), solidFrame(8, 8, 0xffffff)),
      usPerFrame = 33333, w = 8, h = 8)
    val cat = Seq((1L, "video", avi),
      (2L, "video", "nope".getBytes("UTF-8"))).toDF("media_id", "kind", "payload")
    val rows = Multimodal.videoFrames(cat).orderBy("media_id", "frame_idx").collect()
    assert(rows.length == 2 && rows.forall(_.getLong(0) == 1L))
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 1L))
    assert(rows.forall(r => r.getInt(2) == 8 && r.getInt(3) == 8))
    assert(rows(0).getDouble(5) < 0.1 && rows(1).getDouble(5) > 0.9) // luma
    assert(rows.forall(_.getString(4).matches("[0-9a-f]{32}")))
  }

  test("frame sampling: 4 frames per video payload, stable checksums") {
    val f = Multimodal.frameSample(catalog)
    val perMedia = f.groupBy("media_id").count().collect()
    assert(perMedia.nonEmpty && perMedia.forall(_.getLong(1) == 4))
    // deterministic: two runs identical
    val a = f.collect().map(_.toSeq).toSet
    val b = Multimodal.frameSample(catalog).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("resize stub: target dims exact, byte budget scales with area") {
    val r = Multimodal.resizeStub(catalog, 64, 64)
    val rows = r.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(x => x.getInt(1) == 64 && x.getInt(2) == 64))
    assert(rows.forall(_.getLong(3) >= 1))
  }

  test("audio near-dup: gain-invariant fingerprint pairs the same recording at different volumes") {
    import spark.implicits._
    import javax.sound.sampled._
    // amplitude-ramped sine: window energies strictly ordered, so the
    // energy-delta fingerprint is stable under uniform gain but flips
    // completely when the envelope direction reverses
    def rampWav(gain: Double, up: Boolean): Array[Byte] = {
      val n = 13000
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val pos = if (up) i else n - 1 - i
        val s = (gain * pos / n * 32767 *
          math.sin(2 * math.Pi * 440 * i / 16000.0)).toInt
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(16000f, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val cat = Seq(
      (1L, rampWav(0.9, up = true)),
      (2L, rampWav(0.3, up = true)),   // same recording, -9.5 dB
      (3L, rampWav(0.9, up = false)),  // reversed envelope — unrelated
      (4L, "not audio at all".getBytes("UTF-8"))
    ).toDF("media_id", "payload")
    val fps = Multimodal.audioFingerprints(cat).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps.keySet == Set(1L, 2L, 3L)) // non-audio payload dropped
    assert(fps(1L) == fps(2L), "gain change must not move the fingerprint")
    assert(fps(1L) != fps(3L))
    val pairs = Multimodal.audioNearDupPairs(cat, maxHamming = 8)
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.contains((1L, 2L)) && got((1L, 2L)) == 0L, s"got $got")
    assert(!got.keySet.exists { case (a, b) => a == 3L || b == 3L },
      s"reversed-envelope audio paired: $got")
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      plan.take(800))
  }

  test("video near-dup: brightness-invariant luma-transition pairs; re-edit diverges") {
    import spark.implicits._
    // 9-frame monotone brightness ramp: every transition rises, so the
    // fingerprint survives a uniform brightness lift while reversing
    // the frame order (a re-edit) turns every rise into a fall
    def stair(levels: Seq[Int]): Array[Byte] =
      mjpegAvi(levels.map(l => solidFrame(16, 12, (l << 16) | (l << 8) | l)),
        usPerFrame = 40000, w = 16, h = 12)
    val levels = Seq(40, 60, 80, 100, 120, 140, 160, 180, 200)
    val cat = Seq(
      (1L, stair(levels)),
      (2L, stair(levels.map(_ + 30))),   // brightness-lifted copy
      (3L, stair(levels.reverse)),       // re-edit: reversed order
      (4L, "not a video".getBytes("UTF-8"))
    ).toDF("media_id", "payload")
    val fps = Multimodal.videoFingerprints(cat).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps.keySet == Set(1L, 2L, 3L)) // non-video payload dropped
    assert(fps(1L) == fps(2L), "brightness lift must not move the fingerprint")
    assert(fps(1L) != fps(3L))
    val pairs = Multimodal.videoNearDupPairs(cat, maxHamming = 8)
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.contains((1L, 2L)) && got((1L, 2L)) == 0L, s"got $got")
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      plan.take(800))
  }
}
