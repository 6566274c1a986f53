package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def writeMedia(): String = {
    val dir = tmpDir("media")
    Files.write(Paths.get(dir, "a.bin"), Array.tabulate[Byte](1000)(i => (i % 251).toByte))
    Files.write(Paths.get(dir, "b.bin"), Array.tabulate[Byte](500)(i => (i % 7).toByte))
    dir
  }

  test("readBinaryDir: binary file source → media schema") {
    val df = Multimodal.readBinaryDir(spark, writeMedia(), "image")
    assert(df.count() === 2)
    assert(df.columns.toSeq === Seq("media_id", "path", "modality", "content", "meta"))
    val sizes = df.selectExpr("length(content)").collect().map(_.getInt(0)).sorted
    assert(sizes.toSeq === Seq(500, 1000))
  }

  test("extractFeatures: per-partition batch decode stub is deterministic") {
    val df = Multimodal.readBinaryDir(spark, writeMedia(), "image")
    val f1 = Multimodal.extractFeatures(df, dim = 16)
      .selectExpr("path", "features").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.extractFeatures(df, dim = 16)
      .selectExpr("path", "features").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(f1 === f2)
    assert(f1.values.forall(_.length === 16))
    assert(f1.keys.exists(_.endsWith("a.bin")))
  }

  test("features flow into ANN ops (plumbing compatibility)") {
    val df = Multimodal.readBinaryDir(spark, writeMedia(), "image")
    val feats = Multimodal.extractFeatures(df, dim = 8)
      .selectExpr("media_id as vec_id", "features as embedding")
    val pairs = Ann.cosineNearDupPairs(feats, "vec_id", "embedding", threshold = -1.0)
    assert(pairs.count() === 1) // one pair from two media files
  }

  // ---- real pure-JVM decoders -------------------------------------------

  /** PNG bytes: left half black, right half white. */
  private def halfToneImage(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Mono 16-bit PCM WAV: first half silent, second half a ±amp square
    * wave (RMS exactly amp).
    */
  private def halfToneWav(rate: Int, frames: Int, amp: Double): Array[Byte] = {
    val raw = new Array[Byte](frames * 2)
    for (i <- frames / 2 until frames) {
      val v = (if (i % 2 == 0) amp else -amp) * 32767.0
      val s = v.toInt.toShort
      raw(i * 2) = (s & 0xff).toByte        // little-endian
      raw(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def mediaFrame(name: String, bytes: Array[Byte], modality: String) = {
    val dir = tmpDir("real_media")
    Files.write(Paths.get(dir, name), bytes)
    Multimodal.readBinaryDir(spark, dir, modality)
  }

  test("decodeImages: real PNG decode — true dimensions, luminance features") {
    val out = Multimodal.decodeImages(mediaFrame("ht.png", halfToneImage(32, 16), "image"))
      .selectExpr("meta.width", "meta.height", "features").head()
    assert(out.getInt(0) === 32 && out.getInt(1) === 16)
    val f = out.getSeq[Float](2)
    assert(f.length === 64)
    // row-major 8×8 thumbnail: left 4 columns black, right 4 white
    for (ty <- 0 until 8) {
      for (tx <- 0 until 4) assert(f(ty * 8 + tx) < 0.05)
      for (tx <- 4 until 8) assert(f(ty * 8 + tx) > 0.95)
    }
  }

  test("decodeImages: undecodable bytes yield null features, no failure") {
    val out = Multimodal.decodeImages(mediaFrame("junk.png",
      Array.tabulate[Byte](100)(_.toByte), "image"))
    assert(out.count() === 1)
    assert(out.selectExpr("features").head().isNullAt(0))
  }

  test("decodeWav: real WAV decode — header meta, per-window RMS") {
    val rate = 8000
    val frames = 4096
    val out = Multimodal.decodeWav(
      mediaFrame("sq.wav", halfToneWav(rate, frames, amp = 0.5), "audio"),
      windows = 4)
      .selectExpr("meta.sample_rate", "meta.n_frames", "features").head()
    assert(out.getInt(0) === rate && out.getInt(1) === frames)
    val f = out.getSeq[Float](2)
    assert(f.length === 4)
    assert(f(0) < 0.01f && f(1) < 0.01f)          // silent half
    assert(f(2) > 0.49f && f(2) < 0.51f)          // square wave: RMS = amp
    assert(f(3) > 0.49f && f(3) < 0.51f)
  }

  /** Independent test-side IMA ADPCM ENCODER + RIFF writer (format tag
    * 0x11, mono) — reimplements the public reference algorithm rather
    * than calling anything in Multimodal, so decode(encode(x)) ≈ x is a
    * genuine differential check, not a mirror.
    */
  private def imaAdpcmWav(
      rate: Int, samples: Array[Double], blockAlign: Int = 256): Array[Byte] = {
    val stepTab = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
      34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
      157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
      598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
      1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
      5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
      15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
    val idxAdj = Array(-1, -1, -1, -1, 2, 4, 6, 8)
    val spb = (blockAlign - 4) * 2 + 1
    require(samples.length % spb == 0, "test fixture: whole blocks only")
    val s16 = samples.map(v =>
      math.max(-32768, math.min(32767, math.round(v * 32767).toInt)))
    val data = new java.io.ByteArrayOutputStream()
    var index = 0
    s16.grouped(spb).foreach { blk =>
      var pred = blk(0)
      data.write(pred & 0xff); data.write((pred >> 8) & 0xff)
      data.write(index); data.write(0)
      val codes = scala.collection.mutable.ArrayBuffer[Int]()
      blk.drop(1).foreach { s =>
        val st = stepTab(index)
        var diff = s - pred
        var code = 0
        if (diff < 0) { code = 8; diff = -diff }
        if (diff >= st) { code |= 4; diff -= st }
        if (diff >= (st >> 1)) { code |= 2; diff -= st >> 1 }
        if (diff >= (st >> 2)) code |= 1
        var d = st >> 3
        if ((code & 1) != 0) d += st >> 2
        if ((code & 2) != 0) d += st >> 1
        if ((code & 4) != 0) d += st
        pred = math.max(-32768, math.min(32767,
          if ((code & 8) != 0) pred - d else pred + d))
        index = math.max(0, math.min(88, index + idxAdj(code & 7)))
        codes += code
      }
      codes.grouped(2).foreach { g =>
        data.write((g.head & 0xf) |
          ((if (g.length > 1) g(1) else 0) << 4))
      }
    }
    val body = data.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    out.write("RIFF".getBytes); w32(4 + 8 + 20 + 8 + body.length)
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(20)
    w16(0x11); w16(1); w32(rate); w32(rate.toLong * blockAlign / spb)
    w16(blockAlign); w16(4); w16(2); w16(spb)
    out.write("data".getBytes); w32(body.length); out.write(body)
    out.toByteArray
  }

  test("decodeWav: IMA ADPCM (tag 0x11) — hand-rolled decode, round-trip fidelity") {
    val rate = 8000
    val spb = (256 - 4) * 2 + 1 // 505 samples per 256-byte block
    val n = spb * 2
    val amp = 0.5
    val sine = Array.tabulate(n)(i =>
      amp * math.sin(2 * math.Pi * 200.0 * i / rate))
    val out = Multimodal.decodeWav(
      mediaFrame("tone.wav", imaAdpcmWav(rate, sine), "audio"), windows = 2)
      .selectExpr("meta.sample_rate", "meta.n_frames", "features").head()
    assert(out.getInt(0) === rate)
    assert(out.getInt(1) === n)
    // a 200 Hz sine tracks through ADPCM almost losslessly: windowed RMS
    // must sit at amp/sqrt(2) within a few percent
    val f = out.getSeq[Float](2)
    val want = (amp / math.sqrt(2)).toFloat
    f.foreach(r => assert(math.abs(r - want) < 0.03f, s"RMS $r != $want"))
    // and the spectral front end hears the right pitch: centroid ≈ f/Nyquist
    val spec = Multimodal.spectralAudioFeatures(
      mediaFrame("tone2.wav", imaAdpcmWav(rate, sine), "audio"))
      .selectExpr("features").head().getSeq[Float](0)
    assert(math.abs(spec(0) - 200.0 / (rate / 2)) < 0.02, s"centroid ${spec(0)}")
  }

  test("decodeWav: G.711 u-law compressed audio transcodes and decodes") {
    val rate = 8000
    val frames = 4096
    // PCM16 square wave → JDK codec → ULAW wav bytes
    val pcmBytes = halfToneWav(rate, frames, amp = 0.5)
    val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(pcmBytes))
    val ulaw = javax.sound.sampled.AudioSystem.getAudioInputStream(
      javax.sound.sampled.AudioFormat.Encoding.ULAW, pcm)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ulaw,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val out = Multimodal.decodeWav(
      mediaFrame("sq_ulaw.wav", bos.toByteArray, "audio"), windows = 4)
      .selectExpr("meta.sample_rate", "meta.n_frames", "features").head()
    assert(out.getInt(0) === rate && out.getInt(1) === frames)
    val f = out.getSeq[Float](2)
    assert(f(0) < 0.01f && f(1) < 0.01f) // silent half
    // G.711 is lossy (~0.3% quantization at this level): loose tolerance
    assert(f(2) > 0.47f && f(2) < 0.53f)
    assert(f(3) > 0.47f && f(3) < 0.53f)
  }

  test("decoded image features flow into ANN ops (near-dup on real pixels)") {
    val dir = tmpDir("img_dup")
    Files.write(Paths.get(dir, "a.png"), halfToneImage(32, 16))
    Files.write(Paths.get(dir, "b.png"), halfToneImage(64, 32)) // same content, resized
    Files.write(Paths.get(dir, "c.png"), halfToneImage(16, 16).reverse.reverse) // distinct file, same pattern
    val feats = Multimodal.decodeImages(Multimodal.readBinaryDir(spark, dir, "image"))
      .selectExpr("media_id AS vec_id", "features AS embedding")
    val pairs = Ann.cosineNearDupPairs(feats, "vec_id", "embedding", threshold = 0.999)
    assert(pairs.count() === 3) // all three decode to the same thumbnail
  }

  test("resizeImages: real resample — decodable output, content preserved") {
    val out = Multimodal.resizeImages(
      mediaFrame("big.png", halfToneImage(64, 32), "image"), w = 8, h = 8)
      .selectExpr("content", "meta.width", "meta.height").head()
    assert(out.getInt(1) === 8 && out.getInt(2) === 8)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]](0)))
    assert(img.getWidth === 8 && img.getHeight === 8)
    // box resample of the half-tone: left 4 columns black, right 4 white
    for (y <- 0 until 8) {
      assert((img.getRGB(0, y) & 0xff) === 0)
      assert((img.getRGB(7, y) & 0xff) === 255)
    }
  }

  test("resizeImages: undecodable rows keep content, null meta") {
    val out = Multimodal.resizeImages(
      mediaFrame("junk2.png", Array.tabulate[Byte](64)(_.toByte), "image"), 8, 8)
      .selectExpr("length(content)", "meta").head()
    assert(out.getInt(0) === 64) // original bytes untouched
    assert(out.isNullAt(1))
  }

  test("resizeStub truncates content and stamps meta") {
    val df = Multimodal.readBinaryDir(spark, writeMedia(), "image")
    val out = Multimodal.resizeStub(df, targetBytes = 100, w = 10, h = 10)
    val r = out.selectExpr("length(content)", "meta.width").collect()
    assert(r.forall(_.getInt(0) === 100))
    assert(r.forall(_.getInt(1) === 10))
  }

  /** Y4M stream, C420: `nFrames` frames of `w`×`h`, frame i's Y plane a
    * constant `lumas(i)`, chroma planes zeroed.
    */
  private def y4mStream(w: Int, h: Int, lumas: Seq[Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII"))
    lumas.foreach { l =>
      bos.write("FRAME\n".getBytes("US-ASCII"))
      val y = new Array[Byte](w * h)
      java.util.Arrays.fill(y, l.toByte)
      bos.write(y)
      bos.write(new Array[Byte](w * h / 2)) // Cb + Cr at quarter size each
    }
    bos.toByteArray
  }

  test("decodeY4m: real Y4M decode — true dims, frame count, per-frame luma") {
    val lumas = Seq(0, 128, 255)
    val out = Multimodal.decodeY4m(
      mediaFrame("clip.y4m", y4mStream(16, 8, lumas), "video"),
      sampleFrames = 3, thumb = 2)
      .selectExpr("meta.width", "meta.height", "meta.n_frames", "features").head()
    assert(out.getInt(0) === 16 && out.getInt(1) === 8)
    assert(out.getInt(2) === 3)
    val f = out.getSeq[Float](3)
    assert(f.length === 3 * 2 * 2) // 3 sampled frames × 2×2 thumbnail
    // constant-luma frames: every thumbnail cell equals the frame's level
    for (c <- 0 until 4) assert(f(c) === 0.0f)
    for (c <- 4 until 8) assert(math.abs(f(c) - 128f / 255f) < 1e-4)
    for (c <- 8 until 12) assert(f(c) === 1.0f)
  }

  test("decodeY4m: sampling caps at sampleFrames, evenly spaced") {
    // 6 frames with distinct lumas; ask for 3 → frames 0, 2, 4
    val out = Multimodal.decodeY4m(
      mediaFrame("six.y4m", y4mStream(8, 8, Seq(10, 60, 110, 160, 210, 250)), "video"),
      sampleFrames = 3, thumb = 1)
      .selectExpr("meta.n_frames", "features").head()
    assert(out.getInt(0) === 6)
    val f = out.getSeq[Float](1)
    assert(f.length === 3)
    val expect = Seq(10, 110, 210).map(_ / 255.0f)
    f.zip(expect).foreach { case (got, e) => assert(math.abs(got - e) < 1e-4) }
  }

  test("decodeY4m: non-Y4M and truncated streams yield null, no failure") {
    val junk = mediaFrame("junk.y4m", Array.tabulate[Byte](64)(_.toByte), "video")
    assert(Multimodal.decodeY4m(junk).selectExpr("features").head().isNullAt(0))
    val truncated = y4mStream(16, 8, Seq(128)).dropRight(10)
    val t = mediaFrame("trunc.y4m", truncated, "video")
    assert(Multimodal.decodeY4m(t).selectExpr("features").head().isNullAt(0))
  }

  /** Animated GIF of solid gray frames via the JDK's GIF writer — a real
    * LZW-compressed multi-frame container, not a synthetic byte layout.
    */
  private def animatedGif(w: Int, h: Int, lumas: Seq[Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    lumas.foreach { l =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(l, l, l))
      g.fillRect(0, 0, w, h)
      g.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  test("decodeGif: real compressed video decode — frame count, per-frame luma") {
    val lumas = Seq(0, 128, 255)
    val out = Multimodal.decodeGif(
      mediaFrame("clip.gif", animatedGif(16, 8, lumas), "video"),
      sampleFrames = 3, thumb = 2)
      .selectExpr("meta.width", "meta.height", "meta.n_frames", "features").head()
    assert(out.getInt(0) === 16 && out.getInt(1) === 8)
    assert(out.getInt(2) === 3)
    val f = out.getSeq[Float](3)
    assert(f.length === 3 * 2 * 2) // 3 sampled frames × 2×2 thumbnail
    // full-canvas frames: each sample is its own frame's solid gray
    // (palette quantization tolerance)
    for (c <- 0 until 4) assert(f(c) < 0.02, s"frame0 cell $c = ${f(c)}")
    for (c <- 4 until 8) assert(math.abs(f(c) - 128f / 255f) < 0.02)
    for (c <- 8 until 12) assert(f(c) > 0.98)
  }

  test("decodeGif: six frames sampled to three, evenly spaced") {
    val out = Multimodal.decodeGif(
      mediaFrame("six.gif", animatedGif(8, 8, Seq(10, 60, 110, 160, 210, 250)), "video"),
      sampleFrames = 3, thumb = 1)
      .selectExpr("meta.n_frames", "features").head()
    assert(out.getInt(0) === 6)
    val f = out.getSeq[Float](1)
    assert(f.length === 3)
    val expect = Seq(10, 110, 210).map(_ / 255.0f)
    f.zip(expect).foreach { case (got, e) =>
      assert(math.abs(got - e) < 0.02, s"$got vs $e") }
  }

  /** MJPEG AVI of solid gray frames: a real RIFF container (LIST/chunk
    * layout with even-byte padding, avih main header) wrapping real
    * JPEG-encoded frames from the JDK's writer.
    */
  private def mjpegAvi(w: Int, h: Int, lumas: Seq[Int]): Array[Byte] = {
    def u32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ u32(data.length) ++ data ++ pad
    }
    def list(kind: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ children)
    val jpegs = lumas.map { l =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(l, l, l))
      g.fillRect(0, 0, w, h)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avih = chunk("avih", u32(40000) ++ u32(0) ++ u32(0) ++ u32(0) ++
      u32(jpegs.length) ++ u32(0) ++ u32(1) ++ u32(0) ++ u32(w) ++ u32(h) ++
      Array.fill[Byte](16)(0))
    val hdrl = list("hdrl", avih)
    val movi = list("movi", jpegs.map(j => chunk("00dc", j)).reduce(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ u32(body.length) ++ body
  }

  test("decodeMjpegAvi: real RIFF+JPEG decode — dims from avih, per-frame luma") {
    val lumas = Seq(20, 128, 235)
    val out = Multimodal.decodeMjpegAvi(
      mediaFrame("clip.avi", mjpegAvi(16, 8, lumas), "video"),
      sampleFrames = 3, thumb = 2)
      .selectExpr("meta.width", "meta.height", "meta.n_frames", "features").head()
    assert(out.getInt(0) === 16 && out.getInt(1) === 8)
    assert(out.getInt(2) === 3)
    val f = out.getSeq[Float](3)
    assert(f.length === 3 * 2 * 2)
    // solid gray survives JPEG near-exactly; generous lossy tolerance
    lumas.zipWithIndex.foreach { case (l, i) =>
      for (c <- 0 until 4)
        assert(math.abs(f(i * 4 + c) - l / 255.0f) < 0.03,
          s"frame $i cell $c: ${f(i * 4 + c)} vs ${l / 255.0f}")
    }
  }

  test("decodeMjpegAvi: corrupt and truncated inputs clear meta and features") {
    val junk = mediaFrame("junk.avi", Array.tabulate[Byte](64)(_.toByte), "video")
    val j = Multimodal.decodeMjpegAvi(junk).select("meta", "features").head()
    assert(j.isNullAt(0) && j.isNullAt(1))
    val whole = mjpegAvi(8, 8, Seq(40, 200))
    val cut = mediaFrame("cut.avi", whole.take(whole.length - 10), "video")
    val c = Multimodal.decodeMjpegAvi(cut).select("meta", "features").head()
    assert(c.isNullAt(0) && c.isNullAt(1))
  }

  /** Mono 16-bit PCM WAV holding a pure sine at `freq` Hz. */
  private def sineWav(rate: Int, frames: Int, freq: Double, amp: Double = 0.8): Array[Byte] = {
    val raw = new Array[Byte](frames * 2)
    for (i <- 0 until frames) {
      val s = (amp * math.sin(2.0 * math.Pi * freq * i / rate) * 32767.0).toInt.toShort
      raw(i * 2) = (s & 0xff).toByte // little-endian
      raw(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("spectralAudioFeatures: pure tone lands at its frequency") {
    val rate = 8000 // Nyquist 4000; 1000 Hz → bin 128 of a 1024-pt FFT
    val out = Multimodal.spectralAudioFeatures(
      mediaFrame("tone.wav", sineWav(rate, 8192, freq = 1000.0), "audio"),
      bands = 16, fftSize = 1024)
      .selectExpr("meta.sample_rate", "meta.n_frames", "features").head()
    assert(out.getInt(0) === rate && out.getInt(1) === 8192)
    val f = out.getSeq[Float](2)
    assert(f.length === 2 + 16)
    // centroid and rolloff of a pure tone ≈ f/Nyquist = 0.25
    assert(math.abs(f(0) - 0.25f) < 0.02, s"centroid ${f(0)}")
    assert(math.abs(f(1) - 0.25f) < 0.03, s"rolloff ${f(1)}")
    // the hottest log-spaced band is the one holding bin 128:
    // 512^(12/16) = 107 ≤ 128 < 158 = 512^(13/16) → band 12
    val bandEnergies = f.drop(2)
    assert(bandEnergies.indexOf(bandEnergies.max) === 12,
      s"band energies ${bandEnergies.mkString(",")}")
  }

  test("spectralAudioFeatures: centroid orders tones by frequency") {
    val rate = 8000
    def centroid(freq: Double): Float =
      Multimodal.spectralAudioFeatures(
        mediaFrame(s"tone_${freq.toInt}.wav", sineWav(rate, 8192, freq), "audio"))
        .selectExpr("features[0]").head().getFloat(0)
    val low = centroid(500.0)
    val high = centroid(2000.0)
    assert(low < high, s"low=$low high=$high")
    assert(math.abs(high - 0.5f) < 0.02, s"2 kHz at 8 kHz rate → 0.5, got $high")
  }

  test("spectralAudioFeatures: undecodable bytes clear meta and features") {
    val junk = mediaFrame("junk.wav", Array.tabulate[Byte](64)(_.toByte), "audio")
      .withColumn("meta", org.apache.spark.sql.functions.expr(
        "if(content is not null, named_struct('width', 9, 'height', 9, " +
          "'sample_rate', cast(null as int), 'n_frames', cast(null as int)), null)"))
    val out = Multimodal.spectralAudioFeatures(junk).selectExpr("meta", "features").head()
    assert(out.isNullAt(0), "stale meta survived a failed decode")
    assert(out.isNullAt(1))
  }

  test("decodeGif: corrupt input clears stale meta and yields null features") {
    val junk = mediaFrame("junk.gif", Array.tabulate[Byte](80)(_.toByte), "video")
      // plant an upstream meta: a failed decode must CLEAR it, not keep it
      // (if() keeps the column nullable despite the literal struct)
      .withColumn("meta", org.apache.spark.sql.functions.expr(
        "if(content is not null, named_struct('width', 9, 'height', 9, " +
          "'sample_rate', cast(null as int), 'n_frames', cast(null as int)), null)"))
    val out = Multimodal.decodeGif(junk).selectExpr("meta", "features").head()
    assert(out.isNullAt(0), "stale meta survived a failed decode")
    assert(out.isNullAt(1))
  }

  /** Synthetic MPEG-1 Layer III stream: valid 4-byte headers chained at
    * their computed frame lengths, junk payloads (header walking needs no
    * audio data). 128 kbps, 44100 Hz, no padding → 417-byte frames.
    */
  private def fakeMp3(nFrames: Int, id3Size: Int = 0): Array[Byte] = {
    val frameLen = 144 * 128000 / 44100 // 417
    val out = new java.io.ByteArrayOutputStream()
    if (id3Size > 0) {
      out.write(Array[Byte]('I', 'D', '3', 3, 0, 0))
      out.write(Array[Byte](((id3Size >> 21) & 0x7f).toByte,
        ((id3Size >> 14) & 0x7f).toByte, ((id3Size >> 7) & 0x7f).toByte,
        (id3Size & 0x7f).toByte))
      out.write(new Array[Byte](id3Size)) // tag body
    }
    for (i <- 0 until nFrames) {
      // FF FB 90 00: sync, MPEG1 Layer III no-CRC, bitrate idx 9 (128k),
      // rate idx 0 (44100), no padding
      out.write(Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00))
      val payload = Array.tabulate[Byte](frameLen - 4)(j => ((i * 31 + j) % 251).toByte)
      out.write(payload)
    }
    out.toByteArray
  }

  test("mp3Metadata: frame-header walk — sample rate, frame count, ID3v2 skip") {
    val plain = mediaFrame("a.mp3", fakeMp3(10), "audio")
    val m1 = Multimodal.mp3Metadata(plain).select("meta").head().getStruct(0)
    assert(m1.getInt(2) === 44100 && m1.getInt(3) === 10)
    val tagged = mediaFrame("b.mp3", fakeMp3(7, id3Size = 2048), "audio")
    val m2 = Multimodal.mp3Metadata(tagged).select("meta").head().getStruct(0)
    assert(m2.getInt(2) === 44100 && m2.getInt(3) === 7)
  }

  test("mp3Metadata: truncated final frame still counts; junk never false-syncs") {
    val cut = fakeMp3(5).dropRight(100) // final frame loses its tail
    val m = Multimodal.mp3Metadata(mediaFrame("c.mp3", cut, "audio"))
      .select("meta").head().getStruct(0)
    assert(m.getInt(3) === 5)
    // bytes full of 0xFF syncs but no valid chain of Mp3MinFrames frames
    val junk = Array.tabulate[Byte](4096)(i => if (i % 3 == 0) 0xff.toByte else 0x42)
    val out = Multimodal.mp3Metadata(
      mediaFrame("d.mp3", junk, "audio")
        .withColumn("meta", org.apache.spark.sql.functions.expr(
          "named_struct('width', 9, 'height', 9, 'sample_rate', cast(null as int), " +
            "'n_frames', cast(null as int))"))).select("meta").head()
    assert(out.isNullAt(0), "stale meta survived an unparseable payload")
  }
}
