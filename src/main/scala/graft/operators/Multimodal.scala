package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for training-data pipelines.
  *
  * Media travel as opaque `binary` columns + typed metadata; decode /
  * feature-extraction runs per-partition in batch (the Scala equivalent of
  * a `mapInPandas` iterator-of-batches UDF: one function call per
  * partition, amortizing any per-model/per-codec setup across rows, never
  * a per-row UDF).
  *
  * Decoders, by tier:
  *   - `decodeImages` / `decodeWav` / `decodeY4m` / `decodeGif` /
  *     `decodeMjpegAvi` — REAL pure-JVM decodes (javax.imageio and
  *     javax.sound.sampled ship with the JDK: PNG/BMP/GIF/JPEG, PCM WAV
  *     plus the G.711 μ-law/a-law compressed telephony codecs, plus a
  *     hand-rolled IMA/DVI ADPCM block decoder for WAV format tag 0x11 —
  *     the 4-bit game/telephony codec the JDK lacks;
  *     YUV4MPEG2 video is an uncompressed container parseable with no
  *     codec at all; animated GIF and MJPEG-in-AVI are REAL compressed
  *     video containers decoded frame-by-frame with the bundled GIF/JPEG
  *     readers), emitting true width/height/sample-rate/frame-count
  *     metadata and deterministic content features. A failed decode
  *     nulls BOTH meta and features — no stale upstream meta survives a
  *     row this decoder could not read.
  *   - `spectralAudioFeatures` — REAL perceptual-audio front end (Hann
  *     + radix-2 FFT power spectrum → centroid/rolloff/log-band
  *     energies) over every encoding the JVM decodes.
  *   - `mp3Metadata` — REAL MPEG frame-header walk (rate + frame count,
  *     ID3v2-aware); MP3 PCM decode itself stays stubbed.
  *   - `extractFeatures` / `resizeStub` — DETERMINISTIC STUBS marked
  *     `STUB:` for the modalities that need codecs absent from a bare JVM
  *     (interframe-coded video like H.26x, perceptual-codec PCM like
  *     MP3/AAC). They keep the exact plan shape (narrow per-partition
  *     map, no shuffle); swapping in a real JNI/Java decoder changes only
  *     the function body.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("path", StringType, nullable = true),
    StructField("modality", StringType, nullable = true), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  /** Ingest a directory of files as (path, modificationTime, length,
    * content) via Spark's binary file source, then shape to `mediaSchema`.
    */
  def readBinaryDir(spark: SparkSession, dir: String, modality: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        col("path"),
        lit(modality).as("modality"),
        col("content"),
        lit(null).cast(mediaSchema("meta").dataType).as("meta"))

  /** REAL image decode via `javax.imageio.ImageIO` (PNG/BMP/GIF/JPEG —
    * readers bundled with the JDK, no external codecs): stamps
    * meta.width/height from the decoded raster and extracts a
    * `thumb`×`thumb` grayscale thumbnail as the feature vector
    * (block-mean luminance, row-major, in [0,1] — deterministic
    * arithmetic, no platform-dependent resampler). Per-partition iterator
    * shape: reader lookup and scratch buffers amortize across the batch.
    * Rows whose bytes no bundled reader accepts get null meta AND null
    * features (incoming meta is cleared — a failed decode leaves no stale
    * claims) instead of failing the partition.
    */
  def decodeImages(df: DataFrame, thumb: Int = 8): DataFrame = {
    // meta forced nullable: the failure contract (null meta + features)
    // must hold even when the incoming frame declared meta non-null
    val outSchema = StructType(df.schema.fields
      .map(f => if (f.name == "meta") f.copy(nullable = true) else f) :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true))
    val contentIdx = df.schema.fieldIndex("content")
    val metaIdx = df.schema.fieldIndex("meta")
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(contentIdx).asInstanceOf[Array[Byte]]
        val img =
          if (bytes == null) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null } // corrupt payload
        if (img == null) Row.fromSeq(r.toSeq.updated(metaIdx, null) :+ null)
        else {
          val meta = Row(img.getWidth, img.getHeight, null, null)
          Row.fromSeq(r.toSeq.updated(metaIdx, meta) :+
            lumaThumb(img, thumb).toSeq)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** `thumb`×`thumb` block-mean luminance (Rec.601 weights) thumbnail of
    * an image, row-major, in [0,1] — integer block bounds, left-to-right
    * double accumulation: deterministic on every JVM, no
    * platform-dependent resampler. Shared by the image, GIF-video, and
    * resize paths.
    */
  private def lumaThumb(img: java.awt.image.BufferedImage, thumb: Int): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val feats = new Array[Float](thumb * thumb)
    var ty = 0
    while (ty < thumb) {
      val y0 = ty * h / thumb
      val y1 = math.max((ty + 1) * h / thumb, y0 + 1)
      var tx = 0
      while (tx < thumb) {
        val x0 = tx * w / thumb
        val x1 = math.max((tx + 1) * w / thumb, x0 + 1)
        var s = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            s += 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        feats(ty * thumb + tx) = (s / ((y1 - y0) * (x1 - x0)) / 255.0).toFloat
        tx += 1
      }
      ty += 1
    }
    feats
  }

  /** REAL WAV decode via `javax.sound.sampled.AudioSystem` (the JDK's
    * built-in WAVE reader): stamps meta.sample_rate/n_frames from the
    * format header and extracts RMS amplitude (in [0,1]) over `windows`
    * equal time slices of the channel-mixed 16-bit PCM signal.
    * COMPRESSED telephony audio — G.711 μ-law/a-law, the encodings the
    * JDK ships codecs for — is transcoded to 16-bit PCM in-stream before
    * feature extraction. Rows in any other encoding get null meta and
    * null features (incoming meta is cleared).
    */
  def decodeWav(df: DataFrame, windows: Int = 16): DataFrame = {
    // meta forced nullable: the failure contract (null meta + features)
    // must hold even when the incoming frame declared meta non-null
    val outSchema = StructType(df.schema.fields
      .map(f => if (f.name == "meta") f.copy(nullable = true) else f) :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true))
    val contentIdx = df.schema.fieldIndex("content")
    val metaIdx = df.schema.fieldIndex("meta")
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(contentIdx).asInstanceOf[Array[Byte]]
        decodePcm(bytes) match {
          case Some((rate, mono)) =>
            val n = mono.length
            val feats = new Array[Float](windows)
            var wi = 0
            while (wi < windows) {
              val a = wi * n / windows
              val b = math.max((wi + 1) * n / windows, a + 1)
              var sq = 0.0
              var j = a
              while (j < math.min(b, n)) { sq += mono(j) * mono(j); j += 1 }
              feats(wi) = math.sqrt(sq / math.max(math.min(b, n) - a, 1)).toFloat
              wi += 1
            }
            val meta = Row(null, null, rate, n)
            Row.fromSeq(r.toSeq.updated(metaIdx, meta) :+ feats.toSeq)
          case None => Row.fromSeq(r.toSeq.updated(metaIdx, null) :+ null)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** REAL MP3 METADATA (no PCM decode — a bare JVM has no MP3 decoder;
    * this retires the metadata tier of the stub honestly): walks MPEG
    * audio frame headers from the public framing spec — skips an ID3v2
    * tag (syncsafe length), finds the first sync word, then chains
    * frames by their computed byte lengths (bitrate/sample-rate tables
    * per MPEG version + layer, padding bit). A sync match must chain at
    * least [[Mp3MinFrames]] consecutive valid frames to be accepted, so
    * arbitrary binary containing a stray 0xFFEx never parses. Stamps
    * meta.sample_rate (first frame's) and meta.n_frames (MPEG frames
    * walked; duration = n_frames × samples-per-frame / rate); anything
    * unparseable gets null meta (incoming meta cleared — same failure
    * contract as every decoder here). PCM decode itself remains a
    * labeled stub pending a vendored pure-JVM decoder. Per-partition
    * scan shape, no shuffle.
    */
  def mp3Metadata(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields
      .map(f => if (f.name == "meta") f.copy(nullable = true) else f))
    val contentIdx = df.schema.fieldIndex("content")
    val metaIdx = df.schema.fieldIndex("meta")
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(contentIdx).asInstanceOf[Array[Byte]]
        parseMp3Frames(bytes) match {
          case Some((rate, nFrames)) =>
            Row.fromSeq(r.toSeq.updated(metaIdx, Row(null, null, rate, nFrames)))
          case None => Row.fromSeq(r.toSeq.updated(metaIdx, null))
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Minimum consecutive valid frames for [[mp3Metadata]] to accept a
    * sync match — guards against false 0xFFEx syncs in arbitrary bytes.
    */
  val Mp3MinFrames = 3

  /** (sample rate, frame count) by walking MPEG audio frame headers;
    * None when no chain of [[Mp3MinFrames]] valid frames exists. Tables
    * and frame-length formulas are the public MPEG-1/2/2.5 Layer I-III
    * framing rules.
    */
  private[operators] def parseMp3Frames(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null || bytes.length < 4) return None
    var off = 0
    // ID3v2 header: "ID3" ver(2) flags(1) syncsafe-size(4)
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      off = math.min(10 + size, bytes.length)
    }
    // bitrate tables in kbps, index 1..14 (0 = free, 15 = bad)
    val brV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
    val brV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
    val brV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    val brV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
    val brV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
    val ratesV1 = Array(44100, 48000, 32000)
    val ratesV2 = Array(22050, 24000, 16000)
    val ratesV25 = Array(11025, 12000, 8000)
    // header → Some(frame length in bytes, sample rate); None = invalid
    def frame(o: Int): Option[(Int, Int)] = {
      if (o + 4 > bytes.length) return None
      val b1 = bytes(o) & 0xff; val b2 = bytes(o + 1) & 0xff
      val b3 = bytes(o + 2) & 0xff
      if (b1 != 0xff || (b2 & 0xe0) != 0xe0) return None
      val verBits = (b2 >> 3) & 0x3   // 0=MPEG2.5, 1=reserved, 2=MPEG2, 3=MPEG1
      val layerBits = (b2 >> 1) & 0x3 // 1=III, 2=II, 3=I
      val brIdx = (b3 >> 4) & 0xf
      val srIdx = (b3 >> 2) & 0x3
      val padding = (b3 >> 1) & 0x1
      if (verBits == 1 || layerBits == 0 || brIdx == 0 || brIdx == 15 || srIdx == 3)
        return None
      val v1 = verBits == 3
      val rate = (if (v1) ratesV1 else if (verBits == 2) ratesV2 else ratesV25)(srIdx)
      val kbps = (verBits, layerBits) match {
        case (3, 3) => brV1L1(brIdx)
        case (3, 2) => brV1L2(brIdx)
        case (3, 1) => brV1L3(brIdx)
        case (_, 3) => brV2L1(brIdx)
        case _      => brV2L23(brIdx)
      }
      val len =
        if (layerBits == 3) (12 * kbps * 1000 / rate + padding) * 4 // Layer I
        else if (layerBits == 1 && !v1) 72 * kbps * 1000 / rate + padding // V2/2.5 L3
        else 144 * kbps * 1000 / rate + padding // Layer II, V1 Layer III
      if (len < 4) None else Some((len, rate))
    }
    // count the chain from `o`; returns (frames, rate of first frame)
    def walk(o: Int): (Int, Int) = {
      var pos = o; var n = 0; var rate = 0
      var continue = true
      while (continue) frame(pos) match {
        case Some((len, r)) =>
          if (n == 0) rate = r
          n += 1; pos += len
          // a truncated FINAL frame still counts if its header fit
          if (pos > bytes.length) continue = false
        case None => continue = false
      }
      (n, rate)
    }
    // scan a bounded window for the first sync that chains Mp3MinFrames+
    var i = off
    val scanEnd = math.min(off + 65536, bytes.length - 4)
    while (i <= scanEnd) {
      if ((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xe0) == 0xe0) {
        val (n, rate) = walk(i)
        if (n >= Mp3MinFrames) return Some((rate, n))
      }
      i += 1
    }
    None
  }

  /** (sample rate, channel-mixed samples in [-1, 1]) from WAV/AIFF/AU
    * bytes via the JDK's audio readers; G.711 μ-law/a-law payloads are
    * transcoded to PCM16 in-stream first. None for undecodable bytes —
    * shared failure contract of `decodeWav`/`spectralAudioFeatures`.
    */
  private def decodePcm(bytes: Array[Byte]): Option[(Int, Array[Double])] = {
    import javax.sound.sampled.AudioFormat.Encoding
    if (bytes == null) return None
    try {
      val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      // G.711 compressed payloads: JDK codecs convert to PCM16
      val ais =
        if (raw.getFormat.getEncoding == Encoding.ULAW ||
          raw.getFormat.getEncoding == Encoding.ALAW)
          javax.sound.sampled.AudioSystem.getAudioInputStream(
            Encoding.PCM_SIGNED, raw)
        else raw
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) None
        else {
          val data = ais.readAllBytes()
          val ch = fmt.getChannels
          val n = data.length / (2 * ch)
          // channel-mixed samples, normalized to [-1, 1]
          val mono = new Array[Double](n)
          var i = 0
          while (i < n) {
            var s = 0.0
            var c = 0
            while (c < ch) {
              val o = (i * ch + c) * 2
              val v =
                if (fmt.isBigEndian) ((data(o) << 8) | (data(o + 1) & 0xff)).toShort
                else ((data(o + 1) << 8) | (data(o) & 0xff)).toShort
              s += v / 32768.0
              c += 1
            }
            mono(i) = s / ch
            i += 1
          }
          Some((fmt.getSampleRate.toInt, mono))
        }
      } finally ais.close()
    } catch {
      // not a JDK-readable container — last tier: hand-rolled IMA ADPCM
      // (WAV format tag 0x11), which javax.sound does not ship a codec for
      case _: javax.sound.sampled.UnsupportedAudioFileException =>
        decodeImaAdpcmWav(bytes)
      case _: java.io.IOException => None
    }
  }

  /** IMA/DVI ADPCM step-size table (the 89-entry table from the IMA
    * ADPCM reference algorithm — public, identical across every
    * implementation since the 1992 IMA Digital Audio Focus Group spec).
    */
  private val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index adjustment per 4-bit code (sign bit excluded — codes 8..15
    * mirror 0..7).
    */
  private val ImaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA ADPCM nibble against (predictor, index) → next state. The
    * canonical bit-exact update: diff = (step·magnitude)/4 + step/8 via
    * shifts, predictor clamped to int16, index clamped to [0, 88].
    */
  private def imaStep(nibble: Int, predictor: Int, index: Int): (Int, Int) = {
    val step = ImaStepTable(index)
    var diff = step >> 3
    if ((nibble & 1) != 0) diff += step >> 2
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 4) != 0) diff += step
    val p0 = if ((nibble & 8) != 0) predictor - diff else predictor + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, index + ImaIndexTable(nibble & 7)))
    (p, i)
  }

  /** REAL IMA ADPCM (WAV format tag 0x11) decode — the 4-bit block-coded
    * telephony/game-audio codec the JDK lacks. Parses the RIFF chunks
    * directly, then per block and channel: a 4-byte state header
    * (int16 LE predictor, uint8 step index, reserved byte) followed by
    * channel-interleaved 4-byte nibble groups, low nibble first. Output
    * is channel-mixed [-1, 1] like the PCM path. None for anything that
    * is not a well-formed mono/stereo 4-bit tag-0x11 WAV.
    */
  private def decodeImaAdpcmWav(bytes: Array[Byte]): Option[(Int, Array[Double])] = {
    if (bytes == null || bytes.length < 44) return None
    def u8(o: Int) = bytes(o) & 0xff
    def u16(o: Int) = u8(o) | (u8(o + 1) << 8)
    def s16(o: Int) = u16(o).toShort.toInt
    def u32(o: Int) = (u8(o).toLong | (u8(o + 1).toLong << 8) |
      (u8(o + 2).toLong << 16) | (u8(o + 3).toLong << 24))
    if (!(bytes.startsWith("RIFF".getBytes) &&
        new String(bytes, 8, 4, "US-ASCII") == "WAVE")) return None
    // chunk walk for fmt + data
    var off = 12
    var fmtOff = -1; var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val len = u32(off + 4).toInt
      if (id == "fmt ") fmtOff = off + 8
      else if (id == "data") { dataOff = off + 8; dataLen = len }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (fmtOff < 0 || dataOff < 0) return None
    val tag = u16(fmtOff)
    val ch = u16(fmtOff + 2)
    val rate = u32(fmtOff + 4).toInt
    val blockAlign = u16(fmtOff + 12)
    val bits = u16(fmtOff + 14)
    if (tag != 0x11 || bits != 4 || ch < 1 || ch > 2 ||
      blockAlign < 4 * ch) return None
    val end = math.min(dataOff + dataLen, bytes.length)
    val samplesPerBlock = (blockAlign - 4 * ch) * 2 / ch + 1
    val out = scala.collection.mutable.ArrayBuilder.make[Double]
    var block = dataOff
    while (block + 4 * ch <= end) {
      val blockEnd = math.min(block + blockAlign, end)
      val pred = new Array[Int](ch)
      val idx = new Array[Int](ch)
      var c = 0
      while (c < ch) {
        pred(c) = s16(block + 4 * c)
        idx(c) = math.max(0, math.min(88, u8(block + 4 * c + 2)))
        c += 1
      }
      // the header predictor IS sample 0 of the block
      var mix = 0.0
      c = 0
      while (c < ch) { mix += pred(c) / 32768.0; c += 1 }
      out += mix / ch
      // channel-interleaved 4-byte groups: 8 samples per channel per pass
      val perCh = new Array[Array[Double]](ch)
      c = 0
      while (c < ch) { perCh(c) =
        new Array[Double](samplesPerBlock - 1); c += 1 }
      val written = new Array[Int](ch)
      var p = block + 4 * ch
      while (p < blockEnd) {
        c = ((p - block - 4 * ch) / 4) % ch
        var b = 0
        while (b < 4 && p + b < blockEnd) {
          val byte = u8(p + b)
          var n = 0
          while (n < 2) {
            val nib = if (n == 0) byte & 0xf else (byte >> 4) & 0xf
            if (written(c) < perCh(c).length) {
              val (np, ni) = imaStep(nib, pred(c), idx(c))
              pred(c) = np; idx(c) = ni
              perCh(c)(written(c)) = np / 32768.0
              written(c) += 1
            }
            n += 1
          }
          b += 1
        }
        p += 4
      }
      val nOut = written.min
      var s = 0
      while (s < nOut) {
        var m = 0.0
        c = 0
        while (c < ch) { m += perCh(c)(s); c += 1 }
        out += m / ch
        s += 1
      }
      block += blockAlign
    }
    val samples = out.result()
    if (samples.isEmpty) None else Some((rate, samples))
  }

  /** REAL perceptual-audio features: Hann-windowed radix-2 FFT power
    * spectrum (pure-JVM, deterministic — no external DSP library), frames
    * of `fftSize` samples at 50% hop averaged over up to `maxFrames`
    * evenly-spaced frames, reduced to
    * `[spectral centroid, 85% rolloff, bands × log-energy]`:
    *   - features(0): power-weighted mean frequency / Nyquist, in [0,1] —
    *     a pure tone at f lands at ≈ f/(rate/2)
    *   - features(1): lowest frequency bin (as a fraction of Nyquist)
    *     below which 85% of total spectral power lies
    *   - features(2 until 2+bands): log1p band power over `bands`
    *     log-spaced bands from bin 1 to Nyquist (DC excluded)
    * This is the mel-spectrogram-shaped front end a perceptual model
    * (audio fingerprinting, language/music ID) consumes, so the audio
    * stub tier is retired for every encoding the JVM decodes (PCM WAV,
    * G.711 μ-law/a-law); only non-JVM codecs (MP3/AAC) remain stubbed.
    * Stamps meta.sample_rate/n_frames like `decodeWav`; undecodable rows
    * get null meta AND null features. Per-partition iterator shape with
    * FFT scratch buffers allocated once per partition — a scan, never a
    * shuffle, so at 100 TB it scales with input bytes like every other
    * decoder here.
    */
  def spectralAudioFeatures(
      df: DataFrame, bands: Int = 16, fftSize: Int = 1024,
      maxFrames: Int = 64): DataFrame = {
    require(fftSize > 1 && (fftSize & (fftSize - 1)) == 0,
      s"spectralAudioFeatures: fftSize must be a power of two, got $fftSize")
    require(bands >= 1 && bands <= fftSize / 2,
      s"spectralAudioFeatures: bands must be in [1, fftSize/2], got $bands")
    val outSchema = StructType(df.schema.fields
      .map(f => if (f.name == "meta") f.copy(nullable = true) else f) :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true))
    val contentIdx = df.schema.fieldIndex("content")
    val metaIdx = df.schema.fieldIndex("meta")
    df.mapPartitions { rows =>
      // per-partition scratch: FFT buffers + Hann window, shared by every row
      val re = new Array[Double](fftSize)
      val im = new Array[Double](fftSize)
      val hann = Array.tabulate(fftSize)(i =>
        0.5 * (1.0 - math.cos(2.0 * math.Pi * i / fftSize)))
      val power = new Array[Double](fftSize / 2)
      rows.map { r =>
        val bytes = r.get(contentIdx).asInstanceOf[Array[Byte]]
        decodePcm(bytes) match {
          case Some((rate, mono)) =>
            val n = mono.length
            val hop = fftSize / 2
            val nAvail = math.max((n - fftSize) / hop + 1, 1)
            val take = math.min(nAvail, maxFrames)
            java.util.Arrays.fill(power, 0.0)
            var k = 0
            while (k < take) {
              val start = (k.toLong * nAvail / take).toInt * hop
              var i = 0
              while (i < fftSize) {
                re(i) = if (start + i < n) mono(start + i) * hann(i) else 0.0
                im(i) = 0.0
                i += 1
              }
              fftInPlace(re, im)
              i = 0
              while (i < fftSize / 2) {
                power(i) += (re(i) * re(i) + im(i) * im(i)) / take
                i += 1
              }
              k += 1
            }
            val feats = new Array[Float](2 + bands)
            // centroid + rolloff over bins 1..fftSize/2-1 (DC excluded)
            var total = 0.0
            var weighted = 0.0
            var i = 1
            while (i < fftSize / 2) {
              total += power(i); weighted += power(i) * i; i += 1
            }
            val nyq = (fftSize / 2 - 1).toDouble
            feats(0) = if (total > 0) (weighted / total / nyq).toFloat else 0f
            var cum = 0.0
            var roll = 1
            while (roll < fftSize / 2 - 1 && cum < 0.85 * total) {
              cum += power(roll); roll += 1
            }
            feats(1) = if (total > 0) (roll / nyq).toFloat else 0f
            // log-spaced band edges from bin 1 to fftSize/2
            val ratio = math.pow(fftSize / 2.0, 1.0 / bands)
            var b = 0
            while (b < bands) {
              val lo = math.max(math.pow(ratio, b).toInt, b + 1)
              val hi = math.max(math.min(math.pow(ratio, b + 1).toInt, fftSize / 2), lo + 1)
              var s = 0.0
              var j = lo
              while (j < hi) { s += power(math.min(j, fftSize / 2 - 1)); j += 1 }
              feats(2 + b) = math.log1p(s).toFloat
              b += 1
            }
            val meta = Row(null, null, rate, n)
            Row.fromSeq(r.toSeq.updated(metaIdx, meta) :+ feats.toSeq)
          case None => Row.fromSeq(r.toSeq.updated(metaIdx, null) :+ null)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** In-place iterative radix-2 Cooley-Tukey FFT (decimation-in-time,
    * bit-reversal permutation then butterfly passes). Array length must be
    * a power of two. Deterministic double arithmetic — the same bits on
    * every JVM.
    */
  private def fftInPlace(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val pr = re(base + k + len / 2); val pi = im(base + k + len / 2)
          val vr = pr * cr - pi * ci
          val vi = pr * ci + pi * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** STUB: deterministic fake "decode + feature extraction" — folds the
    * bytes into `dim` float accumulators (byte i lands in lane i % dim).
    * Stands in for e.g. JPEG-decode → CNN features. Runs per-partition
    * with an iterator (mapInPandas-equivalent batching).
    */
  def extractFeatures(df: DataFrame, dim: Int): DataFrame = {
    // meta forced nullable: the failure contract (null meta + features)
    // must hold even when the incoming frame declared meta non-null
    val outSchema = StructType(df.schema.fields
      .map(f => if (f.name == "meta") f.copy(nullable = true) else f) :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true))
    val contentIdx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      // per-partition setup would happen here (codec/model init)
      rows.map { r =>
        val bytes = r.get(contentIdx).asInstanceOf[Array[Byte]]
        val feats =
          if (bytes == null) null
          else {
            val acc = new Array[Float](dim)
            var i = 0
            while (i < bytes.length) {
              acc(i % dim) += (bytes(i) & 0xff) / 255.0f
              i += 1
            }
            acc
          }
        Row.fromSeq(r.toSeq :+ (if (feats == null) null else feats.toSeq))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** REAL image resize: ImageIO decode → deterministic block-mean box
    * resample per RGB channel (integer block bounds, no platform-dependent
    * resampler — the same arithmetic as `decodeImages`' thumbnail) → PNG
    * re-encode. Content is replaced by the resized PNG bytes and
    * meta.width/height stamped; rows no bundled reader accepts keep their
    * original content with null meta. Per-partition iterator shape —
    * resizing is a scan, never a shuffle.
    */
  def resizeImages(df: DataFrame, w: Int, h: Int): DataFrame = {
    val contentIdx = df.schema.fieldIndex("content")
    val metaIdx = df.schema.fieldIndex("meta")
    val schema = df.schema
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(contentIdx).asInstanceOf[Array[Byte]]
        val img =
          if (bytes == null) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
        if (img == null) r
        else {
          val sw = img.getWidth
          val sh = img.getHeight
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var ty = 0
          while (ty < h) {
            val y0 = ty * sh / h
            val y1 = math.max((ty + 1) * sh / h, y0 + 1)
            var tx = 0
            while (tx < w) {
              val x0 = tx * sw / w
              val x1 = math.max((tx + 1) * sw / w, x0 + 1)
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val rgb = img.getRGB(x, y)
                  sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                  x += 1
                }
                y += 1
              }
              val n = (y1 - y0).toLong * (x1 - x0)
              out.setRGB(tx, ty,
                (((sr / n).toInt << 16) | ((sg / n).toInt << 8) | (sb / n).toInt))
              tx += 1
            }
            ty += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          val meta = Row(w, h, null, null)
          Row.fromSeq(r.toSeq
            .updated(contentIdx, bos.toByteArray)
            .updated(metaIdx, meta))
        }
      }
    }(RowEncoder.encoderFor(schema))
  }

  /** STUB: "resize" for payloads with no JVM decoder — truncate/pad the
    * payload to `targetBytes` and stamp meta.width/height. Stands in for a
    * real resample keeping the plan shape (narrow map, no shuffle); for
    * images use `resizeImages`, which is real.
    */
  def resizeStub(df: DataFrame, targetBytes: Int, w: Int, h: Int): DataFrame =
    df.withColumn("content",
        substring(col("content"), 1, targetBytes))
      .withColumn("meta", struct(
        lit(w).as("width"), lit(h).as("height"),
        lit(null).cast(IntegerType).as("sample_rate"),
        lit(null).cast(IntegerType).as("n_frames")))

  /** REAL video decode for the uncompressed YUV4MPEG2 (.y4m) container —
    * the one video format parseable without codecs (a plain-text header
    * `YUV4MPEG2 W<w> H<h> F<n>:<d> [C<colorspace>]\n`, then per frame a
    * `FRAME…\n` marker followed by raw planar YCbCr). Stamps
    * meta.width/height/n_frames (true frame count from the stream) and
    * extracts, for up to `sampleFrames` evenly-spaced frames, a
    * `thumb`×`thumb` block-mean LUMINANCE thumbnail from the Y plane
    * (row-major, in [0,1]; frames concatenated, so features.length =
    * sampledFrames·thumb²) — same deterministic arithmetic as
    * `decodeImages`. Supports C420*, C422, C444 and Cmono chroma layouts
    * (only the Y-plane size depends on them). Rows that are not Y4M, or
    * whose stream is truncated mid-frame, get null meta AND null features
    * (incoming meta is cleared) instead of failing the partition.
    * Per-partition iterator shape, no shuffle — at 100 TB, frame sampling
    * is a scan.
    */
  def decodeY4m(df: DataFrame, sampleFrames: Int = 4, thumb: Int = 8): DataFrame = {
    // meta forced nullable: the failure contract (null meta + features)
    // must hold even when the incoming frame declared meta non-null
    val outSchema = StructType(df.schema.fields
      .map(f => if (f.name == "meta") f.copy(nullable = true) else f) :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true))
    val contentIdx = df.schema.fieldIndex("content")
    val metaIdx = df.schema.fieldIndex("meta")
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(contentIdx).asInstanceOf[Array[Byte]]
        parseY4m(bytes, sampleFrames, thumb) match {
          case Some((w, h, nFrames, feats)) =>
            val meta = Row(w, h, null, nFrames)
            Row.fromSeq(r.toSeq.updated(metaIdx, meta) :+ feats.toSeq)
          case None => Row.fromSeq(r.toSeq.updated(metaIdx, null) :+ null)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** (width, height, frameCount, sampled thumbnail features) — None when
    * `bytes` is not a well-formed YUV4MPEG2 stream.
    */
  private def parseY4m(
      bytes: Array[Byte], sampleFrames: Int, thumb: Int): Option[(Int, Int, Int, Array[Float])] = {
    if (bytes == null) return None
    val headerEnd = bytes.indexOf('\n'.toByte)
    if (headerEnd < 0) return None
    val header = new String(bytes, 0, headerEnd, "US-ASCII")
    val tokens = header.split(' ')
    if (tokens.isEmpty || tokens(0) != "YUV4MPEG2") return None
    def param(prefix: Char): Option[String] =
      tokens.drop(1).find(t => t.nonEmpty && t.head == prefix).map(_.tail)
    val (w, h) =
      try (param('W').map(_.toInt), param('H').map(_.toInt)) match {
        case (Some(pw), Some(ph)) if pw > 0 && ph > 0 => (pw, ph)
        case _ => return None
      } catch { case _: NumberFormatException => return None }
    val ySize = w * h
    // chroma planes per frame, as a fraction of the luma plane
    val chroma = param('C').getOrElse("420jpeg") match {
      case cs if cs.startsWith("420") => ySize / 2 // two (w/2)×(h/2) planes
      case cs if cs.startsWith("422") => ySize // two (w/2)×h planes
      case cs if cs.startsWith("444") => 2 * ySize // two full planes
      case cs if cs.startsWith("mono") => 0
      case _ => return None
    }
    val frameSize = ySize + chroma

    // index the frame payload offsets (Y plane starts)
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    var pos = headerEnd + 1
    while (pos < bytes.length) {
      // each frame opens with "FRAME[ params]\n"
      if (pos + 5 > bytes.length ||
          new String(bytes, pos, 5, "US-ASCII") != "FRAME") return None
      var nl = pos + 5
      while (nl < bytes.length && bytes(nl) != '\n'.toByte) nl += 1
      if (nl >= bytes.length) return None // truncated frame header
      val dataStart = nl + 1
      if (dataStart + frameSize > bytes.length) return None // truncated frame
      offsets += dataStart
      pos = dataStart + frameSize
    }
    val nFrames = offsets.length

    val take = math.min(sampleFrames, nFrames)
    val feats = new Array[Float](take * thumb * thumb)
    var k = 0
    while (k < take) {
      val off = offsets(k * nFrames / math.max(take, 1)) // evenly spaced
      var ty = 0
      while (ty < thumb) {
        val y0 = ty * h / thumb
        val y1 = math.max((ty + 1) * h / thumb, y0 + 1)
        var tx = 0
        while (tx < thumb) {
          val x0 = tx * w / thumb
          val x1 = math.max((tx + 1) * w / thumb, x0 + 1)
          var s = 0.0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              s += (bytes(off + y * w + x) & 0xff)
              x += 1
            }
            y += 1
          }
          feats(k * thumb * thumb + ty * thumb + tx) =
            (s / ((y1 - y0) * (x1 - x0)) / 255.0).toFloat
          tx += 1
        }
        ty += 1
      }
      k += 1
    }
    Some((w, h, nFrames, feats))
  }

  /** REAL compressed-video decode: animated GIF through the JDK's bundled
    * GIF `ImageReader` — LZW decompression, palette resolution, and
    * frame-by-frame access with no external codec, retiring the video
    * stub for one genuinely compressed container (H.26x-class interframe
    * codecs remain stubbed; a bare JVM has no decoder for them). Stamps
    * meta.width/height (logical screen) and n_frames (true frame count),
    * and extracts the same `thumb`×`thumb` block-mean luminance thumbnail
    * as `decodeImages`/`decodeY4m` for up to `sampleFrames` evenly-spaced
    * frames, COMPOSITED cumulatively: GIF frames are often partial
    * rectangles at an (left, top) offset over the previous canvas, so
    * every frame up to the last sampled index is drawn in order
    * (do-not-dispose semantics; the restore-to-background/previous
    * disposal modes are approximated by the cumulative canvas —
    * deterministic, and exact for the overwhelmingly common disposal
    * mode). Not-a-GIF / truncated / zero-frame rows get null meta AND
    * null features (incoming meta is cleared) instead of failing the
    * partition.
    *
    * Per-partition amortization is real here: ONE reader instance per
    * partition (codec lookup is not per-row), reset per payload — the
    * pattern a JNI video codec would need too.
    */
  def decodeGif(df: DataFrame, sampleFrames: Int = 4, thumb: Int = 8): DataFrame = {
    // meta forced nullable: the failure contract (null meta + features)
    // must hold even when the incoming frame declared meta non-null
    val outSchema = StructType(df.schema.fields
      .map(f => if (f.name == "meta") f.copy(nullable = true) else f) :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true))
    val contentIdx = df.schema.fieldIndex("content")
    val metaIdx = df.schema.fieldIndex("meta")
    df.mapPartitions { rows =>
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      rows.map { r =>
        val bytes = r.get(contentIdx).asInstanceOf[Array[Byte]]
        decodeGifBytes(reader, bytes, sampleFrames, thumb) match {
          case Some((w, h, nFrames, feats)) =>
            val meta = Row(w, h, null, nFrames)
            Row.fromSeq(r.toSeq.updated(metaIdx, meta) :+ feats.toSeq)
          case None => Row.fromSeq(r.toSeq.updated(metaIdx, null) :+ null)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** (logical width, logical height, frameCount, sampled composited
    * thumbnails) — None when `bytes` is not a decodable GIF.
    */
  private def decodeGifBytes(
      reader: javax.imageio.ImageReader, bytes: Array[Byte],
      sampleFrames: Int, thumb: Int): Option[(Int, Int, Int, Array[Float])] = {
    if (bytes == null) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis, false, false) // keep metadata: frame offsets
        val nFrames = reader.getNumImages(true)
        if (nFrames <= 0) return None
        // logical screen from stream metadata; frame 0 as fallback
        val (w, h) = {
          val lsd = Option(reader.getStreamMetadata).map(
            _.getAsTree("javax_imageio_gif_stream_1.0"))
            .flatMap(t => childNamed(t, "LogicalScreenDescriptor"))
          (lsd.flatMap(attr(_, "logicalScreenWidth")),
            lsd.flatMap(attr(_, "logicalScreenHeight"))) match {
            case (Some(sw), Some(sh)) if sw > 0 && sh > 0 => (sw, sh)
            case _ => (reader.getWidth(0), reader.getHeight(0))
          }
        }
        val take = math.min(sampleFrames, nFrames)
        val sampled = (0 until take).map(k => k * nFrames / take).toSet
        val canvas = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = canvas.createGraphics()
        val feats = new Array[Float](take * thumb * thumb)
        try {
          var fi = 0
          var out = 0
          val last = sampled.max
          while (fi <= last) {
            val frame = reader.read(fi)
            val desc = Option(reader.getImageMetadata(fi))
              .map(_.getAsTree("javax_imageio_gif_image_1.0"))
              .flatMap(t => childNamed(t, "ImageDescriptor"))
            val left = desc.flatMap(attr(_, "imageLeftPosition")).getOrElse(0)
            val top = desc.flatMap(attr(_, "imageTopPosition")).getOrElse(0)
            g.drawImage(frame, left, top, null)
            if (sampled.contains(fi)) {
              System.arraycopy(lumaThumb(canvas, thumb), 0,
                feats, out * thumb * thumb, thumb * thumb)
              out += 1
            }
            fi += 1
          }
        } finally g.dispose()
        Some((w, h, nFrames, feats))
      } finally iis.close()
    } catch {
      case _: java.io.IOException => None
      case _: IndexOutOfBoundsException => None // truncated stream
    }
  }

  /** REAL compressed-video decode #2: MJPEG-in-AVI. The RIFF/AVI
    * container is plain chunk walking (FOURCC + little-endian u32 size,
    * `LIST` recursion, even-byte padding — no codec involved), and every
    * video frame chunk (`##dc`/`##db`) holds one complete JPEG the JDK's
    * bundled reader decodes; together they retire the video stub for the
    * classic camera/capture interchange format. Stamps meta
    * width/height from the `avih` main header (frame-0 probe as
    * fallback) and n_frames from the TRUE frame-chunk count, and samples
    * up to `sampleFrames` evenly-spaced frames into the same
    * `thumb`×`thumb` luminance thumbnails as the other video decoders —
    * MJPEG is all-intraframe, so frames decode independently (no
    * compositing pass, unlike GIF). Not-an-AVI / truncated / undecodable
    * rows get null meta AND features.
    *
    * Same per-partition amortization: ONE JPEG reader per partition,
    * reset per frame.
    */
  def decodeMjpegAvi(df: DataFrame, sampleFrames: Int = 4, thumb: Int = 8): DataFrame = {
    val outSchema = StructType(df.schema.fields
      .map(f => if (f.name == "meta") f.copy(nullable = true) else f) :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true))
    val contentIdx = df.schema.fieldIndex("content")
    val metaIdx = df.schema.fieldIndex("meta")
    df.mapPartitions { rows =>
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg").next()
      rows.map { r =>
        val bytes = r.get(contentIdx).asInstanceOf[Array[Byte]]
        decodeAviBytes(reader, bytes, sampleFrames, thumb) match {
          case Some((w, h, nFrames, feats)) =>
            val meta = Row(w, h, null, nFrames)
            Row.fromSeq(r.toSeq.updated(metaIdx, meta) :+ feats.toSeq)
          case None => Row.fromSeq(r.toSeq.updated(metaIdx, null) :+ null)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** (width, height, frameCount, sampled thumbnails) — None when `bytes`
    * is not a complete, decodable MJPEG AVI.
    */
  private def decodeAviBytes(
      reader: javax.imageio.ImageReader, bytes: Array[Byte],
      sampleFrames: Int, thumb: Int): Option[(Int, Int, Int, Array[Float])] = {
    if (bytes == null || bytes.length < 24) return None
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | (bytes(o + 1) & 0xffL) << 8 |
        (bytes(o + 2) & 0xffL) << 16 | (bytes(o + 3) & 0xffL) << 24
    def fourcc(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    val end = math.min(bytes.length.toLong, 8L + u32(4)).toInt
    var w = 0
    var h = 0
    var truncated = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(start: Int, stop: Int): Unit = {
      var o = start
      while (o + 8 <= stop && !truncated) {
        val id = fourcc(o)
        val sz = u32(o + 4)
        if (sz > Int.MaxValue || o + 8 + sz > stop) { truncated = true; return }
        val dataOff = o + 8
        if (id == "LIST") walk(dataOff + 4, dataOff + sz.toInt)
        else if (id == "avih" && sz >= 40) {
          w = u32(dataOff + 32).toInt
          h = u32(dataOff + 36).toInt
        } else if (id(0).isDigit && id(1).isDigit && id(2) == 'd' &&
            (id(3) == 'c' || id(3) == 'b') && sz > 0)
          frames += ((dataOff, sz.toInt))
        o = dataOff + sz.toInt + (sz.toInt & 1) // chunks pad to even
      }
    }
    try walk(12, end)
    catch { case _: IndexOutOfBoundsException => return None }
    if (truncated || frames.isEmpty) return None
    val n = frames.length
    val take = math.min(sampleFrames, n)
    val feats = new Array[Float](take * thumb * thumb)
    var k = 0
    while (k < take) {
      val (off, len) = frames(k * n / take)
      val img =
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes, off, len))
          try { reader.setInput(iis, true, true); reader.read(0) }
          finally iis.close()
        } catch {
          case _: java.io.IOException => return None
          case _: IndexOutOfBoundsException => return None
        }
      if (img == null) return None
      if (w <= 0 || h <= 0) { w = img.getWidth; h = img.getHeight }
      System.arraycopy(lumaThumb(img, thumb), 0, feats, k * thumb * thumb,
        thumb * thumb)
      k += 1
    }
    Some((w, h, n, feats))
  }

  private def childNamed(n: org.w3c.dom.Node, name: String): Option[org.w3c.dom.Node] = {
    val kids = n.getChildNodes
    (0 until kids.getLength).map(kids.item).find(_.getNodeName == name)
  }

  private def attr(n: org.w3c.dom.Node, name: String): Option[Int] =
    Option(n.getAttributes.getNamedItem(name))
      .flatMap(a => scala.util.Try(a.getNodeValue.toInt).toOption)
}
