package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §7.5): image/audio/video as
  * opaque `binary` payloads plus typed metadata, processed by
  * per-partition batch operators.
  *
  * Image decode is REAL (`decodeImages`: bounded `javax.imageio`
  * header parse + raster stats, corrupt-safe) and so is audio decode
  * (`decodeAudio`: `javax.sound.sampled` container parse + PCM RMS,
  * same bounds); `decodeStub` remains as the codec-free featurizer
  * shape for media the JDK cannot decode (video), where only the
  * schema contract, the `mapPartitions` batch shape (one iterator
  * pass, constant memory per partition, no driver involvement), and
  * the partition-preserving plumbing carry over to a 100 TB run with
  * a production decoder dropped into the body.
  */
object Multimodal {

  /** Canonical media schema: payload + sniffed format + size. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("format", StringType),
    StructField("n_bytes", LongType)))

  /** Magic-number format sniff over the payload head (real parsers
    * for the common containers; pure column expression, codegen'd).
    */
  def sniffFormat(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val head = hex(substring(payload, 1, 4))
    when(head.startsWith("89504E47"), "png")
      .when(head.startsWith("FFD8FF"), "jpeg")
      .when(head.startsWith("47494638"), "gif")
      .when(head.startsWith("52494646"), "riff") // wav/avi/webp family
      .when(head.startsWith("664C6143"), "flac")
      .when(head.startsWith("1A45DFA3"), "matroska") // mkv/webm
      // ISO-BMFF has no leading magic: the brand box type sits at
      // bytes 4-7 ('ftyp'), after the box size
      .when(hex(substring(payload, 5, 4)) === "66747970", "mp4")
      .otherwise("unknown")
  }

  /** Packs a text table as binary media rows — the test-data adapter
    * (the synthetic corpus has no real images; payload = UTF-8 bytes).
    */
  def packAsMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"))
      .withColumn("format", sniffFormat(col("payload")))
      .withColumn("n_bytes", length(col("payload")).cast("long"))

  /** Output schema of the stubbed feature extractor. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("feature", ArrayType(FloatType))))

  /** "Decode + featurize" over partitions. In production this body is
    * the image/audio decoder; here it emits a deterministic 8-dim
    * byte-histogram-ish feature so tests can assert exact values.
    * The batch shape (iterator → iterator, no materialization) is the
    * real contract.
    */
  def decodeStub(media: DataFrame, featureDim: Int = 8): DataFrame = {
    val enc = RowEncoder.encoderFor(FeatureSchema)
    Dedup.rebalance(media.select("media_id", "payload", "format", "n_bytes"),
        Seq(col("media_id")))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val feat = new Array[Float](featureDim)
          var i = 0
          while (i < payload.length) {
            feat(i % featureDim) += (payload(i) & 0xff) / 255.0f
            i += 1
          }
          Row(id, r.getString(2), r.getLong(3), feat.toSeq)
        }
      }(enc)
  }

  /** Output schema of the real image decoder. */
  val ImageFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType),
    StructField("error", StringType)))

  /** REAL bounded image decode over partitions (`javax.imageio`,
    * in-JDK — no external codec dependency).
    *
    * Two-tier by design, mirroring what a production 100 TB pass does:
    *  - dimensions come from the format HEADER via an `ImageReader`
    *    (`getWidth/getHeight(0)` parse the PNG IHDR / JPEG SOF marker
    *    without decoding pixel data) — O(header) per payload no matter
    *    how large the image;
    *  - channel statistics require pixels, so the full decode runs
    *    only for payloads within `maxDecodeBytes`; larger ones keep
    *    their header dims and report `error = "too_large"` instead of
    *    OOMing an executor on a decompression bomb.
    * Corrupt or non-image payloads never throw: they surface as a
    * null-dim row with a reason in `error`, so one bad object in a
    * billion can't fail a stage (retries would just re-hit it).
    *
    * Same `mapPartitions` batch shape as `decodeStub` (iterator in,
    * iterator out, constant memory, partition-preserving).
    */
  def decodeImages(media: DataFrame, maxDecodeBytes: Int = 1 << 24): DataFrame = {
    val enc = RowEncoder.encoderFor(ImageFeatureSchema)
    Dedup.rebalance(media.select("media_id", "payload", "format", "n_bytes"),
        Seq(col("media_id")))
      .mapPartitions { rows =>
        // reader SPIs resolved ONCE per partition (not the per-payload
        // IIORegistry walk ImageIO.getImageReaders pays), but tried in
        // strict REGISTRY order, first claimant wins — exactly
        // ImageIO.getImageReaders' selection. A sticky
        // last-success-first order (decodeAudio's pattern) was
        // measured NEUTRAL here (BENCHNOTES_r12 §5: no global lock in
        // the IIORegistry walk, unlike AudioSystem) and is NOT
        // order-stable: when two providers claim the same payload
        // (two TIFF readers, a lenient third-party SPI), sticky picks
        // whichever decoded last, so the same payload's metadata could
        // depend on partition history — non-deterministic output in an
        // engine whose correctness gate is hash equality. Audio keeps
        // sticky because there it is a measured 146x win and the
        // deviation is documented at the decodeAudio site.
        val spis = imageReaderSpis()
        // one READER INSTANCE per claiming provider per partition,
        // created lazily and reused across payloads (setInput rebinds
        // it; reset() in decodeOne clears state between rows): the old
        // shape paid createReaderInstance() — reader allocation +
        // plugin init — per payload. Measured with DriveImageSniff at
        // 500k payloads: decode 2.0 s → 1.9 s together with the bulk
        // scanline reads below — the rest IS the inflate
        // (OPTIMIZATION_r17.md q61).
        val readers = new Array[javax.imageio.ImageReader](spis.length)
        // dispose() is the documented end-of-life call — without it a
        // reader can pin decode buffers until GC (ADVICE r17). The
        // task-completion listener covers both exhaustion and failure.
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            var i = 0
            while (i < readers.length) {
              if (readers(i) != null) {
                try readers(i).dispose() catch { case _: Exception => () }
                readers(i) = null
              }
              i += 1
            }
          })
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val fmt = r.getString(2)
          decodeOne(id, payload, fmt, maxDecodeBytes, spis, readers)
        }
      }(enc)
  }

  /** The registered image reader providers, in registry order — the
    * same set `ImageIO.getImageReaders` consults, resolved once
    * instead of per payload.
    */
  private def imageReaderSpis(): Array[javax.imageio.spi.ImageReaderSpi] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[javax.imageio.spi.ImageReaderSpi]
    try {
      val it = javax.imageio.spi.IIORegistry.getDefaultInstance
        .getServiceProviders(classOf[javax.imageio.spi.ImageReaderSpi], true)
      while (it.hasNext) out += it.next()
    } catch { case scala.util.control.NonFatal(_) => }
    out.toArray
  }

  private def decodeOne(
      id: Long, payload: Array[Byte], fmt: String, maxDecodeBytes: Int,
      spis: Array[javax.imageio.spi.ImageReaderSpi],
      readers: Array[javax.imageio.ImageReader]): Row = {
    val nullRow = (err: String) =>
      Row(id, fmt, null, null, null, null, null, null, err)
    if (payload == null || payload.length == 0) return nullRow("empty_payload")
    var stream: javax.imageio.stream.ImageInputStream = null
    try {
      // MemoryCacheImageInputStream directly: ImageIO.createImageInputStream
      // consults the static useCache flag (default TRUE) and backs each
      // stream with a TEMP FILE when the cache dir is writable — one
      // file create+delete per payload, which at 500k rows/32 threads
      // dominates the decode itself. Payloads are already in-memory
      // byte arrays; a heap-backed stream is strictly better here.
      stream = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      // registry-order provider sniff, first claimant wins (the
      // ImageIO.getImageReaders selection rule; canDecodeInput's
      // contract restores the stream position, so successive sniffs
      // compose)
      val s = stream
      def sniffs(spi: javax.imageio.spi.ImageReaderSpi): Boolean =
        try spi.canDecodeInput(s) catch { case _: Exception => false }
      var spiIdx = -1
      var i = 0
      while (spiIdx < 0 && i < spis.length) {
        if (sniffs(spis(i))) spiIdx = i
        i += 1
      }
      if (spiIdx < 0) return nullRow("unsupported_format")
      // reuse the partition-scoped reader for this provider (created
      // on first claim); reset() — not dispose() — between payloads
      if (readers(spiIdx) == null)
        readers(spiIdx) = spis(spiIdx).createReaderInstance()
      val reader = readers(spiIdx)
      try {
        reader.setInput(stream, true, true)
        // header-only: IHDR/SOF parse, no pixel decode
        val w = reader.getWidth(0)
        val h = reader.getHeight(0)
        if (payload.length > maxDecodeBytes)
          return Row(id, fmt, w, h, null, null, null, null, "too_large")
        val img = reader.read(0)
        val bands = img.getRaster.getNumBands
        // channel means in one raster pass (RGB; gray maps to band 0).
        // Samples move per SCANLINE through getPixels — one virtual
        // dispatch per row instead of 3 per pixel; values and the
        // y-then-x accumulation order are identical to the per-sample
        // loop, so the double sums are bit-identical.
        var sr = 0.0; var sg = 0.0; var sb = 0.0
        val raster = img.getRaster
        val gi = math.min(1, bands - 1)
        val bi = math.min(2, bands - 1)
        val line = new Array[Int](w * bands)
        var y = 0
        while (y < h) {
          raster.getPixels(0, y, w, 1, line)
          var x = 0
          while (x < w) {
            val base = x * bands
            sr += line(base)
            sg += line(base + gi)
            sb += line(base + bi)
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * h
        Row(id, fmt, w, h, bands, sr / n, sg / n, sb / n, null)
      } finally {
        // a reader whose reset() is incomplete or itself throws must
        // not poison later payloads claimed by the same SPI (ADVICE
        // r17): on reset failure, dispose and drop the instance so the
        // next payload gets a fresh one (the original exception, if
        // any, still propagates to the decode_failed handler).
        try reader.reset()
        catch {
          case _: Exception =>
            try reader.dispose() catch { case _: Exception => () }
            readers(spiIdx) = null
        }
      }
    } catch {
      case _: Exception => nullRow("decode_failed")
    } finally {
      if (stream != null) try stream.close() catch { case _: Exception => }
    }
  }

  /** Deterministic synthetic PNG payloads derived from an id column —
    * the test-data adapter for the REAL decoder (the corpus ships no
    * images). Dimensions and fill color are pure functions of the id:
    *   width  = 4 + id % 61,  height = 4 + id % 37,
    *   rgb    = (id·7 % 256, id·13 % 256, id·31 % 256)
    * so an oracle can verify the decoded output with integer
    * arithmetic alone, while the Spark side really round-trips
    * PNG-encode → IHDR sniff → `javax.imageio` decode → raster stats.
    */
  def renderSyntheticPngs(ids: DataFrame, idCol: String): DataFrame = {
    val enc = RowEncoder.encoderFor(MediaSchema)
    Dedup.rebalance(ids.select(col(idCol).cast("long").as("media_id")),
        Seq(col("media_id")))
      .mapPartitions { rows =>
        // ONE png writer per partition: ImageIO.write(img, "png", _)
        // walks the IIORegistry for a claiming writer AND creates a
        // fresh writer instance per payload; the encoder itself is
        // reusable (setOutput rebinds, reset() clears state), and the
        // provider set cannot change mid-partition. Byte-identical
        // output — ImageIO.write delegates to exactly this
        // writer.write(img) call on the first registry claimant.
        // Measured with DriveImageSniff at 500k payloads: render
        // 2.2 s → 1.9 s together with the bulk fill below — the rest
        // IS the max-effort deflate the JDK writer hard-codes
        // (OPTIMIZATION_r17.md q61).
        // writer selected with the TYPE_INT_RGB ImageTypeSpecifier —
        // getImageWriters applies the canEncodeImage filter exactly as
        // ImageIO.write's ImageIO.getWriter(img) does (ADVICE r17: a
        // bare format-name lookup could pick a third-party PNG SPI
        // that cannot encode INT_RGB). Every image rendered below is
        // TYPE_INT_RGB, so one selection per partition is exact.
        val writerIt = javax.imageio.ImageIO.getImageWriters(
          javax.imageio.ImageTypeSpecifier.createFromBufferedImageType(
            java.awt.image.BufferedImage.TYPE_INT_RGB), "png")
        val writer = if (writerIt.hasNext) writerIt.next() else null
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            if (writer != null)
              try writer.dispose() catch { case _: Exception => () }
          })
        rows.map { r =>
          val id = r.getLong(0)
          val w = (4 + id % 61).toInt
          val h = (4 + id % 37).toInt
          val rgb = ((id * 7 % 256) << 16 | (id * 13 % 256) << 8 |
            (id * 31 % 256)).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          // constant fill straight into the INT_RGB backing array:
          // setRGB pays a ColorModel round-trip per PIXEL; the pixels
          // (and the encoded PNG) are identical
          val data = img.getRaster.getDataBuffer
            .asInstanceOf[java.awt.image.DataBufferInt].getData
          java.util.Arrays.fill(data, rgb)
          val bos = new java.io.ByteArrayOutputStream()
          // explicit memory-backed output stream: ImageIO.write(_, _,
          // OutputStream) routes through createImageOutputStream, whose
          // default-useCache path spills every encode through a temp
          // FILE (see decodeOne) — 500k file creates at sf10
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          if (writer != null) { // no png writer: empty payload, as
            writer.setOutput(ios) // ImageIO.write's false-return left it
            try writer.write(img) finally writer.reset()
          }
          ios.close()
          val bytes = bos.toByteArray
          Row(id, bytes, "png", bytes.length.toLong)
        }
      }(enc)
  }

  /** Output schema of the real audio decoder. */
  val AudioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("format", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_samples", LongType),
    StructField("rms", DoubleType),
    StructField("error", StringType)))

  /** REAL bounded audio decode over partitions (`javax.sound.sampled`,
    * in-JDK — no external codec dependency). Same two-tier design as
    * [[decodeImages]]:
    *  - container header via `AudioSystem.getAudioFileFormat` (RIFF/
    *    AIFF/AU chunk parse, no sample data read) gives sample rate,
    *    channels, bit depth, and frame count — O(header) per payload;
    *  - the sample-statistics pass (RMS over all channels) decodes
    *    PCM only for payloads within `maxDecodeBytes`; larger ones
    *    keep their header fields and report `error = "too_large"`.
    * Non-PCM-16 encodings keep header metadata with
    * `error = "unsupported_encoding"` (a production pass would
    * transcode; statistics on compressed bytes would be garbage).
    * Corrupt payloads never throw — null fields + reason, so one bad
    * object in a billion cannot fail a stage. Same `mapPartitions`
    * batch shape as every decoder here.
    */
  def decodeAudio(media: DataFrame, maxDecodeBytes: Int = 1 << 24): DataFrame = {
    val enc = RowEncoder.encoderFor(AudioFeatureSchema)
    Dedup.rebalance(media.select("media_id", "payload", "format", "n_bytes"),
        Seq(col("media_id")))
      .mapPartitions { rows =>
        // resolve the container parsers ONCE per partition:
        // AudioSystem.getAudioFileFormat/getAudioInputStream route every
        // call through a static SYNCHRONIZED provider lookup, which at
        // 32 threads × 500k small payloads serializes the whole stage
        // on one JVM-global lock. ServiceLoader is the same public SPI
        // (javax.sound.sampled.spi.AudioFileReader) without the lock.
        val readers = audioFileReaders()
        // sticky reader order: the provider that decoded the LAST
        // payload is tried first. Real corpora are format-homogeneous
        // per partition, and a mismatched provider is not merely a
        // cheap exception — the JDK's MIDI reader takes a GLOBAL
        // synchronized provider lock on every attempt, which at 32
        // threads serializes the stage (measured: 200k tiny WAVs in
        // 28 ms wave-first vs 4.1 s in ServiceLoader order).
        // DOCUMENTED ORDERING DEVIATION: if two providers both accept
        // the same payload (they signal rejection by exception, so a
        // lenient third-party reader could shadow a stock one), sticky
        // picks whichever decoded last instead of ServiceLoader order.
        // On the stock JDK provider set (WAVE/AU/AIFF/MIDI) claims are
        // disjoint container magics, so decoded output is unaffected;
        // the deviation is accepted here — unlike decodeImages, where
        // the sticky order was measured neutral and strict registry
        // order is kept — because this one is the 146x win above.
        val sticky = new StickyIndex
        rows.map { r =>
          decodeOneAudio(r.getLong(0), r.getAs[Array[Byte]](1),
            r.getString(2), maxDecodeBytes, readers, sticky)
        }
      }(enc)
  }

  /** The JDK's registered audio container parsers, resolved through the
    * public `ServiceLoader` SPI (same set `AudioSystem` consults, minus
    * its per-call global lock). Falls back to an empty array only if
    * the platform ships none — callers then report `decode_failed`.
    */
  private def audioFileReaders(): Array[javax.sound.sampled.spi.AudioFileReader] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[javax.sound.sampled.spi.AudioFileReader]
    try {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
      while (it.hasNext) out += it.next()
    } catch { case scala.util.control.NonFatal(_) => }
    out.toArray
  }

  /** Last-successful-provider memo for one partition's decode loop. */
  private final class StickyIndex { var i: Int = -1 }

  private def decodeOneAudio(
      id: Long, payload: Array[Byte], fmt: String, maxDecodeBytes: Int,
      readers: Array[javax.sound.sampled.spi.AudioFileReader],
      sticky: StickyIndex): Row = {
    import javax.sound.sampled._
    val nullRow = (err: String) =>
      Row(id, fmt, null, null, null, null, null, err)
    if (payload == null || payload.length == 0) return nullRow("empty_payload")
    try {
      // ONE header parse per payload (the old shape parsed twice:
      // getAudioFileFormat for metadata, getAudioInputStream for data —
      // the stream itself carries both, and opening it reads only the
      // container header, so the too_large tier stays O(header))
      var ais: AudioInputStream = null
      if (sticky.i >= 0) {
        try ais = readers(sticky.i).getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        catch { case _: UnsupportedAudioFileException => }
      }
      var i = 0
      while (ais == null && i < readers.length) {
        if (i != sticky.i) {
          try {
            ais = readers(i).getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            sticky.i = i
          } catch { case _: UnsupportedAudioFileException => }
        }
        i += 1
      }
      if (ais == null) return nullRow("decode_failed")
      val f = ais.getFormat
      val sr = f.getSampleRate.toInt
      val ch = f.getChannels
      val bits = f.getSampleSizeInBits
      val frames = ais.getFrameLength
      if (payload.length > maxDecodeBytes) {
        ais.close()
        return Row(id, fmt, sr, ch, bits, frames, null, "too_large")
      }
      if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED || bits != 16) {
        ais.close()
        return Row(id, fmt, sr, ch, bits, frames, null, "unsupported_encoding")
      }
      try {
        // RMS over every 16-bit sample of every channel; the square
        // sum is exact in a long (2^31 per sample², 2^32 samples max)
        var sumSq = 0L
        var n = 0L
        val buf = new Array[Byte](8192)
        var read = ais.read(buf)
        var carry = -1 // low byte of a sample split across reads
        while (read > 0) {
          var i = 0
          if (carry >= 0 && read > 0) {
            val v = ((buf(0) << 8) | carry).toShort.toLong
            sumSq += v * v; n += 1; i = 1; carry = -1
          }
          while (i + 1 < read) {
            val v = (((buf(i + 1) & 0xff) << 8) | (buf(i) & 0xff)).toShort.toLong
            sumSq += v * v; n += 1
            i += 2
          }
          if (i < read) carry = buf(i) & 0xff
          read = ais.read(buf)
        }
        val rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)
        Row(id, fmt, sr, ch, bits, frames, rms, null)
      } finally ais.close()
    } catch {
      case _: Exception => nullRow("decode_failed")
    }
  }

  /** Deterministic synthetic WAV payloads from an id column — the
    * test-data adapter for the REAL audio decoder (the corpus ships no
    * audio). 16-bit PCM mono at 8 kHz; sample count and every sample
    * value are pure integer functions of the id:
    *   n_samples = 16 + id % 64,
    *   sample(i) = (id·31 + i·7) mod 2003 − 1001
    * so the oracle replays the arithmetic exactly (square sums are
    * integers; `sqrt` and the division are correctly-rounded IEEE ops
    * in both engines) while the Spark side really round-trips
    * WAV-encode → RIFF sniff → `javax.sound.sampled` decode → RMS.
    */
  def renderSyntheticWavs(ids: DataFrame, idCol: String): DataFrame = {
    val enc = RowEncoder.encoderFor(MediaSchema)
    Dedup.rebalance(ids.select(col(idCol).cast("long").as("media_id")),
        Seq(col("media_id")))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val n = (16 + id % 64).toInt
          val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(1) // PCM, mono
            .putInt(8000).putInt(16000) // rate, byte rate
            .putShort(2).putShort(16) // block align, bits
            .put("data".getBytes("US-ASCII")).putInt(n * 2)
          var i = 0
          while (i < n) {
            bb.putShort(((id * 31 + i * 7) % 2003 - 1001).toShort)
            i += 1
          }
          val bytes = bb.array()
          Row(id, bytes, "riff", bytes.length.toLong)
        }
      }(enc)
  }

  /** Frame sampling for video-like payloads: every `stride`-th chunk
    * index, as (media_id, frame_no, offset). Pure column math — the
    * actual frame grab happens in the decode stage.
    */
  def frameSample(media: DataFrame, chunkBytes: Int, stride: Int): DataFrame =
    media.select(col("media_id"), col("n_bytes"),
      explode(sequence(lit(0L),
        greatest(floor((col("n_bytes") - 1) / chunkBytes), lit(0L)))).as("chunk_no"))
      .where(col("chunk_no") % stride === 0)
      .select(col("media_id"), col("chunk_no"),
        (col("chunk_no") * chunkBytes).as("byte_offset"))
}
