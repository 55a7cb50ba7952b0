package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batched decode / feature extraction.
  *
  * The decode step is REAL for the pure-JVM formats (`javax.imageio`: PNG,
  * BMP, GIF, JPEG readers ship with the JDK): [[decodeImage]] decodes the
  * bytes to width/height/channel-count per asset inside `mapPartitions` —
  * iterator-in/iterator-out, no driver collect, binary column pruned before
  * the scan when unused. Bytes no JDK reader accepts (or formats that would
  * need native codecs — video, audio) fall back to a deterministic
  * stand-in so the pipeline shape stays total; `decoded=false` marks those
  * rows. Swap the per-row body for a JNI/FFmpeg call (or a `mapInPandas`
  * stage on PySpark) for codec formats — the batch shape is already the
  * production one.
  */
object Multimodal {

  /** ImageIO defaults to spooling every ImageInputStream/OutputStream
    * through a temp FILE on disk — per-row disk I/O that dominates decode
    * of small in-memory assets (measured 4.9 s → well under 1 s for 5 000
    * tiny PNGs at sf0.1). Force in-memory streams once per JVM; referenced
    * from each kernel so executors flip it too. */
  private lazy val inMemoryImageIo: Unit = ImageIO.setUseCache(false)

  /** Typed metadata schema attached to every binary asset. */
  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("content_hash", StringType),
    StructField("format", StringType)))

  /** Cheap container-format sniff from magic bytes (real logic — works on
    * actual image bytes too). */
  def sniffFormat(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(expr("substring(asset, 1, 3)") === lit(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte)), "jpeg")
      .when(expr("substring(asset, 1, 4)") === lit(Array[Byte](0x89.toByte, 'P', 'N', 'G')), "png")
      .when(expr("substring(asset, 1, 2)") === lit("BM".getBytes("UTF-8")), "bmp")
      .when(expr("substring(asset, 1, 4)") === lit("RIFF".getBytes("UTF-8")), "riff")
      .otherwise("unknown")

  /** Attach typed metadata to a frame with a binary `asset` column. Pure
    * Column expressions — runs at scan speed, binary stays columnar. */
  def withMetadata(df: DataFrame): DataFrame =
    df.withColumn("meta", struct(
      length(col("asset")).cast("long").as("byte_len"),
      md5(col("asset")).as("content_hash"),
      sniffFormat(col("asset")).as("format")))

  /** Schema produced by [[decodeImage]]. */
  val decodeSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("decoded", BooleanType)))

  /** Deterministic stand-in dimensions for bytes nothing can decode — keeps
    * the decode stage total and its output stable across retries. */
  private def fallbackDims(bytes: Array[Byte]): (Int, Int) = {
    val w = 1 + (math.abs(bytes.length) % 64)
    val h = 1 + (math.abs(if (bytes.isEmpty) 0 else bytes(0).toInt) % 64)
    (w, h)
  }

  /** Real image decode over a binary column: `ImageIO.read` per asset inside
    * `mapPartitions` (partition-preserving, no shuffle, no driver round
    * trip). Decodable bytes (PNG/BMP/GIF/JPEG via the JDK's bundled
    * readers) report true raster width/height and band count with
    * `decoded=true`; everything else gets the deterministic stand-in and
    * `decoded=false`. */
  def decodeImage(df: DataFrame, idCol: String = "asset_id",
                  binCol: String = "asset"): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      inMemoryImageIo
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        val img =
          try ImageIO.read(new ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img != null)
          Row(id, img.getWidth, img.getHeight, img.getRaster.getNumBands, true)
        else {
          val (w, h) = fallbackDims(bytes)
          Row(id, w, h, 0, false)
        }
      }
    }
    spark.createDataFrame(rdd, decodeSchema)
  }

  /** Schema produced by [[decodeAudio]]. */
  val audioSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_ms", LongType),
    StructField("decoded", BooleanType)))

  /** JDK audio SPI readers resolved ONCE per JVM (r17):
    * `AudioSystem.getAudioInputStream` repeats a SYNCHRONIZED provider
    * registry scan on every call, and 32 concurrent decode tasks convoy on
    * that lock — PlanProbe measured the decode stage at 14.8 s of blocked
    * task time against 0.9 s of CPU. Pre-resolving the same providers
    * (ServiceLoader over the public `AudioFileReader` SPI — the JDK's
    * WAV/AIFF/AU readers) and probing them directly keeps AudioSystem's
    * exact semantics — first reader that accepts the stream wins; each
    * JDK reader deterministically rejects foreign containers, so
    * acceptance is unambiguous — without the global lock. */
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val buf = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) buf += it.next()
    // Round 18 (the r17 residual blocked second, root-caused): the JDK's
    // MIDI-bridge reader (SoftMidiAudioFileReader) re-runs the SYNCHRONIZED
    // MIDI provider registry scan (MidiSystem.getMidiFileFormat →
    // JSSecurityManager.getProviders) on EVERY probe — even to REJECT a
    // non-MIDI stream — so 32 decode tasks convoyed on that class lock
    // (ExecProfile: 12.6k of 23k samples BLOCKED there). Probing it LAST
    // preserves first-accepting-reader semantics exactly (each JDK reader
    // keys on a distinct container magic — RIFF/FORM/.snd/MThd — so no
    // stream is accepted by two readers) while real audio containers never
    // reach it; only genuine-MIDI or no-reader streams still pay the scan.
    val (midi, rest) = buf.result()
      .partition(_.getClass.getName.contains("SoftMidi"))
    rest ++ midi
  }

  private def openAudio(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val readers = audioReaders
    if (readers.isEmpty) // no SPI visible (exotic runtime): old path
      return javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
    var i = 0
    while (i < readers.length) {
      try return readers(i).getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
      i += 1
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no registered audio reader accepts the stream")
  }

  /** Real audio-container decode over a binary column: the JDK SPI readers
    * per asset inside `mapPartitions` (WAV/AIFF/AU). Decodable bytes report
    * the container's true sample rate, channel count, bit depth, frame
    * count and duration; everything else takes the deterministic stand-in
    * with `decoded=false` — the same total-pipeline shape as
    * [[decodeImage]]. */
  def decodeAudio(df: DataFrame, idCol: String = "asset_id",
                  binCol: String = "asset"): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        val decoded =
          try {
            val in = openAudio(bytes)
            val fmt = in.getFormat
            val frames = in.getFrameLength
            val rate = fmt.getSampleRate.toInt
            val durMs = if (rate > 0 && frames >= 0) frames * 1000L / rate else -1L
            in.close()
            Some(Row(id, rate, fmt.getChannels, fmt.getSampleSizeInBits,
              frames, durMs, true))
          } catch { case _: Exception => None }
        decoded.getOrElse {
          val (w, h) = fallbackDims(bytes)
          Row(id, w, h, 0, -1L, -1L, false)
        }
      }
    }
    spark.createDataFrame(rdd, audioSchema)
  }

  /** Synthesize a real PCM16 mono WAV (44-byte RIFF header + deterministic
    * samples from `seed`) — spec-compliant bytes any WAV reader accepts;
    * the audio analogue of [[pngColumn]]. */
  def wavColumn(seed: Column, sampleRate: Column, nSamples: Column): Column = {
    val kernel = udf { (s: Long, rate: Int, n: Int) =>
      val dataLen = n * 2 // PCM16 mono
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(rate)
        .putInt(rate * 2) // byte rate
        .putShort(2) // block align
        .putShort(16) // bits
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < n) {
        bb.putShort((((s * 2654435761L + i * 31L) & 0xFFFFL) - 0x8000L).toShort)
        i += 1
      }
      bb.array()
    }
    kernel(seed, sampleRate, nSamples)
  }

  /** Schema produced by [[resizeImage]]. */
  val resizeSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("decoded", BooleanType)))

  /** Real image resize over a binary column: decode (`ImageIO.read`), then
    * nearest-neighbor downsample to `outW`×`outH` with the explicit integer
    * mapping `src_x = x·W / outW` (floor) — deterministic by construction,
    * unlike AWT's interpolating `getScaledInstance`. Emits the resized
    * raster's exact per-channel pixel sums (longs — the feature-extraction
    * payload, and an arithmetic oracle can recompute them from synthesized
    * pixels). Undecodable bytes take the stand-in dims with zero sums and
    * `decoded=false`, keeping the stage total.
    *
    * Same batch shape as [[decodeImage]]: per-asset work inside
    * `mapPartitions`, no shuffle, no driver round trip. */
  def resizeImage(df: DataFrame, outW: Int, outH: Int,
                  idCol: String = "asset_id",
                  binCol: String = "asset"): DataFrame = {
    require(outW > 0 && outH > 0, "output dims must be positive")
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      inMemoryImageIo
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        val img =
          try ImageIO.read(new ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img != null) {
          val sw = img.getWidth
          val sh = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < outH) {
            val sy = y * sh / outH
            var x = 0
            while (x < outW) {
              val rgb = img.getRGB(x * sw / outW, sy)
              sr += (rgb >> 16) & 0xFF
              sg += (rgb >> 8) & 0xFF
              sb += rgb & 0xFF
              x += 1
            }
            y += 1
          }
          Row(id, outW, outH, sr, sg, sb, true)
        } else {
          val (w, h) = fallbackDims(bytes)
          Row(id, w, h, 0L, 0L, 0L, false)
        }
      }
    }
    spark.createDataFrame(rdd, resizeSchema)
  }

  /** Schema produced by [[sampleFrames]]. */
  val frameSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("decoded", BooleanType)))

  /** Real frame sampling over a multi-frame container column: open an
    * `ImageReader` on the bytes, count frames, and decode every `stride`-th
    * one (the JDK's GIF reader handles multi-image GIFs; a JNI/FFmpeg body
    * slots in for video codecs — the iterator shape is already the
    * production one). One output row per SAMPLED frame with its true
    * decoded dimensions; undecodable bytes produce a single stand-in row
    * with `decoded=false`. */
  def sampleFrames(df: DataFrame, stride: Int,
                   idCol: String = "asset_id",
                   binCol: String = "asset"): DataFrame = {
    require(stride > 0, "stride must be positive")
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      inMemoryImageIo
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        try {
          val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) throw new IllegalArgumentException("no reader")
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            (0 until n by stride).map { i =>
              val f = reader.read(i)
              Row(id, i, f.getWidth, f.getHeight, n, true)
            }
          } finally { reader.dispose(); iis.close() }
        } catch {
          case _: Exception =>
            val (w, h) = fallbackDims(bytes)
            Seq(Row(id, -1, w, h, 0, false))
        }
      }
    }
    spark.createDataFrame(rdd, frameSchema)
  }

  /** Synthesize a real multi-frame GIF (the JDK GIF writer's sequence API,
    * one grayscale frame per index, frame f sized `(width−f·shrink,
    * height−f·shrink)` floored at 1×1 so per-frame dimensions are a closed
    * form of the synthesis parameters) — the test-side generator for
    * frame-sampling round-trips. */
  def gifColumn(seed: Column, width: Column, height: Column,
                nFrames: Column, shrink: Int = 1): Column = {
    val kernel = udf { (s: Long, w: Int, h: Int, n: Int) =>
      inMemoryImageIo
      val bos = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < n) {
          val fw = math.max(1, w - f * shrink)
          val fh = math.max(1, h - f * shrink)
          val img = new java.awt.image.BufferedImage(
            fw, fh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val buf = img.getRaster.getDataBuffer
            .asInstanceOf[java.awt.image.DataBufferByte].getData
          var i = 0
          while (i < buf.length) {
            buf(i) = ((s * 2654435761L + f * 131L + i * 31L) & 0xFFL).toByte
            i += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }
    kernel(seed, width, height, nFrames)
  }

  /** Synthesize a real PNG (`ImageIO.write`, deterministic pixels from
    * `seed`) — the test-side generator for decode round-trips where the
    * container has no sample image corpus. Returns real, spec-compliant
    * PNG bytes any decoder accepts. */
  def pngColumn(seed: Column, width: Column, height: Column): Column = {
    val kernel = udf { (s: Long, w: Int, h: Int) =>
      inMemoryImageIo
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      // fill the raster's backing byte array directly — per-pixel setRGB
      // pays a color-model conversion per call and dominated the encode
      val buf = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferByte].getData
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = (s * 2654435761L + x * 31L + y * 17L) & 0xFFFFFFL
          val o = (y * w + x) * 3
          buf(o) = (rgb & 0xFF).toByte          // B
          buf(o + 1) = ((rgb >> 8) & 0xFF).toByte  // G
          buf(o + 2) = ((rgb >> 16) & 0xFF).toByte // R
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    kernel(seed, width, height)
  }
}
