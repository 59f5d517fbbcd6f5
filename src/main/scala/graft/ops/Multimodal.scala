package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` payloads + typed
  * metadata, decoded per-partition.
  *
  * IMAGE decode is REAL since round 8: the JDK ships PNG/JPEG codecs in
  * `javax.imageio` — no container library needed — so PNG/JPEG payloads
  * go through an actual codec to pooled-pixel features
  * ([[decodeImageFeatures]]) and the registered query round-trips every
  * document's bytes through a real PNG encode → decode
  * ([[pngRoundTripStats]]; PNG is lossless, so the decoded pixel
  * statistics replay arithmetically in the DuckDB oracle). VIDEO is
  * real since round 9: MJPEG streams (concatenated baseline JPEGs — the
  * IP-camera wire format) demux by SOI/EOI marker scan and decode
  * per-frame through the same JDK codec ([[mjpegFrameStats]]); audio
  * decode is real 8-bit PCM WAV through javax.sound
  * ([[wavRoundTripStats]], q_audio_features).
  *
  * The surrounding plumbing is the 100 TB design and is what the spec
  * tests:
  *  - payloads travel as parquet binary (no base64 blow-up, scan-prunable
  *    metadata columns next to them);
  *  - decode runs via mapPartitions so the codec init amortizes once per
  *    partition, not per row;
  *  - output schema is fixed (id, n_bytes, feature vector) so downstream
  *    similarity/dedup ops compose directly.
  */
object Multimodal {

  // ImageIO's DEFAULT stream cache is DISK-backed: every read/write wraps
  // its stream in a FileCache{Input,Output}Stream — one temp-file create +
  // write + delete PER CODEC CALL, even when the source/sink is already an
  // in-memory byte array (every call site here). Single-threaded that is a
  // hidden constant tax; under the spread decode scan it is a scalability
  // collapse — File.createTempFile funnels 32 decode threads through one
  // synchronized random-name generator and the filesystem (measured at
  // sf0.1: the 32-way q_video_frames decode ran 3.4× SLOWER than the
  // 1-task plan, load ~29, all contention). Memory-backed caching is
  // strictly right for byte-array media and is set ONCE per JVM here —
  // object init runs on any executor before the first codec call, since
  // every kernel below is a method of this object.
  //
  // REFACTOR INVARIANT (r18 ADVICE #4): the executor-side guarantee rests
  // on "every codec call is a method of THIS object" — a decode inlined
  // into another object's closure (or a lambda capturing ImageIO calls
  // directly) would run on executors that never initialized Multimodal
  // and silently re-enter the disk-cache regime. Keep every
  // ImageIO.read/write call inside this object; if one must move, move
  // the setUseCache(false) call into the new home's initializer too.
  javax.imageio.ImageIO.setUseCache(false)

  val featureDim = 8

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  // ---- real image codec path (JDK javax.imageio) ----

  private[graft] def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xff) == 0x89 &&
      b(1) == 'P'.toByte && b(2) == 'N'.toByte && b(3) == 'G'.toByte

  private[graft] def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  /** Encode raw bytes as an 8-bit grayscale image in `format`, `width`
    * pixels wide, row-major, zero-padded to fill the last row — the
    * deterministic image constructor behind [[pngRoundTripStats]],
    * [[encodeMjpeg]] and the specs (the testdata carries no real media;
    * this manufactures real PNGs/JPEGs from it so the DECODE side
    * exercises the actual codec).
    */
  private[graft] def encodeGray(bytes: Array[Byte], width: Int,
      format: String): Array[Byte] = {
    require(width > 0)
    val h = math.max(1, (bytes.length + width - 1) / width)
    val img = new java.awt.image.BufferedImage(
      width, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val ras = img.getRaster
    var i = 0
    val n = width * h
    while (i < n) {
      ras.setSample(i % width, i / width, 0,
        if (i < bytes.length) bytes(i) & 0xff else 0)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  private[graft] def encodeGrayPng(bytes: Array[Byte], width: Int): Array[Byte] =
    encodeGray(bytes, width, "png")

  // ---- real video path: MJPEG demux + per-frame JDK decode ----

  /** Manufacture an MJPEG-style stream: each `frameBytes` slice of the
    * payload becomes one REAL baseline grayscale JPEG (JDK codec), frames
    * concatenated back-to-back — the motion-JPEG layout IP cameras and
    * `multipart/x-mixed-replace` HTTP streams emit (sans the HTTP part
    * boundaries, which carry no video semantics).
    */
  private[graft] def encodeMjpeg(bytes: Array[Byte], width: Int,
      frameBytes: Int): Array[Byte] = {
    require(frameBytes > 0)
    val bos = new java.io.ByteArrayOutputStream()
    var from = 0
    while (from < bytes.length) {
      val until = math.min(from + frameBytes, bytes.length)
      bos.write(encodeGray(
        java.util.Arrays.copyOfRange(bytes, from, until), width, "jpg"))
      from = until
    }
    bos.toByteArray
  }

  /** REAL demux: split a concatenated-JPEG stream into frames on SOI
    * (FF D8) / EOI (FF D9) marker pairs — the same marker scan real
    * MJPEG demuxers perform. Sound because within a baseline JPEG's
    * entropy-coded data every 0xFF is byte-stuffed (FF 00) or a restart
    * marker (FF D0-D7), so EOI cannot occur mid-frame; table/header
    * segments are length-prefixed structures the JDK writer never fills
    * with marker sequences. A truncated trailing frame (no EOI) is
    * dropped — the standard salvage behavior for a cut-off stream.
    */
  private[graft] def demuxMjpeg(stream: Array[Byte]): Vector[Array[Byte]] = {
    val out = Vector.newBuilder[Array[Byte]]
    var i = 0
    while (i + 1 < stream.length) {
      if ((stream(i) & 0xff) == 0xff && (stream(i + 1) & 0xff) == 0xd8) {
        var j = i + 2
        var end = -1
        while (end < 0 && j + 1 < stream.length) {
          if ((stream(j) & 0xff) == 0xff && (stream(j + 1) & 0xff) == 0xd9)
            end = j + 2
          j += 1
        }
        if (end < 0) i = stream.length // truncated tail: drop
        else { out += java.util.Arrays.copyOfRange(stream, i, end); i = end }
      } else i += 1
    }
    out.result()
  }

  val videoFrameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_w", LongType, nullable = false),
    StructField("frame_h", LongType, nullable = false),
    StructField("n_src_bytes", LongType, nullable = false),
    StructField("mean_src_px", DoubleType, nullable = false),
    StructField("decoded_mean_px", DoubleType, nullable = false)))

  /** The REAL video path (closes the last round-8 stub): every payload
    * becomes a true MJPEG stream ([[encodeMjpeg]]), is demuxed back into
    * frames by marker scan ([[demuxMjpeg]]), and every `everyN`-th frame
    * is decoded through the JDK JPEG codec — demux, frame sampling and
    * decode are all real; only the stream itself is manufactured (the
    * testdata has no media column).
    *
    * Oracle-checkable vs spec-pinned columns, deliberately split:
    * `frame_w`/`frame_h` come from the DECODED image — a demux boundary
    * bug or codec defect changes them (or kills the frame count), so the
    * driver hash re-proves the real decode every round; they replay in
    * SQL as (width, ceil(sliceLen/width)). `mean_src_px` is the ideal
    * (lossless) frame brightness from the SOURCE slice — replayable
    * arithmetic. `decoded_mean_px` is the ACTUAL decoded brightness:
    * JPEG is lossy, so it is NOT SQL-replayable and the registered query
    * must drop it; MultimodalSpec pins |decoded − src| instead (the
    * fidelity argument a lossless PNG gets for free in
    * [[pngRoundTripStats]]).
    *
    * Scale shape: mapPartitions, zero shuffle; codec state is JVM-static;
    * each frame's work is O(frameBytes). A row fans out to its sampled
    * frames only — the everyN sampling cuts decode cost, not demux cost,
    * exactly like real frame-sampled video ingestion.
    */
  def mjpegFrameStats(df: DataFrame, idCol: String, width: Int = 16,
      frameBytes: Int = 64, everyN: Int = 2): DataFrame = {
    require(everyN > 0)
    val enc = RowEncoder.encoderFor(videoFrameSchema)
    Spread.cpuBound(df.select(col(idCol).cast("long"), col("payload")))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val frames = demuxMjpeg(encodeMjpeg(bytes, width, frameBytes))
          // the demux must recover EXACTLY the encoded frame count — a
          // boundary bug surfaces as a loud task failure, never as
          // silently shifted frames
          val expect = (bytes.length + frameBytes - 1) / frameBytes
          require(frames.length == expect,
            s"mjpeg demux recovered ${frames.length} of $expect frames " +
              s"for media $id")
          (0 until frames.length by everyN).iterator.map { fi =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(frames(fi)))
            require(img != null, s"frame $fi of media $id failed to decode")
            val w = img.getWidth
            val h = img.getHeight
            val from = fi * frameBytes
            val until = math.min(from + frameBytes, bytes.length)
            var srcSum = 0L
            var k = from
            while (k < until) { srcSum += bytes(k) & 0xff; k += 1 }
            val ras = img.getRaster
            var decSum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { decSum += ras.getSample(x, y, 0); x += 1 }
              y += 1
            }
            val nPx = w.toLong * h
            Row(id, fi, w.toLong, h.toLong, (until - from).toLong,
              srcSum.toDouble / nPx, decSum.toDouble / nPx)
          }
        }
      }(enc)
  }

  /** REAL decode: PNG/JPEG bytes → pooled-pixel feature vector through
    * the JDK codec. Features (all in [0,1]): mean R, mean G, mean B,
    * mean luma, and the four quadrant mean lumas — the classic cheap
    * pooled-image descriptor. Pixels are read from the RASTER (raw
    * samples), not getRGB: gray images would otherwise pass through a
    * linear-gray → sRGB color transform and the values would no longer
    * be the encoded bytes. Sums accumulate in exact integer arithmetic;
    * each feature is one IEEE division — deterministic on any executor.
    * Returns None when the payload is not a decodable image (caller
    * falls back to [[byteMomentFeatures]]).
    */
  private[graft] def decodeImageFeatures(bytes: Array[Byte]): Option[Array[Float]] = {
    if (!isPng(bytes) && !isJpeg(bytes)) return None
    // a payload can pass the magic sniff and still be undecodable (truncated
    // IDAT, CMYK JPEG the JDK reader rejects) — ImageIO then THROWS rather
    // than returning null; the never-throw fallback contract means that too
    // must fall back to the byte-moment signature, not fail the task
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return None
    val ras = img.getRaster
    val w = img.getWidth
    val h = img.getHeight
    val bands = ras.getNumBands
    val chSum = new Array[Long](3)
    val quad = new Array[Long](4)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // gray images replicate their single band across R/G/B
        val r = ras.getSample(x, y, 0)
        val g = if (bands >= 3) ras.getSample(x, y, 1) else r
        val b = if (bands >= 3) ras.getSample(x, y, 2) else r
        chSum(0) += r; chSum(1) += g; chSum(2) += b
        quad((if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)) +=
          (r + g + b)
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    val wl = (w + 1) / 2; val ht = (h + 1) / 2
    val qn = Array[Long](wl.toLong * ht, (w - wl).toLong * ht,
      wl.toLong * (h - ht), (w - wl).toLong * (h - ht))
    val f = new Array[Float](featureDim)
    f(0) = (chSum(0).toDouble / (n * 255.0)).toFloat
    f(1) = (chSum(1).toDouble / (n * 255.0)).toFloat
    f(2) = (chSum(2).toDouble / (n * 255.0)).toFloat
    f(3) = ((chSum(0) + chSum(1) + chSum(2)).toDouble / (n * 765.0)).toFloat
    var q = 0
    while (q < 4) {
      f(4 + q) =
        if (qn(q) == 0L) 0.0f
        else (quad(q).toDouble / (qn(q) * 765.0)).toFloat
      q += 1
    }
    Some(f)
  }

  val imageStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("img_w", LongType, nullable = false),
    StructField("img_h", LongType, nullable = false),
    StructField("mean_px", DoubleType, nullable = false),
    StructField("max_px", LongType, nullable = false)))

  /** The REGISTERED image path: each payload is encoded as a real
    * grayscale PNG and decoded back through the JDK codec, emitting the
    * decoded image's pixel statistics. Because PNG is lossless and the
    * image is constructed from the payload bytes, the decoded statistics
    * equal the byte statistics — which is exactly what makes a real
    * codec round-trip DRIVER-CHECKABLE: the DuckDB oracle replays the
    * stats arithmetically from the bytes, and any decode defect
    * (color-space transform, padding bug, truncation) breaks the hash.
    * Per-partition mapPartitions, no shuffle; sums exact integers, one
    * IEEE division per row.
    */
  def pngRoundTripStats(df: DataFrame, idCol: String, width: Int = 32): DataFrame = {
    val enc = RowEncoder.encoderFor(imageStatsSchema)
    Spread.cpuBound(df.select(col(idCol).cast("long"), col("payload")))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val png = encodeGrayPng(bytes, width)
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
          val ras = img.getRaster
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0L
          var max = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = ras.getSample(x, y, 0)
              sum += v
              if (v > max) max = v
              x += 1
            }
            y += 1
          }
          Row(id, bytes.length.toLong, w.toLong, h.toLong,
            sum.toDouble / (w.toLong * h), max)
        }
      }(enc)
  }

  /** 64-bit perceptual AVERAGE HASH (aHash) per image: payload → real PNG
    * encode → real JDK decode → 8×8 nearest-neighbor downsample of the
    * decoded raster (sample at the cell centers — never-empty even for
    * images shorter than 8 rows, which this corpus's 2-19-row images
    * are) → one bit per sample, set iff sample ≥ the 64-sample mean
    * (compared as v·64 ≥ Σv: exact integers, ties set the bit — the same
    * rule the oracle replays). The standard image-dedup fingerprint
    * (aHash; pHash's DCT sibling) with the codec step REAL: a decode
    * defect — color transform, padding, truncation — flips bits and
    * hash-fails downstream. mapPartitions, no shuffle, one pass.
    */
  def pngAHash64(df: DataFrame, idCol: String, width: Int = 32): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    Spread.cpuBound(df.select(col(idCol).cast("long"), col("payload")))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val png = encodeGrayPng(bytes, width)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(png))
          val ras = img.getRaster
          val w = img.getWidth
          val h = img.getHeight
          val v = new Array[Long](64)
          var tot = 0L
          var q = 0
          while (q < 64) {
            val rr = (((2 * (q / 8) + 1) * h) / 16).toInt
            val cc = ((2 * (q % 8) + 1) * w) / 16
            v(q) = ras.getSample(cc, rr, 0).toLong
            tot += v(q)
            q += 1
          }
          var hash = 0L
          q = 0
          while (q < 64) {
            if (v(q) * 64L >= tot) hash |= (1L << q)
            q += 1
          }
          Row(id, hash)
        }
      }(enc)
  }

  // ---- real audio path: WAV PCM through javax.sound ----

  /** Encode raw bytes as an 8-bit unsigned mono PCM WAV at `sampleRate` —
    * the audio sibling of [[encodeGray]]: the testdata carries no media,
    * so the payload bytes BECOME the PCM samples and the real JDK codec
    * (javax.sound.sampled) does the container work both ways.
    */
  private[graft] def encodePcmWav(bytes: Array[Byte],
      sampleRate: Float = 8000f): Array[Byte] = {
    // 8-bit unsigned, mono, frame = 1 byte: samples are exactly the bytes
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 8, 1,
      false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, bytes.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  val audioStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sample_rate", DoubleType, nullable = false),
    StructField("mean_amp", DoubleType, nullable = false),
    StructField("max_amp", LongType, nullable = false)))

  /** REAL audio decode: each payload becomes a true PCM WAV
    * ([[encodePcmWav]]) and is decoded back through javax.sound's WAV
    * parser, emitting the decoded sample statistics. PCM is LOSSLESS, so
    * — exactly like [[pngRoundTripStats]] — the decoded stats replay
    * arithmetically from the source bytes in the DuckDB oracle, and any
    * container-parse defect (header offset, sample width, rate) breaks
    * the hash: `n_samples` and `sample_rate` come from the DECODER's
    * view of the file, not from the inputs. mapPartitions, no shuffle,
    * exact integer sums, one IEEE division per row.
    */
  def wavRoundTripStats(df: DataFrame, idCol: String): DataFrame = {
    val enc = RowEncoder.encoderFor(audioStatsSchema)
    // NOT spread (measured r18): AudioSystem.getAudioInputStream funnels
    // every call through the synchronized provider registry, so a 32-way
    // decode scan CONTENDS (0.83s 1-task → 3.1s spread at sf0.1); the PCM
    // parse itself is cheap enough that the narrow scan wins.
    df.select(col(idCol).cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(encodePcmWav(bytes)))
          val fmt = ais.getFormat
          val samples = ais.readAllBytes()
          var sum = 0L
          var max = 0L
          var i = 0
          while (i < samples.length) {
            val v = samples(i) & 0xff
            sum += v
            if (v > max) max = v
            i += 1
          }
          Row(id, bytes.length.toLong, samples.length.toLong,
            fmt.getSampleRate.toDouble,
            sum.toDouble / math.max(1L, samples.length), max)
        }
      }(enc)
  }

  /** Feature extractor for OPAQUE (non-image) payloads — real images go
    * through [[decodeImageFeatures]]: a deterministic byte-histogram
    * moment vector (mean byte value per position class, normalized to
    * [0,1]), shape-identical to the codec output so mixed-media batches
    * carry one feature schema. This is not a placeholder for a missing
    * codec: a payload with no decodable media type has no pixels, and
    * byte-distribution moments ARE its honest content signature (the
    * same family of features magic-number classifiers and entropy
    * scanners use on unknown binaries).
    */
  private[graft] def byteMomentFeatures(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](featureDim)
    var i = 0
    while (i < bytes.length) {
      acc(i % featureDim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    if (bytes.length > 0) {
      var j = 0
      while (j < featureDim) { acc(j) /= bytes.length; j += 1 }
    }
    acc
  }

  /** Attach an opaque binary payload column (here: the utf8 bytes of a text
    * column — the testdata has no real media; the parquet/bin plumbing is
    * identical).
    */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** Decode payloads per-partition: (media_id, payload) → decodedSchema.
    * One pass, no shuffle. PNG/JPEG payloads decode through the REAL JDK
    * codec ([[decodeImageFeatures]] — magic-sniffed); anything else gets
    * the deterministic byte-moment signature so mixed-media batches
    * never throw.
    */
  def decodeFeatures(df: DataFrame, idCol: String): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    Spread.cpuBound(df.select(col(idCol).cast("long"), col("payload")))
      .mapPartitions { rows =>
        // codec instances are JVM-static (ImageIO registry) — the
        // per-partition init a heavier codec would need goes here
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val feats = decodeImageFeatures(bytes).getOrElse(byteMomentFeatures(bytes))
          Row(id, bytes.length.toLong, feats.toSeq)
        }
      }(enc)
  }

  /** REAL resize (round 10 — retires the last stub): decode the payload
    * through the JDK codec, downsample by integer `factor` with an
    * AREA-MEAN kernel — each output pixel is the floor of the mean of its
    * factor×factor source block, clipped at the bottom/right edges — and
    * re-encode through the real PNG writer. Why an explicit kernel and
    * not Graphics2D: Java2D's interpolated sample values are
    * implementation-defined, while this kernel is exact integer
    * arithmetic, so the thumbnail's pixels are arithmetically replayable
    * from the source bytes — which is what lets the driver's DuckDB
    * oracle hash-check the whole decode → resize → re-encode → decode
    * chain ([[thumbnailStats]] / q_image_thumbnail) instead of trusting a
    * spec. Gray stays gray (1 band); color stays color (3 bands,
    * per-band means). Returns None for a payload that is not a decodable
    * image — the caller decides pass-through vs drop.
    */
  private[graft] def resizeImage(bytes: Array[Byte],
      factor: Int): Option[Array[Byte]] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    if (!isPng(bytes) && !isJpeg(bytes)) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return None
    val ras = img.getRaster
    val w = img.getWidth
    val h = img.getHeight
    val bands = if (ras.getNumBands >= 3) 3 else 1
    val tw = (w + factor - 1) / factor
    val th = (h + factor - 1) / factor
    val out = new java.awt.image.BufferedImage(tw, th,
      if (bands == 3) java.awt.image.BufferedImage.TYPE_3BYTE_BGR
      else java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val ors = out.getRaster
    var ty = 0
    while (ty < th) {
      var tx = 0
      while (tx < tw) {
        val x0 = tx * factor; val y0 = ty * factor
        val x1 = math.min(x0 + factor, w); val y1 = math.min(y0 + factor, h)
        val cnt = (x1 - x0).toLong * (y1 - y0)
        var b = 0
        while (b < bands) {
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { sum += ras.getSample(x, y, b); x += 1 }
            y += 1
          }
          ors.setSample(tx, ty, b, (sum / cnt).toInt) // floor: non-negative
          b += 1
        }
        tx += 1
      }
      ty += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    Some(bos.toByteArray)
  }

  /** Resize image payloads in place (binary → binary, per-partition, no
    * shuffle): PNG/JPEG payloads come back as area-mean ÷factor PNG
    * thumbnails; non-image payloads pass through UNTOUCHED — a
    * media-specific transform must never corrupt a mixed-media batch.
    */
  def withResizedPayload(df: DataFrame, factor: Int): DataFrame = {
    val schema = StructType(df.schema.fields.map {
      case f if f.name == "payload" => f.copy(nullable = false)
      case f => f
    })
    val enc = RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val vals = r.toSeq.toArray
        val bytes = r.getAs[Array[Byte]](idx)
        vals(idx) = resizeImage(bytes, factor).getOrElse(bytes)
        Row(vals: _*)
      }
    }(enc)
  }

  val thumbnailSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("src_w", LongType, nullable = false),
    StructField("src_h", LongType, nullable = false),
    StructField("thumb_w", LongType, nullable = false),
    StructField("thumb_h", LongType, nullable = false),
    StructField("mean_thumb_px", DoubleType, nullable = false),
    StructField("max_thumb_px", LongType, nullable = false)))

  /** The REGISTERED thumbnail path (q_image_thumbnail): payload → real
    * grayscale PNG (pixels = payload bytes, `width` wide, zero-padded) →
    * JDK decode → area-mean ÷`factor` resize ([[resizeImage]]) → PNG
    * re-encode → JDK decode AGAIN → pixel stats of the decoded
    * thumbnail. Two full codec round-trips with the resize kernel
    * between them, in one mapPartitions pass — zero shuffle, linear and
    * partition-parallel at any scale. Every stage is exact integer
    * arithmetic on the payload bytes, so the DuckDB oracle replays the
    * thumbnail stats from the blob and a defect ANYWHERE in the chain
    * (padding, kernel edge clipping, re-encode, second decode)
    * hash-fails at the driver.
    */
  def thumbnailStats(df: DataFrame, idCol: String, width: Int = 32,
      factor: Int = 2): DataFrame = {
    val enc = RowEncoder.encoderFor(thumbnailSchema)
    Spread.cpuBound(df.select(col(idCol).cast("long"), col("payload")))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val thumb = resizeImage(encodeGrayPng(bytes, width), factor)
            .getOrElse(sys.error("unreachable: encodeGrayPng emits PNG"))
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(thumb))
          val ras = img.getRaster
          val tw = img.getWidth
          val th = img.getHeight
          var sum = 0L
          var max = 0L
          var y = 0
          while (y < th) {
            var x = 0
            while (x < tw) {
              val v = ras.getSample(x, y, 0)
              sum += v
              if (v > max) max = v
              x += 1
            }
            y += 1
          }
          val srcH = math.max(1, (bytes.length + width - 1) / width)
          Row(id, bytes.length.toLong, width.toLong, srcH.toLong,
            tw.toLong, th.toLong, sum.toDouble / (tw.toLong * th), max)
        }
      }(enc)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** GENERIC byte-slice frame sampling: treats each `frameBytes` slice of
    * the payload as one "frame" — the container-agnostic slicer for
    * fixed-record media (raw video, PCM audio); container formats go
    * through the real demux ([[mjpegFrameStats]]). One media row fans out
    * to per-frame rows (media_id, frame_idx, frame) inside mapPartitions —
    * no shuffle, no driver involvement — and each frame row composes with
    * decodeFeatures / similarity / dedup like any other payload.
    */
  def sampleFrames(df: DataFrame, idCol: String, everyN: Int,
      frameBytes: Int = 1024): DataFrame = {
    require(everyN > 0 && frameBytes > 0)
    val enc = RowEncoder.encoderFor(frameSchema)
    // NOT spread (measured r18): the kernel is pure array slicing — the
    // round-robin exchange of the payload bytes costs more than the scan
    // (0.19s 1-task → 0.67s spread at sf0.1). Codec-free paths stay narrow.
    df.select(col(idCol).cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val nFrames = (bytes.length + frameBytes - 1) / frameBytes
          (0 until nFrames by everyN).iterator.map { f =>
            val from = f * frameBytes
            val until = math.min(from + frameBytes, bytes.length)
            Row(id, f, java.util.Arrays.copyOfRange(bytes, from, until))
          }
        }
      }(enc)
  }
}
