package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("decode stub is deterministic and shape-stable") {
    val a = Multimodal.byteMomentFeatures("hello world".getBytes("UTF-8"))
    val b = Multimodal.byteMomentFeatures("hello world".getBytes("UTF-8"))
    assert(a.toSeq === b.toSeq)
    assert(a.length === Multimodal.featureDim)
    assert(Multimodal.byteMomentFeatures(Array.emptyByteArray).toSeq ===
      Seq.fill(Multimodal.featureDim)(0.0f))
  }

  test("payload + mapPartitions decode preserves rows and schema") {
    val docs = Seq((1L, "alpha"), (2L, "beta gamma"), (3L, "")).toDF("doc_id", "text")
    val decoded = Multimodal.decodeFeatures(
      Multimodal.withPayload(docs, "text"), "doc_id")
    assert(decoded.schema === Multimodal.decodedSchema)
    val rows = decoded.orderBy("media_id").collect()
    assert(rows.length === 3)
    assert(rows.map(_.getLong(1)).toSeq === Seq(5L, 10L, 0L))
    assert(rows.forall(_.getSeq[Float](2).length === Multimodal.featureDim))
  }

  test("real PNG decode: known 2x2 pixels give exact pooled features") {
    // hand-built 2x2 gray PNG: pixels 0, 255, 100, 200 (row-major) —
    // every feature is an exact rational of those values
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSample(0, 0, 0, 0)
    img.getRaster.setSample(1, 0, 0, 255)
    img.getRaster.setSample(0, 1, 0, 100)
    img.getRaster.setSample(1, 1, 0, 200)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    assert(Multimodal.isPng(png))
    val f = Multimodal.decodeImageFeatures(png).get
    val mean = (0 + 255 + 100 + 200) / (4.0 * 255.0)
    assert(math.abs(f(0) - mean) < 1e-6 && f(0) === f(1) && f(1) === f(2),
      "gray replicates across channels")
    assert(math.abs(f(3) - mean) < 1e-6)
    // quadrants of a 2x2 are the four pixels themselves
    assert(math.abs(f(4) - 0.0) < 1e-6)
    assert(math.abs(f(5) - 255 / 255.0) < 1e-6)
    assert(math.abs(f(6) - 100 / 255.0) < 1e-6)
    assert(math.abs(f(7) - 200 / 255.0) < 1e-6)
  }

  test("real JPEG decode goes through the codec (lossy: approximate means)") {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpg = bos.toByteArray
    assert(Multimodal.isJpeg(jpg))
    val f = Multimodal.decodeImageFeatures(jpg).get
    // a uniform mid-gray survives JPEG within a few levels
    assert(math.abs(f(3) - 128 / 255.0) < 0.05, s"luma ${f(3)}")
  }

  test("decodeFeatures routes images to the codec and other bytes to the stub") {
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSample(0, 0, 0, 10)
    img.getRaster.setSample(1, 0, 0, 30)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val rows = Multimodal.decodeFeatures(
        Seq((1L, png), (2L, "plain text".getBytes("UTF-8")))
          .toDF("doc_id", "payload"), "doc_id")
      .orderBy("media_id").collect()
    assert(math.abs(rows(0).getSeq[Float](2).head - (10 + 30) / (2 * 255.0f)) < 1e-6,
      "image payload must use the real decode")
    assert(rows(1).getSeq[Float](2).toArray.toSeq ===
      Multimodal.byteMomentFeatures("plain text".getBytes("UTF-8")).toSeq,
      "non-image payload must fall back to the stub")
  }

  test("PNG round-trip stats equal direct byte statistics (losslessness)") {
    // bytes with every edge: >width, exact multiple, empty-ish
    val texts = Seq((1L, "a" * 100), (2L, "b" * 32), (3L, "c"))
    val got = Multimodal.pngRoundTripStats(
        Multimodal.withPayload(texts.toDF("doc_id", "text"), "text"),
        "doc_id", width = 32)
      .orderBy("media_id").collect()
    texts.zip(got).foreach { case ((id, t), r) =>
      val bytes = t.getBytes("UTF-8")
      val h = math.max(1, (bytes.length + 31) / 32)
      assert(r.getLong(0) === id)
      assert(r.getLong(1) === bytes.length.toLong)
      assert(r.getLong(2) === 32L && r.getLong(3) === h.toLong)
      val sum = bytes.map(_ & 0xff).map(_.toLong).sum
      assert(r.getDouble(4) === sum.toDouble / (32L * h), "decoded mean == byte mean")
      assert(r.getLong(5) === bytes.map(_ & 0xff).max.toLong)
    }
  }

  test("payload column is real binary, not base64 text") {
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val schema = Multimodal.withPayload(docs, "text").schema
    assert(schema("payload").dataType.typeName === "binary")
  }

  test("real resize: area-mean kernel, edge clipping, PNG round-trip") {
    // 4×3 gray image with known pixels → ÷2 resize must be 2×2 with
    // floor(block-mean) values; the bottom row blocks are CLIPPED (2×1)
    val src = Array[Byte](
      10, 20, 30, 40,
      50, 60, 70, 80,
      90, 100, 110, 120).map(_.toByte)
    val png = Multimodal.encodeGrayPng(src, 4)
    val thumbBytes = Multimodal.resizeImage(png, 2).get
    assert(Multimodal.isPng(thumbBytes), "re-encode is a real PNG")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(thumbBytes))
    assert(img.getWidth === 2 && img.getHeight === 2)
    val ras = img.getRaster
    assert(ras.getSample(0, 0, 0) === (10 + 20 + 50 + 60) / 4)
    assert(ras.getSample(1, 0, 0) === (30 + 40 + 70 + 80) / 4)
    assert(ras.getSample(0, 1, 0) === (90 + 100) / 2) // clipped 2x1 block
    assert(ras.getSample(1, 1, 0) === (110 + 120) / 2)
    // deterministic: byte-identical re-encode on a second invocation
    assert(Multimodal.resizeImage(png, 2).get.toSeq === thumbBytes.toSeq)
  }

  test("real resize: color images stay color, per-band area means") {
    // 2×2 RGB image → ÷2 resize must be 1×1 whose R/G/B are the floors
    // of the per-band means (exercises the TYPE_3BYTE_BGR output path)
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val px = Array(
      (10, 100, 200), (20, 110, 210),
      (30, 120, 220), (40, 130, 230))
    for (y <- 0 until 2; x <- 0 until 2) {
      val (r, g, b) = px(y * 2 + x)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val thumb = Multimodal.resizeImage(bos.toByteArray, 2).get
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(thumb))
    assert(dec.getWidth === 1 && dec.getHeight === 1)
    assert(dec.getRaster.getNumBands >= 3, "color must stay color")
    val rgb = dec.getRGB(0, 0)
    assert(((rgb >> 16) & 0xff) === (10 + 20 + 30 + 40) / 4)
    assert(((rgb >> 8) & 0xff) === (100 + 110 + 120 + 130) / 4)
    assert((rgb & 0xff) === (200 + 210 + 220 + 230) / 4)
  }

  test("resize passes non-image payloads through untouched") {
    val docs = Seq((1L, "not an image"), (2L, "y")).toDF("doc_id", "text")
    val out = Multimodal.withResizedPayload(
        Multimodal.withPayload(docs, "text"), factor = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Array[Byte]]("payload").toSeq ===
      "not an image".getBytes("UTF-8").toSeq)
    assert(out(1).getAs[Array[Byte]]("payload").toSeq ===
      "y".getBytes("UTF-8").toSeq)
  }

  test("thumbnailStats replays arithmetically from the payload bytes") {
    // 70 bytes at width 32 → 32×3 source (2 pad bytes), thumb 16×2 with a
    // clipped bottom row; recompute the expected stats directly
    val text = ('A' to 'Z').mkString * 3 // 78 chars
    val docs = Seq((5L, text)).toDF("doc_id", "text")
    val r = Multimodal.thumbnailStats(
      Multimodal.withPayload(docs, "text"), "doc_id").collect().head
    val bytes = text.getBytes("UTF-8")
    val h = (bytes.length + 31) / 32
    val th = (h + 1) / 2
    def px(x: Int, y: Int): Int =
      if (y * 32 + x < bytes.length) bytes(y * 32 + x) & 0xff else 0
    val thumb = for (ty <- 0 until th; tx <- 0 until 16) yield {
      val ys = (ty * 2) until math.min(ty * 2 + 2, h)
      val vals = for (y <- ys; x <- (tx * 2) until (tx * 2 + 2)) yield px(x, y)
      vals.sum / vals.length
    }
    assert(r.getLong(1) === bytes.length.toLong)
    assert(r.getLong(2) === 32L && r.getLong(3) === h.toLong)
    assert(r.getLong(4) === 16L && r.getLong(5) === th.toLong)
    assert(r.getDouble(6) === thumb.sum.toDouble / (16 * th))
    assert(r.getLong(7) === thumb.max.toLong)
  }

  test("frame sampling fans one media row into every-Nth frame rows") {
    // 5 "frames" of 4 bytes (last partial), keep every 2nd → idx 0, 2, 4
    val docs = Seq((7L, "abcdefghijklmnopq")).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(
        Multimodal.withPayload(docs, "text"), "doc_id",
        everyN = 2, frameBytes = 4)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getInt(1)).toSeq === Seq(0, 2, 4))
    assert(frames.map(r => new String(r.getAs[Array[Byte]]("frame"))).toSeq ===
      Seq("abcd", "ijkl", "q"))
    assert(frames.forall(_.getLong(0) === 7L))
  }

  test("mjpeg demux recovers exactly the encoded frames, bytes intact") {
    val payload = (0 until 1000).map(i => ((i * 37 + 11) % 256).toByte).toArray
    val stream = Multimodal.encodeMjpeg(payload, width = 16, frameBytes = 64)
    val frames = Multimodal.demuxMjpeg(stream)
    assert(frames.length === 16, "ceil(1000/64) frames expected")
    // marker-scan boundaries must hit the writer's exact frame bytes:
    // re-encoding each source slice reproduces each demuxed frame
    frames.zipWithIndex.foreach { case (f, i) =>
      val slice = java.util.Arrays.copyOfRange(payload,
        i * 64, math.min((i + 1) * 64, payload.length))
      assert(f.toSeq === Multimodal.encodeGray(slice, 16, "jpg").toSeq,
        s"frame $i bytes differ from the encoder's output")
    }
    // every frame actually decodes through the JDK codec
    frames.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null && img.getWidth === 16)
    }
    // a truncated stream (cut mid-frame) salvages the complete prefix
    val cut = java.util.Arrays.copyOf(stream, stream.length - 10)
    assert(Multimodal.demuxMjpeg(cut).length === 15)
    assert(Multimodal.demuxMjpeg(Array.emptyByteArray).isEmpty)
  }

  test("wav round-trip stats equal direct byte statistics (PCM losslessness)") {
    val docs = Seq((1L, "hello world"), (2L, ""), (3L, "\u0000\u0001xyz"))
      .toDF("doc_id", "text")
    val rows = Multimodal.wavRoundTripStats(
        Multimodal.withPayload(docs, "text"), "doc_id")
      .orderBy("media_id").collect()
    docs.collect().sortBy(_.getLong(0)).zip(rows).foreach { case (d, r) =>
      val bytes = d.getString(1).getBytes("UTF-8")
      assert(r.getLong(1) === bytes.length.toLong, "n_bytes")
      // the DECODER's view: sample count and rate come from parsing the
      // real WAV container, and PCM preserves every byte
      assert(r.getLong(2) === bytes.length.toLong, "n_samples via codec")
      assert(r.getDouble(3) === 8000.0, "sample_rate via codec")
      val expMean = if (bytes.isEmpty) 0.0
        else bytes.map(_ & 0xff).map(_.toLong).sum.toDouble / bytes.length
      assert(r.getDouble(4) === expMean, "mean_amp")
      val expMax = if (bytes.isEmpty) 0L
        else bytes.map(_ & 0xff).max.toLong
      assert(r.getLong(5) === expMax, "max_amp")
    }
  }

  test("mjpeg frame stats: real decode geometry + lossy-bounded brightness") {
    val docs = Seq((1L, "x" * 200), (2L, "ab"), (3L, "")).toDF("doc_id", "text")
    val rows = Multimodal.mjpegFrameStats(
        Multimodal.withPayload(docs, "text"), "doc_id",
        width = 16, frameBytes = 64, everyN = 2)
      .orderBy("media_id", "frame_idx").collect()
    // doc 1: ceil(200/64)=4 frames, sampled 0 and 2; doc 2: one 2-byte
    // frame; doc 3: empty payload → no frames
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((1L, 0), (1L, 2), (2L, 0)))
    rows.foreach { r =>
      val (w, h, n) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(w === 16L && h === math.max(1L, (n + 15) / 16))
      // JPEG is lossy but the frame MEAN (DC-dominated) stays close to
      // the ideal lossless brightness of the zero-padded source slice
      assert(math.abs(r.getDouble(5) - r.getDouble(6)) <= 24.0,
        s"decoded brightness drifted: $r")
    }
    // uniform payload ('x'*200): source mean of a full frame is exactly
    // 120; the decoded mean of a uniform image must be within a few units
    val full = rows.head
    assert(full.getDouble(5) === 120.0)
    assert(math.abs(full.getDouble(6) - 120.0) <= 4.0)
  }

  test("aHash: equals the byte-arithmetic reference; near-dups land close") {
    import spark.implicits._
    import graft.ops.Multimodal
    val base = ("The quick brown fox jumps over the lazy dog. " * 8).trim
    // doc 2 = doc 1 verbatim; doc 3 = one flipped char (near-dup image);
    // doc 4 = unrelated
    val docs = Seq(
      (1L, base), (2L, base),
      (3L, base.updated(10, 'X')),
      (4L, ("Entirely different pixels here! " * 12).trim))
      .toDF("doc_id", "text")
    val got = Multimodal.pngAHash64(
        Multimodal.withPayload(docs, "text"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // byte-arithmetic reference: decode must reproduce the source bytes,
    // so the hash is a pure function of them (the round-trip proof at
    // the hash level)
    def ref(text: String): Long = {
      val bytes = text.getBytes("UTF-8")
      val h = math.max(1, (bytes.length + 31) / 32)
      val v = (0 until 64).map { q =>
        val rr = ((2 * (q / 8) + 1) * h) / 16
        val cc = (2 * (q % 8) + 1) * 2
        val i = rr * 32 + cc
        if (i < bytes.length) (bytes(i) & 0xff).toLong else 0L
      }
      val tot = v.sum
      v.zipWithIndex.foldLeft(0L) { case (acc, (x, q)) =>
        if (x * 64L >= tot) acc | (1L << q) else acc
      }
    }
    assert(got(1L) === ref(base))
    assert(got(4L) === ref(("Entirely different pixels here! " * 12).trim))
    // identical payloads → identical hashes (hamming 0)
    assert(got(1L) === got(2L))
    // a one-char edit moves at most a couple of sampled cells
    assert(java.lang.Long.bitCount(got(1L) ^ got(3L)) <= 4)
    // the pair stage finds the dup pair at hamming 0 through the buckets
    val pairs = graft.ops.Dedup.hammingPairs64(
        Multimodal.pngAHash64(Multimodal.withPayload(docs, "text"), "doc_id"),
        col("doc_id"), col("ahash"), maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 === 1L && p._2 === 2L && p._3 === 0L))
  }
}
