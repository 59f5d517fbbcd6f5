package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` payloads + typed
  * metadata, decoded per-partition.
  *
  * The decode itself is STUBBED (no image/audio codecs in this container):
  * [[decodeStub]] produces a deterministic fake feature vector from the
  * bytes. Everything around it is the real 100 TB design and is what the
  * spec tests:
  *  - payloads travel as parquet binary (no base64 blow-up, scan-prunable
  *    metadata columns next to them);
  *  - decode runs via mapPartitions so a real codec would amortize its init
  *    (model load, JNI handles) once per partition, not per row;
  *  - output schema is fixed (id, n_bytes, feature vector) so downstream
  *    similarity/dedup ops compose directly.
  */
object Multimodal {

  val featureDim = 8

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB decode: a real implementation would hand `bytes` to a codec and
    * produce e.g. a pooled image embedding. The fake is a byte-histogram
    * moment vector — deterministic, shape-identical to the real thing.
    */
  private[graft] def decodeStub(bytes: Array[Byte]): Array[Float] = {
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
    * One pass, no shuffle; codec init would happen once per partition here.
    */
  def decodeFeatures(df: DataFrame, idCol: String): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    df.select(col(idCol).cast("long"), col("payload"))
      .mapPartitions { rows =>
        // per-partition init for a real codec would go here
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          Row(id, bytes.length.toLong, decodeStub(bytes).toSeq)
        }
      }(enc)
  }

  /** STUB resize: a real implementation re-encodes the image at a target
    * resolution; the fake deterministically truncates/pads to `maxBytes`.
    * Shape contract (binary in → smaller binary out) is what matters.
    */
  private[graft] def resizeStub(bytes: Array[Byte], maxBytes: Int): Array[Byte] =
    if (bytes.length >= maxBytes) java.util.Arrays.copyOf(bytes, maxBytes)
    else java.util.Arrays.copyOf(bytes, bytes.length) // never pad real media

  /** Resize payloads in place (binary → binary, per-partition, no shuffle). */
  def withResizedPayload(df: DataFrame, maxBytes: Int): DataFrame = {
    val schema = StructType(df.schema.fields.map {
      case f if f.name == "payload" => f.copy(nullable = false)
      case f => f
    })
    val enc = RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val vals = r.toSeq.toArray
        vals(idx) = resizeStub(r.getAs[Array[Byte]](idx), maxBytes)
        Row(vals: _*)
      }
    }(enc)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** STUB frame sampling: a real implementation demuxes a video and keeps
    * every Nth frame; the fake treats each `frameBytes` slice of the payload
    * as one "frame". The plumbing is the real design: one media row fans out
    * to per-frame rows (media_id, frame_idx, frame) inside mapPartitions —
    * no shuffle, no driver involvement — and each frame row then composes
    * with decodeFeatures / similarity / dedup like any other payload.
    */
  def sampleFrames(df: DataFrame, idCol: String, everyN: Int,
      frameBytes: Int = 1024): DataFrame = {
    require(everyN > 0 && frameBytes > 0)
    val enc = RowEncoder.encoderFor(frameSchema)
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
