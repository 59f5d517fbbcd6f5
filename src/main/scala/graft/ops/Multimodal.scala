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
}
