package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("decode stub is deterministic and shape-stable") {
    val a = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val b = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert(a.toSeq === b.toSeq)
    assert(a.length === Multimodal.featureDim)
    assert(Multimodal.decodeStub(Array.emptyByteArray).toSeq ===
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

  test("payload column is real binary, not base64 text") {
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val schema = Multimodal.withPayload(docs, "text").schema
    assert(schema("payload").dataType.typeName === "binary")
  }
}
