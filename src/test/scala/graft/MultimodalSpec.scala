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

  test("resize caps payload size and never pads") {
    val docs = Seq((1L, "x" * 100), (2L, "y")).toDF("doc_id", "text")
    val out = Multimodal.withResizedPayload(
        Multimodal.withPayload(docs, "text"), maxBytes = 10)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Array[Byte]]("payload").length === 10)
    assert(out(1).getAs[Array[Byte]]("payload").length === 1)
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
}
