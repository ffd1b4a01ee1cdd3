package graft

import graft.core.T
import graft.operators.MultimodalOps
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = MultimodalOps.withSyntheticMedia(T(spark, sf0001, "documents"))

  test("media column is binary with typed metadata struct") {
    val schema = media.schema
    assert(schema("media").dataType.typeName == "binary")
    val metaFields = schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(metaFields ==
      MultimodalOps.mediaMetaType.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("feature extraction: fixed dims, deterministic across runs") {
    val f1 = MultimodalOps.extractFeatures(media, dims = 16)
      .orderBy($"doc_id").collect()
    val f2 = MultimodalOps.extractFeatures(media, dims = 16)
      .orderBy($"doc_id").collect()
    assert(f1.length == 500)
    assert(f1.forall(_.getSeq[Float](1).length == 16))
    assert(f1.map(_.getSeq[Float](1)).toSeq == f2.map(_.getSeq[Float](1)).toSeq)
  }

  test("decode stub distinguishes different payloads") {
    val a = MultimodalOps.decodeStub("payload-a".getBytes, 8).toSeq
    val b = MultimodalOps.decodeStub("payload-b".getBytes, 8).toSeq
    assert(a != b)
    assert(a == MultimodalOps.decodeStub("payload-a".getBytes, 8).toSeq)
  }
}
