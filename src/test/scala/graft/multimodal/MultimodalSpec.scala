package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((0L, "hello world"), (1L, "another document"), (2L, ""))
    .toDF("doc_id", "text")

  test("withFakeMedia: binary payload + typed metadata struct") {
    val media = Multimodal.withFakeMedia(docs, "doc_id", "text")
    val sch = media.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(sch("payload") == "binary")
    assert(sch("meta").startsWith("struct<kind:string,width:int,height:int"))
    val r = media.where($"doc_id" === 0L)
      .select(length($"payload"), $"meta.kind").head()
    assert(r.getInt(0) == 11 && r.getString(1) == "image")
  }

  test("decodeFeatures: batched stub decode, fixed dim, deterministic") {
    val media = Multimodal.withFakeMedia(docs, "doc_id", "text")
    val f1 = Multimodal.decodeFeatures(media, "doc_id", dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.decodeFeatures(media, "doc_id", dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1.keySet == Set(0L, 1L, 2L))
    assert(f1(0L).length == 8)
    assert(f1 == f2)                 // deterministic
    assert(f1(2L).forall(_ == 0f))   // empty payload → zero vector
    assert(f1(0L).exists(_ != 0f))
  }

  test("stub media transforms are byte-level and bounded") {
    val media = Multimodal.withFakeMedia(docs, "doc_id", "text")
    val r = media.select(
      length(Multimodal.resizeStub($"payload", 4)).as("r"),
      length(Multimodal.frameSampleStub($"payload", 3, 2)).as("f"))
      .where(length($"payload") > 6).head()
    assert(r.getInt(0) == 4 && r.getInt(1) == 3)
  }
}
