package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SharedSpark {

  private lazy val docs = graft.sources.Tables(spark, sf0001).table("documents").limit(50)

  test("media table: binary payload with typed metadata") {
    val media = Multimodal.mediaFromDocuments(docs)
    val schema = media.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("modality").dataType.typeName === "string")
    val mods = media.select("modality").distinct().collect().map(_.getString(0)).toSet
    assert(mods.subsetOf(Set("image", "audio", "video")))
  }

  test("feature extraction via mapPartitions is deterministic and partition-independent") {
    val media = Multimodal.mediaFromDocuments(docs)
    val a = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.media_id -> (f.checksum, f.feature.toSeq)).toMap
    val b = Multimodal.extractFeatures(spark, media.repartition(7)).collect()
      .map(f => f.media_id -> (f.checksum, f.feature.toSeq)).toMap
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("stub decode produces fixed-width features tied to payload bytes") {
    val f1 = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val f2 = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val f3 = Multimodal.decodeStub("different!!".getBytes("UTF-8"))
    assert(f1.toSeq === f2.toSeq)
    assert(f1.length === 8)
    assert(f1.toSeq !== f3.toSeq)
  }

  test("metadata-only query does not require decoding payloads") {
    val media = Multimodal.mediaFromDocuments(docs)
    val n = media.filter(col("modality") === "audio")
      .agg(sum(octet_length(col("payload")))).head().getLong(0)
    assert(n > 0)
  }
}
