package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends GraftSuite {

  test("media table carries binary payload + typed metadata") {
    val m = Multimodal.mediaTable(spark, sf)
    val s = m.schema
    assert(s("media").dataType.typeName == "binary")
    assert(s("width").dataType.typeName == "integer")
    assert(m.count() > 0)
    assert(m.where(col("kind").isin("image", "audio")).count() == m.count())
  }

  test("feature extraction is deterministic, batched, and L1-normalized") {
    val f1 = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
    val rows = f1.collect()
    assert(rows.forall(_.features.length == 16))
    assert(rows.forall(r => math.abs(r.features.sum - 1.0f) < 1e-3))
    // determinism: run twice, same values
    val f2 = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf)).collect()
    assert(rows.sortBy(_.doc_id).zip(f2.sortBy(_.doc_id))
      .forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("resize stub yields exactly targetW×targetH bytes with updated metadata") {
    val r = Multimodal.resize(Multimodal.mediaTable(spark, sf), 8, 6).collect()
    assert(r.forall(m => m.media.length == 48 && m.width == 8 && m.height == 6))
    // deterministic
    val r2 = Multimodal.resize(Multimodal.mediaTable(spark, sf), 8, 6).collect()
    assert(r.sortBy(_.doc_id).zip(r2.sortBy(_.doc_id))
      .forall { case (a, b) => a.media.sameElements(b.media) })
  }

  test("frame sampling fans out n slices covering the payload") {
    val frames = Multimodal.sampleFrames(Multimodal.mediaTable(spark, sf), n = 4)
    val perDoc = frames.groupBy("doc_id").count().where(col("count") =!= 4).count()
    assert(perDoc == 0)
    val doc = Multimodal.mediaTable(spark, sf).head()
    val reassembled = frames.where(col("doc_id") === doc.doc_id)
      .orderBy("frame").collect().flatMap(_.getAs[Array[Byte]]("frame_bytes"))
    assert(reassembled.sameElements(doc.media))
  }
}
