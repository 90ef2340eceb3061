package graft

import graft.ops.Multimodal
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("synthetic media table has the contract schema and modalities") {
    val m = Multimodal.syntheticMedia(spark, sfDir)
    assert(m.schema.fieldNames.toSeq ==
      Multimodal.mediaSchema.fieldNames.toSeq)
    val mods = m.groupBy("modality").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mods.keySet == Set("image", "audio", "video"))
    // images carry dimensions, audio/video carry duration
    assert(m.where(col("modality") === "image" && col("width").isNull).count() == 0)
    assert(m.where(col("modality") =!= "image" && col("duration_ms").isNull).count() == 0)
  }

  test("batched feature extraction: fixed dim, deterministic, content-sensitive") {
    import spark.implicits._
    val m = Multimodal.syntheticMedia(spark, sfDir).limit(60)
    val f1 = Multimodal.extractFeatures(m, dim = 16).collect()
      .map(x => x.media_id -> x.feature.toSeq).toMap
    assert(f1.nonEmpty)
    assert(f1.values.forall(_.size == 16))
    assert(f1.values.forall(_.forall(v => v >= -1.0f && v <= 1.0f)))
    // deterministic across runs (and across partitionings)
    val f2 = Multimodal.extractFeatures(m, dim = 16, partitions = 2).collect()
      .map(x => x.media_id -> x.feature.toSeq).toMap
    assert(f1 == f2)
    // different payloads → different features (content-derived stub)
    assert(f1.values.toSeq.distinct.size > 1)
  }

  test("frame sampling: deterministic offsets, video only, capped") {
    val m = Multimodal.syntheticMedia(spark, sfDir)
    val frames = Multimodal.sampleFrames(m, everyBytes = 100, frameBytes = 32, maxFrames = 4)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    val byId = rows.groupBy(_.getLong(0))
    byId.values.foreach { fs =>
      assert(fs.length <= 4)
      val offs = fs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      assert(offs == offs.indices.map(_ * 100L))
      fs.foreach(r => assert(r.getAs[Array[Byte]](3).length <= 32))
    }
    // only video media ids
    val videoIds = Multimodal.syntheticMedia(spark, sfDir)
      .where(col("modality") === "video").select("media_id")
      .collect().map(_.getLong(0)).toSet
    assert(byId.keySet.subsetOf(videoIds))
  }
}
