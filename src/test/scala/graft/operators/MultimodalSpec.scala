package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val assets = Multimodal.assetsFromText(
    Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text")

  test("asset contract: binary payload + typed metadata struct") {
    val row = assets.filter($"asset_id" === 0L).head()
    assert(row.getAs[Array[Byte]]("payload").nonEmpty)
    assert(row.getAs[String]("modality") === "text")
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[Long]("duration_ms") > 0)
  }

  test("extractFeatures: per-partition decode, hash matches SQL md5, deterministic") {
    val feats = Multimodal.extractFeatures(spark, assets)
    assert(feats.count() === assets.count())
    // content hash from the partition-side codec equals codegen md5()
    val joined = feats.toDF().join(
      Multimodal.payloadStats(assets)
        .select($"asset_id", $"content_hash".as("sql_hash"), $"byte_len".as("sql_len")),
      "asset_id")
    assert(joined.filter($"content_hash" =!= $"sql_hash").count() === 0)
    assert(joined.filter($"byte_len" =!= $"sql_len").count() === 0)
    // deterministic across runs
    val a = feats.orderBy("asset_id").collect().map(_.feature.toSeq)
    val b = Multimodal.extractFeatures(spark, assets)
      .orderBy("asset_id").collect().map(_.feature.toSeq)
    assert(a.toSeq === b.toSeq)
    assert(a.head.length === 8)
  }

  test("resizeAndSample: bounded output, stride frame selection") {
    val frames = Multimodal.resizeAndSample(spark, assets,
      targetBytes = 128, frameSize = 32, every = 2)
    val rows = frames.collect()
    assert(rows.length === assets.count())
    // resize bound holds for every asset
    assert(rows.forall(_.resized_len <= 128))
    // 128 bytes / 32-byte frames = 4 chunks, every 2nd kept → 2 frames
    assert(rows.filter(_.resized_len == 128).forall(_.n_frames == 2))
    assert(rows.forall(r => r.frame_hashes.length == r.n_frames))
  }

  test("short payloads pass through resize untouched") {
    val tiny = Multimodal.assetsFromText(
      Seq((1L, "abc")).toDF("doc_id", "text"), "doc_id", "text")
    val r = Multimodal.resizeAndSample(spark, tiny, targetBytes = 128,
      frameSize = 32, every = 2).head()
    assert(r.resized_len === 3)
    assert(r.n_frames === 1)
  }
}
