package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaOps, MediaRow}

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "a" * 40),  // 40 bytes -> 3 frames (16,16,8)
    (1L, "hello"),   // 5 bytes -> 1 frame
    (2L, "b" * 16),  // exactly one frame
  ).toDF("doc_id", "text")

  private lazy val media = MediaOps.fromText(docs, "doc_id", "text").as[MediaRow]

  test("fromText produces binary payloads with typed metadata") {
    val rows = media.collect().map(r => r.id -> r).toMap
    assert(rows(0L).content.length === 40)
    assert(rows(0L).kind === "image")
    assert(rows(1L).kind === "audio")
    assert(rows(2L).kind === "video")
    assert(new String(rows(1L).content, "UTF-8") === "hello")
  }

  test("feature extraction is deterministic with fixed dim and batch shape") {
    val f1 = MediaOps.extractFeatures(media, dim = 8).collect().map(r => r.id -> r.features.toSeq).toMap
    val f2 = MediaOps.extractFeatures(media.repartition(3), dim = 8).collect().map(r => r.id -> r.features.toSeq).toMap
    assert(f1 === f2) // partition-layout independent
    assert(f1(0L).length === 8)
    assert(f1(0L) !== f1(1L))
  }

  test("frame sampling keeps every stride-th fixed-size frame") {
    val frames = MediaOps.sampleFrames(media, stride = 2).collect()
    val byId = frames.groupBy(_.id)
    // 40 bytes -> frames 0,1,2 -> sampled 0,2
    assert(byId(0L).map(_.frame_idx).sorted.toSeq === Seq(0, 2))
    assert(byId(0L).find(_.frame_idx == 0).get.frame.length === 16)
    assert(byId(0L).find(_.frame_idx == 2).get.frame.length === 8)
    assert(byId(1L).map(_.frame_idx).toSeq === Seq(0))
  }

  test("resizeMeta scales dimensions down to the bound, never up") {
    val resized = MediaOps.resizeMeta(media.toDF(), maxSide = 100)
      .select("id", "width", "height").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    resized.values.foreach { case (w, h) => assert(w <= 100 && h <= 100) }
    // small asset (id 0: w=32,h=32) untouched
    assert(resized(0L) === (32, 32))
  }
}
