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

  test("REAL image decode: PNG round-trip recovers exact pixels; corrupt bytes drop, not crash") {
    import graft.multimodal.MediaOps
    // encode → decode is the identity on pixels (PNG lossless)
    val bytes = MediaOps.encodeGrayPng(5, 3, (x, y) => (x * 50 + y * 17) % 256)
    val (w, h, px) = MediaOps.decodeGray(bytes).get
    assert((w, h) === ((5, 3)))
    for (y <- 0 until 3; x <- 0 until 5) assert(px(y * 5 + x) === (x * 50 + y * 17) % 256)
    // imageStats over synthetic PNGs matches the closed-form sums (the q67
    // oracle contract, asserted in-JVM too)
    val ids = spark.range(0, 40).selectExpr("id * 5 AS id")
    val stats = MediaOps.imageStats(MediaOps.syntheticPngs(ids))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(stats.size === 40)
    stats.foreach { case (id, (gw, gh, npx, sum)) =>
      val (ew, eh) = ((8 + id % 9).toInt, (8 + id % 7).toInt)
      assert((gw, gh, npx) === ((ew.toLong, eh.toLong, (ew * eh).toLong)))
      val expected = (for (p <- 0 until ew * eh)
        yield (id * 31 + (p % ew) * 7 + (p / ew) * 13) % 256).sum
      assert(sum === expected, s"decoded pixel sum for id $id")
    }
    // undecodable payloads are dropped (ImageIO null), never a crash
    import spark.implicits._
    val junk = Seq((1L, Array[Byte](1, 2, 3)), (2L, MediaOps.encodeGrayPng(4, 4, (_, _) => 9)))
      .toDF("id", "content")
    val kept = MediaOps.imageStats(junk).collect()
    assert(kept.map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("REAL audio decode: WAV PCM round-trip recovers exact samples; non-audio bytes drop") {
    import graft.multimodal.MediaOps
    // encode → decode through the JDK codec is the identity (PCM lossless)
    val samples = Array.tabulate(200)(i => ((i * 313) % 4001 - 2000).toShort)
    val bytes = MediaOps.encodePcmWav(16000, samples)
    val (rate, got) = MediaOps.decodePcm(bytes).get
    assert(rate === 16000)
    assert(got.toSeq === samples.toSeq)
    // audioStats over synthetic WAVs matches the closed-form sums (the q69
    // oracle contract, asserted in-JVM too)
    val ids = spark.range(0, 30).selectExpr("id * 7 AS id")
    val stats = MediaOps.audioStats(MediaOps.syntheticWavs(ids))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(stats.size === 30)
    stats.foreach { case (id, (gr, gn, sum, absSum)) =>
      val en = (64 + id % 33).toInt
      assert((gr, gn) === ((8000 + (id % 3) * 4000, en.toLong)))
      val vals = (0 until en).map(i => (id * 37 + i * 101L) % 4001L - 2000L)
      assert(sum === vals.sum, s"decoded sample sum for id $id")
      assert(absSum === vals.map(math.abs).sum)
    }
    // undecodable / non-PCM payloads are dropped, never a crash
    import spark.implicits._
    val junk = Seq((1L, Array[Byte](9, 9, 9, 9)), (2L, MediaOps.encodePcmWav(8000, samples)))
      .toDF("id", "content")
    val kept = MediaOps.audioStats(junk).collect()
    assert(kept.map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("REAL video decode: y4m round-trip recovers exact luma planes in both colorspaces") {
    import graft.multimodal.MediaOps
    def luma(f: Int, x: Int, y: Int) = (f * 29 + x * 7 + y * 13) % 256
    for (mono <- Seq(true, false)) {
      val bytes = MediaOps.encodeY4m(10, 6, 3, luma, mono = mono)
      val (w, h, frames) = MediaOps.decodeY4m(bytes).get
      assert((w, h, frames.length) === ((10, 6, 3)), s"mono=$mono")
      for (f <- 0 until 3; y <- 0 until 6; x <- 0 until 10)
        assert((frames(f)(y * 10 + x) & 0xff) === luma(f, x, y),
          s"luma mismatch at f=$f x=$x y=$y mono=$mono")
    }
    // videoStats over synthetic y4ms matches the closed-form sums (the
    // q75 oracle contract, asserted in-JVM too)
    val ids = spark.range(0, 20).selectExpr("id * 13 AS id")
    val stats = MediaOps.videoStats(MediaOps.syntheticY4ms(ids))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(stats.size === 20)
    stats.foreach { case (id, (w, h, nf, sum, weighted)) =>
      val (ew, eh, enf) = (8 + id % 5, 6 + id % 3, 2 + id % 4)
      assert((w, h, nf) === ((ew, eh, enf)))
      val lumas = for (f <- 0L until enf; y <- 0L until eh; x <- 0L until ew)
        yield (f, (id * 31 + f * 29 + x * 7 + y * 13) % 256)
      assert(sum === lumas.map(_._2).sum, s"luma sum for id $id")
      assert(weighted === lumas.map { case (f, l) => (f + 1) * l }.sum)
    }
    // malformed streams drop, never crash: bad magic, truncated frame,
    // unsupported colorspace
    import spark.implicits._
    val good = MediaOps.encodeY4m(8, 6, 2, luma)
    val junk = Seq(
      (1L, "not a video".getBytes("US-ASCII")),
      (2L, good.dropRight(5)),
      (3L, new String(good.takeWhile(_ != '\n'), "US-ASCII")
        .replace("Cmono", "C444").getBytes("US-ASCII")
        ++ good.dropWhile(_ != '\n')),
      (4L, good),
    ).toDF("id", "content")
    assert(MediaOps.videoStats(junk).collect().map(_.getLong(0)).toSeq === Seq(4L))
  }

  test("image -> vector -> HNSW index -> query end-to-end (the notebooks' image-in flow)") {
    import graft.multimodal.MediaOps
    import graft.hnsw.{Hnsw, HnswParams}
    val ids = spark.range(0, 120).toDF("id")
    val vecs = MediaOps.imageVectors(MediaOps.syntheticPngs(ids), side = 8)
    val n = vecs.count()
    assert(n === 120)
    val first = vecs.orderBy("id").head()
    assert(first.getSeq[Float](1).length === 64)
    assert(first.getSeq[Float](1).forall(v => v >= 0.0f && v <= 1.0f), "normalized to [0,1]")
    val index = Hnsw.build(vecs, HnswParams(dim = 64, m = 4, efConstruction = 32, numPartitions = 2))
    val queries = vecs.filter(org.apache.spark.sql.functions.col("id") % 20 === 0)
      .select(org.apache.spark.sql.functions.col("id").as("qid"),
        org.apache.spark.sql.functions.col("vector"))
    val ann = Hnsw.annQuery(index, queries, k = 3)
    val rank1 = ann.filter(org.apache.spark.sql.functions.col("rank") === 1).collect()
    assert(rank1.nonEmpty)
    rank1.foreach { r =>
      assert(r.getAs[Long]("qid") === r.getAs[Long]("id"), "self-match at rank 1")
      assert(r.getAs[Double]("dist") === 0.0)
    }
  }

  test("y4m C420 odd dimensions round-trip: chroma planes are ceil-sized") {
    import graft.multimodal.MediaOps
    // 7×5 and 9×9: floor-sized chroma would desync the frame stream and
    // truncate / corrupt every frame after the first
    for ((w, h) <- Seq((7, 5), (9, 9), (8, 5), (7, 6))) {
      val luma = (f: Int, x: Int, y: Int) => (f * 29 + x * 7 + y * 13) % 256
      val bytes = MediaOps.encodeY4m(w, h, nFrames = 3, luma, mono = false)
      val Some((dw, dh, frames)) = MediaOps.decodeY4m(bytes)
      assert((dw, dh) === (w, h))
      assert(frames.length === 3, s"${w}x$h: all frames must survive the chroma skip")
      for (f <- 0 until 3; y <- 0 until h; x <- 0 until w)
        assert((frames(f)(y * w + x) & 0xff) === luma(f, x, y))
    }
  }

  test("golden parity e2e: q76 ranked report self-matches at rank 1; q77 identity table") {
    import org.apache.spark.sql.functions.col
    // q76: every query's rank-1 row is itself, distance exactly 0, marked
    val rpt = SparkEntry.queries("q76_golden_image_report")(spark, "/root/testdata/sf0.001")
      .localCheckpoint()
    val r1 = rpt.filter(col("rank") === 1).collect()
    assert(r1.nonEmpty)
    r1.foreach { r =>
      assert(r.getAs[Long]("id") === r.getAs[Long]("qid"), "rank-1 must be the query image")
      assert(r.getAs[Double]("dist") === 0.0)
      assert(r.getAs[String]("marker") === "<- QUERY")
    }
    // ranks are a dense 1..5 per query
    assert(rpt.groupBy("qid").count().filter(col("count") =!= 5).count() === 0L)
    // q77: the whole table is the identity at distance 0 through real HNSW
    val self = SparkEntry.queries("q77_golden_selfmatch")(spark, "/root/testdata/sf0.001").collect()
    assert(self.nonEmpty)
    self.foreach { r =>
      assert(r.getAs[Long]("match_id") === r.getAs[Long]("qid"))
      assert(r.getAs[Double]("dist") === 0.0)
    }
  }

  test("video -> frame vectors -> HNSW -> query end-to-end; stride skips frames") {
    import graft.multimodal.MediaOps
    import graft.hnsw.{Hnsw, HnswParams}
    import org.apache.spark.sql.functions.{col, monotonically_increasing_id}
    val ids = spark.range(0, 40).selectExpr("id * 13 AS id")
    val vids = MediaOps.syntheticY4ms(ids)
    val vecs = MediaOps.videoVectors(vids, side = 8)
    // one row per frame: Σ (2 + id % 4) over the id set
    val expectFrames = (0L until 40L).map(i => 2 + (i * 13) % 4).sum
    assert(vecs.count() === expectFrames)
    assert(vecs.head().getSeq[Float](2).forall(v => v >= 0.0f && v <= 1.0f))
    // stride=2 keeps frames 0, 2, 4...
    val strided = MediaOps.videoVectors(vids, side = 8, stride = 2)
    val expectStrided = (0L until 40L).map(i => (2 + (i * 13) % 4 + 1) / 2).sum
    assert(strided.count() === expectStrided)
    assert(strided.filter(col("frame_idx") % 2 =!= 0).count() === 0L)
    // frame-level similarity: index every frame under a synthetic row id,
    // querying a frame's own vector must find it at distance 0
    val rows = vecs.select(monotonically_increasing_id().as("rid"), col("vector"))
      .localCheckpoint()
    val index = Hnsw.build(rows.select(col("rid").as("id"), col("vector")),
      HnswParams(dim = 64, m = 4, efConstruction = 32, numPartitions = 2))
    val queries = rows.filter(col("rid") % 10 === 0)
      .select(col("rid").as("qid"), col("vector"))
    val rank1 = Hnsw.annQuery(index, queries, k = 3).filter(col("rank") === 1).collect()
    assert(rank1.nonEmpty)
    rank1.foreach(r => assert(r.getAs[Double]("dist") === 0.0, "self-frame at distance 0"))
  }

  test("REAL MJPEG decode: block-constant JPEG at q=1.0 round-trips EXACT pixels through the AVI container") {
    import graft.multimodal.MediaOps
    // the lossless corner of a lossy codec: 8x8-block-constant grayscale
    // frames are DC-only, quantized by 1 -> bit-exact decode
    for (id <- Seq(0L, 7L, 26L)) {
      val w = (8 * (1 + id % 2)).toInt
      val h = (8 * (1 + id % 3)).toInt
      val nf = (2 + id % 4).toInt
      val avi = MediaOps.encodeMjpegAvi(w, h, nf,
        (f, bx, by) => ((id * 31 + f * 29 + bx * 7 + by * 13) % 256).toInt)
      val Some((gw, gh, frames)) = MediaOps.decodeMjpegAvi(avi)
      assert((gw, gh, frames.length) === ((w, h, nf)))
      for (f <- 0 until nf; y <- 0 until h; x <- 0 until w) {
        val want = ((id * 31 + f * 29 + (x / 8) * 7 + (y / 8) * 13) % 256).toInt
        assert((frames(f)(y * w + x) & 0xff) === want,
          s"id=$id f=$f ($x,$y): decoded JPEG pixel must equal the closed form")
      }
    }
    // corrupt / non-AVI bytes drop, not crash
    assert(MediaOps.decodeMjpegAvi("not an avi at all".getBytes).isEmpty)
    val good = MediaOps.encodeMjpegAvi(8, 8, 2, (_, _, _) => 100)
    assert(MediaOps.decodeMjpegAvi(good.take(good.length - 9)).isEmpty,
      "truncated chunk must return None")
    val garbled = good.clone()
    // zero the first JPEG's SOI marker (first two bytes after the 00dc
    // chunk header) — no longer a JPEG at all
    val dcIdx = good.indexOfSlice("00dc".getBytes("US-ASCII"))
    garbled(dcIdx + 8) = 0x00
    garbled(dcIdx + 9) = 0x00
    assert(MediaOps.decodeMjpegAvi(garbled).isEmpty, "undecodable frame -> None")
  }

  test("mjpeg -> frame vectors -> HNSW -> query end-to-end (compressed-video flow)") {
    import graft.multimodal.MediaOps
    import graft.hnsw.{Hnsw, HnswParams}
    import org.apache.spark.sql.functions.{col, monotonically_increasing_id}
    val ids = spark.range(0, 20).selectExpr("id * 9 AS id")
    val avis = MediaOps.syntheticMjpegAvis(ids)
    val vecs = MediaOps.mjpegVectors(avis, side = 8)
    val expectFrames = (0L until 20L).map(i => 2 + (i * 9) % 4).sum
    assert(vecs.count() === expectFrames)
    assert(vecs.head().getSeq[Float](2).forall(v => v >= 0.0f && v <= 1.0f))
    val strided = MediaOps.mjpegVectors(avis, side = 8, stride = 2)
    assert(strided.filter(col("frame_idx") % 2 =!= 0).count() === 0L)
    val rows = vecs.select(monotonically_increasing_id().as("rid"), col("vector"))
      .localCheckpoint()
    val index = Hnsw.build(rows.select(col("rid").as("id"), col("vector")),
      HnswParams(dim = 64, m = 4, efConstruction = 32, numPartitions = 2))
    val queries = rows.filter(col("rid") % 7 === 0)
      .select(col("rid").as("qid"), col("vector"))
    val rank1 = Hnsw.annQuery(index, queries, k = 3).filter(col("rank") === 1).collect()
    assert(rank1.nonEmpty)
    rank1.foreach(r => assert(r.getAs[Double]("dist") === 0.0, "self-frame at distance 0"))
  }

  test("imagePhash: both hashes invariant under wrap-free global brightness; dHash moves only row-0 bits on a top-row shift") {
    import graft.multimodal.MediaOps
    import spark.implicits._
    // pixels confined to 50..149 so +50 shifts never wrap mod 256
    def png(shiftAll: Int, shiftRow0: Int) = MediaOps.encodeGrayPng(12, 10,
      (x, y) => 50 + (x * 7 + y * 13) % 100 + shiftAll + (if (y == 0) shiftRow0 else 0))
    val media = Seq(
      (0L, png(0, 0)),    // base
      (1L, png(50, 0)),   // global brightness +50
      (2L, png(0, 50)),   // top source row +50 (the q89 perturbation, wrap-free)
    ).toDF("id", "content")
    val h = MediaOps.imagePhash(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // global shift: mean threshold and gradient signs both unchanged
    assert(h(1L) === h(0L), "aHash and dHash are brightness-shift invariant without wrap")
    // top-row shift: dHash bits 8..63 (rows 1-7) must be identical —
    // only resized row 0 samples source y=0
    val (_, _, dHi0, dLo0) = h(0L)
    val (_, _, dHi2, dLo2) = h(2L)
    assert(dHi0 === dHi2, "dHash rows 4-7 untouched")
    assert((dLo0 & ~255L) === (dLo2 & ~255L), "dHash rows 1-3 untouched")
    // partition-layout independence
    val again = MediaOps.imagePhash(media.repartition(3)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(again === h)
  }

  test("audioFrameFeatures: frames tile the stream and match a straight-line recompute") {
    import graft.multimodal.MediaOps
    val ids = spark.range(0, 30).selectExpr("id * 7 AS id")
    val feats = MediaOps.audioFrameFeatures(MediaOps.syntheticWavs(ids), frameLen = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    for (idx <- 0L until 30L) {
      val id = idx * 7
      val n = (64 + id % 33).toInt
      val samples = Array.tabulate(n)(i => ((id * 37 + i * 101L) % 4001L - 2000L).toInt)
      val frames = samples.indices.grouped(16).zipWithIndex.toSeq
      assert(frames.forall { case (idxs, f) => feats.contains((id, f.toLong)) })
      frames.foreach { case (idxs, f) =>
        val vs = idxs.map(samples)
        val energy = vs.map(v => v.toLong * v).sum
        val zc = vs.sliding(2).count { case Seq(a, b) => (a < 0) != (b < 0); case _ => false }
        val peak = vs.map(v => math.abs(v.toLong)).max
        assert(feats((id, f.toLong)) === ((idxs.size.toLong, energy, zc.toLong, peak)),
          s"frame features for id $id frame $f")
      }
    }
    // frame partition: n_samples per id sums back to the stream length
    val totals = feats.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2._1).sum)
    totals.foreach { case (id, tot) => assert(tot === 64 + id % 33) }
  }
}
