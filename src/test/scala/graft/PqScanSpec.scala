package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.Distances
import graft.hnsw.{Hnsw, HnswParams}
import graft.operators.{Knn, Pq}

/** Byte-code PQ scan path: the codegen encoder/ADC expressions, the
  * ADC-coarse + exact-rescore read form ([[Pq.pqScanRefined]]), and the
  * sidecar wiring into the decay tier ([[Hnsw.attachPq]] /
  * [[Hnsw.annQueryPqRefined]]).
  */
class PqScanSpec extends SparkSpec {

  private val dim = 32
  private val m = 4
  private lazy val vectors = graft.sources.Datagen.hashVectors(spark, 600L, dim)
    .localCheckpoint()
  private lazy val codebooks = Pq.pqFit(vectors, dim, m, k = 16, iters = 2)
    .localCheckpoint()

  test("pqEncodeBytes matches the relational pqEncode code-for-code") {
    val rel = Pq.pqEncode(vectors, codebooks, dim, m)
      .select(col("id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).map(_.toInt).toSeq).toMap
    val bytes = Pq.pqEncodeBytes(vectors, codebooks, m)
      .select(col("id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).map(b => b & 0xFF).toSeq).toMap
    assert(bytes.keySet === rel.keySet)
    bytes.foreach { case (id, c) => assert(c === rel(id), s"codes of id $id diverge") }
  }

  test("AdcSum over the flat LUT reproduces the per-sub table sum exactly") {
    import spark.implicits._
    // 2 sub-blocks, k=3: codes pick cells (2, 1); lut laid out [sub][cid]
    val lut = Array(0.5, 1.5, 2.5, 10.0, 20.0, 30.0)
    val df = Seq((1L, Array[Byte](2, 1))).toDF("id", "codes")
      .withColumn("lut", typedLit(lut))
      .select(org.apache.spark.sql.graft.PqExpressions.adcSum(col("codes"), col("lut")).as("s"))
    assert(df.head().getDouble(0) === 2.5 + 20.0)
  }

  test("pqScanRefined at refine >= n IS the exact top-k (l2 and cosine)") {
    val codes = Pq.pqEncodeBytes(vectors, codebooks, m).localCheckpoint()
    val queries = vectors.filter(col("id") % 60 === 0)
      .select(col("id").as("qid"), col("vector"))
    for (metric <- Seq("l2", "cosine")) {
      val exact = Knn.exactTopK(vectors, queries, 10, Distances.metric(metric))
        .collect().map(_.toSeq).toSet
      val got = Pq.pqScanRefined(codes, codebooks, queries, vectors, dim, m, k = 10,
        refine = 600, metric = metric).collect().map(_.toSeq).toSet
      assert(got === exact, s"full-refine pqScanRefined must BE the exact top-k ($metric)")
    }
  }

  test("pqScanRefined distances are exact and recall climbs with refine") {
    val codes = Pq.pqEncodeBytes(vectors, codebooks, m).localCheckpoint()
    val queries = vectors.filter(col("id") % 60 === 0)
      .select(col("id").as("qid"), col("vector"))
    val exact = Knn.exactTopK(vectors, queries, 10, Distances.metric("l2")).localCheckpoint()
    def recallOf(refine: Int): Double = {
      val ann = Pq.pqScanRefined(codes, codebooks, queries, vectors, dim, m, k = 10,
        refine = refine, metric = "l2")
      Hnsw.recallAtK(ann, exact, 10).agg(avg("recall")).head().getDouble(0)
    }
    val r20 = recallOf(20)
    val r200 = recallOf(200)
    assert(r200 >= r20, s"recall must not fall as refine widens ($r20 -> $r200)")
    assert(r200 >= 0.9, s"refine=200 of 600 rows should recover >=0.9 recall, got $r200")
    // output distances are the exact metric, not ADC approximations:
    // every query's own vector appears at rank 1 / dist exactly 0.0
    Pq.pqScanRefined(codes, codebooks, queries, vectors, dim, m, k = 10,
      refine = 50, metric = "l2")
      .filter(col("rank") === 1).collect().foreach { r =>
        assert(r.getLong(2) === r.getLong(0) && r.getDouble(3) === 0.0)
      }
  }

  test("measurePqRecall: stamp = measured - one query-clustered sd (VERDICT r15 item 6); attachPq persists the margined stamp") {
    val in300 = graft.sources.Datagen.hashVectors(spark, 400L, 300)
    val p300 = HnswParams(dim = 300, m = 4, efConstruction = 16,
      metric = "cosine", numPartitions = 4)
    val idx = Hnsw.attachPq(Hnsw.buildRouted(in300, p300, cellsPerShard = 4),
      m = 30, kCells = 16, iters = 2)
    val st = Hnsw.measurePqRecall(idx, k = 10)
    assert(st.queries > 0 && st.measured > 0)
    val sd = math.sqrt(st.measured * (1.0 - st.measured) / st.queries)
    assert(math.abs(st.stamp - math.max(0.0, st.measured - sd)) < 1e-12,
      s"stamp ${st.stamp} must be measured ${st.measured} minus one clustered sd $sd")
    assert(st.stamp <= st.measured)
    // a deliberately starved probe (1 of 16 cells) forces measured < 1,
    // so the margin is EXERCISED, not just trivially zero at recall 1.0
    val starved = Hnsw.measurePqRecall(idx, k = 10, probeCells = 1)
    assert(starved.measured < 1.0 && starved.stamp < starved.measured,
      s"probe-1 stamp ${starved.stamp} must sit strictly below measured ${starved.measured}")
    // attachPq's default measure persists the MARGINED stamp — the gate's
    // input — not the raw sample mean (deterministic modulus sample, so
    // re-measuring reproduces it bit-for-bit)
    assert(math.abs(idx.pq.get.refineRecall - st.stamp) < 1e-9,
      "attachPq must stamp the margined value")
  }

  test("attachPq: explicit PQ path is exact at full refine; the chooser's picks are UNCHANGED by the sidecar; save/load round-trips it") {
    // dim 300 >= the high-dim bound; nSub = 400/4 = 100 >= 40*efBudget(2)
    val in300 = graft.sources.Datagen.hashVectors(spark, 400L, 300)
    val p300 = HnswParams(dim = 300, m = 4, efConstruction = 16,
      metric = "cosine", numPartitions = 4)
    val idx0 = Hnsw.buildRouted(in300, p300, cellsPerShard = 4)
    val idx = Hnsw.attachPq(idx0, m = 30, kCells = 16, iters = 2)
    assert(idx.pq.isDefined && idx.pq.get.m === 30)
    val q = in300.filter(col("id") % 40 === 0).select(col("id").as("qid"), col("vector"))
    assert(Hnsw.traversalDecays(idx.meta, k = 1, ef = 2))
    // the sidecar must NOT change the adaptive pick (measured at 5M×512:
    // auto-routing through PQ trades recall for no wall-time win on
    // in-memory tables) — same decision as the sidecar-free index
    Hnsw.annQueryAdaptive(idx, q, k = 1, ef = 2).count()
    val withSidecar = Hnsw.lastDecayPick.get()
    Hnsw.annQueryAdaptive(idx0, q, k = 1, ef = 2).count()
    assert(withSidecar === Hnsw.lastDecayPick.get(),
      "an attached sidecar must not change the decay-tier pick")
    // the explicit path: exact rescore — every query self-matches at
    // rank 1 (cosine ulp residual)
    Hnsw.annQueryPqRefined(idx, q, k = 1, refine = 40).collect().foreach { r =>
      assert(r.getLong(2) === r.getLong(0) && math.abs(r.getDouble(3)) < 1e-12)
    }
    // direct call at full probe + full refine = exact top-k over live rows
    val uniq = idx.nodes.filter(!col("tombstone"))
      .groupBy(col("id")).agg(first(col("vector")).as("vector"))
    val exact = Knn.exactTopK(uniq, q, 10, Distances.metric("cosine"))
      .collect().map(_.toSeq).toSet
    val full = Hnsw.annQueryPqRefined(idx, q, k = 10, probeCells = 16, refine = 400)
      .collect().map(_.toSeq).toSet
    assert(full === exact, "full-probe full-refine PQ path must BE the exact top-k")
    // persistence round-trip keeps the sidecar and its answers
    val dir = Files.createTempDirectory("pq_sidecar").toString
    Hnsw.save(idx, dir)
    val loaded = Hnsw.load(spark, dir)
    assert(loaded.pq.isDefined && loaded.pq.get.m === 30)
    // the measured recall stamp (attachPq default) round-trips through
    // pq_meta.json — it is the chooser gate's input, so losing it on
    // reload would silently disable the kernel pick
    assert(idx.pq.get.recallK === 10 && idx.pq.get.refine > 0 &&
      idx.pq.get.refineRecall > 0,
      "attachPq must measure and stamp refine-capped recall by default")
    assert(idx.pq.get.stampProbe > 0,
      "attachPq must record the probe the stamp was measured at")
    assert(loaded.pq.get.recallK === idx.pq.get.recallK &&
      loaded.pq.get.refine === idx.pq.get.refine &&
      loaded.pq.get.stampProbe === idx.pq.get.stampProbe &&
      math.abs(loaded.pq.get.refineRecall - idx.pq.get.refineRecall) < 1e-9,
      "recall stamp (incl. stamp_probe) must survive save/load")
    assert(Hnsw.annQueryPqRefined(loaded, q, k = 10, probeCells = 16, refine = 400)
      .collect().map(_.toSeq).toSet === full)
    // the filtered view must NOT keep the sidecar (codes don't know the filter)
    assert(Hnsw.withAllowed(idx, in300.select("id").limit(100)).pq.isEmpty)
    idx0.nodes.unpersist()
  }

  test("batched ADC kernel: coarse sums bit-equal the AdcSum expression; full-refine IS the exact top-k; partial refine matches the expression path (l2 and cosine)") {
    val n = 600L
    val codes = Pq.pqEncodeBytes(vectors, codebooks, m).localCheckpoint()
    val q = vectors.filter(col("id") % 60 === 0).select(col("id").as("qid"), col("vector"))
    for (metric <- Seq("l2", "cosine")) {
      // full refine (r >= n): both paths must BE the exact top-k — and
      // since every scored row survives the per-partition heaps, the
      // coarse stage's sums are exercised over the whole corpus
      val uniq = vectors.select(col("id"), col("vector"))
      val exact = Knn.exactTopK(uniq, q, 10, Distances.metric(metric))
        .collect().map(_.toSeq).toSet
      val kern = Pq.pqScanRefinedKernel(codes, codebooks, q, uniq,
          dim, m, 10, refine = n.toInt, metric = metric)
        .collect().map(_.toSeq).toSet
      assert(kern === exact, s"full-refine kernel must be exact ($metric)")
      // partial refine: identical result sets to the expression path
      // (same sums bit-for-bit -> same coarse survivors -> same rescore)
      val kPart = Pq.pqScanRefinedKernel(codes, codebooks, q, uniq,
          dim, m, 10, refine = 60, metric = metric)
        .collect().map(_.toSeq).toSet
      val ePart = Pq.pqScanRefined(codes, codebooks, q, uniq,
          dim, m, 10, refine = 60, metric = metric)
        .collect().map(_.toSeq).toSet
      assert(kPart === ePart, s"kernel and expression paths diverged ($metric)")
    }
    // the Hnsw wiring: kernel flag gives the same answers through a
    // routed index + sidecar
    val in300 = graft.sources.Datagen.hashVectors(spark, 300L, 300)
    val idx = Hnsw.attachPq(
      Hnsw.buildRouted(in300, HnswParams(dim = 300, m = 4, efConstruction = 16,
        metric = "cosine", numPartitions = 4), cellsPerShard = 4),
      m = 30, kCells = 16, iters = 2)
    val q300 = in300.filter(col("id") % 50 === 0).select(col("id").as("qid"), col("vector"))
    val viaExpr = Hnsw.annQueryPqRefined(idx, q300, k = 5, probeCells = 16, refine = 300)
      .collect().map(_.toSeq).toSet
    val viaKern = Hnsw.annQueryPqRefined(idx, q300, k = 5, probeCells = 16, refine = 300,
      kernel = true).collect().map(_.toSeq).toSet
    assert(viaKern === viaExpr)
    idx.nodes.unpersist()
  }

  test("stale-sidecar protection: sidecar-free re-save deletes it; appends invalidate it; load drops it on a coverage-marker mismatch") {
    val params = HnswParams(dim = dim, m = 4, efConstruction = 16,
      metric = "l2", numPartitions = 4)
    val idx0 = Hnsw.buildRouted(vectors, params, cellsPerShard = 4)
    val idx = Hnsw.attachPq(idx0, m = 4, kCells = 16, iters = 2)
    val dir = Files.createTempDirectory("pq_stale").toString
    Hnsw.save(idx, dir)
    assert(Hnsw.load(spark, dir).pq.isDefined)
    // re-saving the index WITHOUT its sidecar into the same dir must not
    // leave the old codes behind (they would describe stale vectors)
    Hnsw.save(idx.copy(pq = None), dir)
    assert(Hnsw.load(spark, dir).pq.isEmpty,
      "sidecar-free save into a reused dir must delete the old codes")
    // an append adds vectors the codes can't cover — sidecar must go
    Hnsw.save(idx, dir)
    assert(Hnsw.load(spark, dir).pq.isDefined)
    val batch = graft.sources.Datagen.hashVectors(spark, 40L, dim)
      .select((col("id") + 100000L).as("id"), col("vector"))
    graft.streaming.StreamingOps.appendBatchRouted(batch, dir, params, batchId = 0L)
    assert(Hnsw.load(spark, dir).pq.isEmpty,
      "appendBatchRouted must invalidate the PQ sidecar")
    // even if the physical delete were bypassed, a coverage-marker
    // mismatch (encoded-against num_nodes != live num_nodes) drops it
    Hnsw.save(idx, dir)
    Hnsw.writePqMeta(dir, idx.meta.num_nodes + 7L)
    assert(Hnsw.load(spark, dir).pq.isEmpty,
      "load must drop a sidecar whose coverage marker mismatches meta")
    // and the non-routed append path invalidates too
    val dir2 = Files.createTempDirectory("pq_stale2").toString
    Hnsw.save(idx, dir2)
    graft.streaming.StreamingOps.appendBatch(batch, dir2, params, batchId = 0L)
    assert(Hnsw.load(spark, dir2).pq.isEmpty,
      "appendBatch must invalidate the PQ sidecar")
    idx0.nodes.unpersist()
  }

  test("adaptive PQ-kernel gate: fires only when a recall contract exists AND the stamp clears it, in the scan-preferred regime") {
    import graft.hnsw.CalCurve
    // the scan-preferred decayed recipe (same as the HnswRoutedSpec scan
    // pick): 600 uniform queries over a 4-shard dim-300 index, meta
    // doctored to the decayed operating point at k=10
    val in300 = graft.sources.Datagen.hashVectors(spark, 400L, 300)
    val p300 = HnswParams(dim = 300, m = 4, efConstruction = 16,
      metric = "cosine", numPartitions = 4)
    val built = Hnsw.buildRouted(in300, p300, cellsPerShard = 4)
    val base = Hnsw.attachPq(built, m = 30, kCells = 16, iters = 2, measure = false)
      .copy(meta = built.meta.copy(num_nodes = 400000L))
    val q = graft.sources.Datagen.hashVectors(spark, 600L, 300)
      .select(col("id").as("qid"), col("vector"))
    assert(Hnsw.traversalDecays(base.meta, k = 10, ef = 2))
    // handcrafted curve (0.95 -> probe 4 = the C/4 default here; the 0.98
    // point clears the r16 margin bar 0.95 + sqrt(.95·.05/100) ≈ 0.9718)
    // and a deterministic stamp, so the gate's inputs are unambiguous
    val curve = Seq(CalCurve(10, Seq((4, 0.98), (16, 1.0))))
    def stamped(rec: Double, k: Int) = base.copy(calibration = curve,
      pq = base.pq.map(_.copy(refineRecall = rec, refine = 60, recallK = k)))
    // GATE OPEN: calibrated default target 0.95 <= stamp 0.97 at k=10
    val open = stamped(0.97, 10)
    val got = Hnsw.annQueryAdaptive(open, q, k = 10, ef = 2)
    val gotSet = got.collect().map(_.toSeq).toSet
    assert(Hnsw.lastDecayPick.get() === "pq-kernel",
      s"stamped sidecar under a cleared contract must take the kernel, got ${Hnsw.lastDecayPick.get()}")
    assert(gotSet === Hnsw.annQueryPqRefined(open, q, k = 10, probeCells = 4,
      refine = 60, kernel = true).collect().map(_.toSeq).toSet,
      "gated pick must BE the kernel plan at the contract probe")
    // explicit recallTarget spelling opens it too
    Hnsw.annQueryAdaptive(stamped(0.97, 10).copy(calibration = curve), q,
      k = 10, ef = 2, recallTarget = 0.9).count()
    assert(Hnsw.lastDecayPick.get() === "pq-kernel")
    // GATE SHUT 1: stamp below the target — the scan forms keep recall
    Hnsw.annQueryAdaptive(stamped(0.90, 10), q, k = 10, ef = 2).count()
    assert(Set("pruned-scan", "exact-scan").contains(Hnsw.lastDecayPick.get()),
      s"a stamp below the target must keep the exact forms, got ${Hnsw.lastDecayPick.get()}")
    // GATE SHUT 2: stamp measured at a different k
    Hnsw.annQueryAdaptive(stamped(0.97, 5), q, k = 10, ef = 2).count()
    assert(Set("pruned-scan", "exact-scan").contains(Hnsw.lastDecayPick.get()))
    // GATE SHUT 3: no contract at all (no curve, no target) — the r13
    // explicit-lever behavior, even with a perfect stamp
    Hnsw.annQueryAdaptive(stamped(0.97, 10).copy(calibration = Nil),
      q, k = 10, ef = 2).count()
    assert(Set("pruned-scan", "exact-scan").contains(Hnsw.lastDecayPick.get()),
      "no contract must keep the exact forms (explicit-lever history)")
    // GATE SHUT 4: an explicit probe is a cost dial, not a contract
    Hnsw.annQueryAdaptive(stamped(0.97, 10), q, k = 10, ef = 2, probeCells = 4).count()
    assert(Set("pruned-scan", "exact-scan").contains(Hnsw.lastDecayPick.get()),
      "an explicit probe must not open the kernel gate")
    // GATE SHUT 5 (ADVICE r14): the stamp was measured at a LARGER probe
    // than the contract pick — routing coverage at query time is lower
    // than at stamp time, so the stamp is no bound and the gate must stay
    // shut (here: curve pick 4 < stamp_probe 8)
    val wideStamp = base.copy(calibration = curve,
      pq = base.pq.map(_.copy(refineRecall = 0.97, refine = 60, recallK = 10,
        stampProbe = 8)))
    Hnsw.annQueryAdaptive(wideStamp, q, k = 10, ef = 2).count()
    assert(Set("pruned-scan", "exact-scan").contains(Hnsw.lastDecayPick.get()),
      "a stamp measured above the query-time probe must not open the gate")
    // ...but a pick at or above the stamp probe re-opens it: target 0.97
    // needs the curve's 16-cell point (>= stamp_probe 8), and 0.97 <= stamp
    Hnsw.annQueryAdaptive(wideStamp.copy(pq = wideStamp.pq.map(_.copy(refineRecall = 0.98))),
      q, k = 10, ef = 2, recallTarget = 0.97).count()
    assert(Hnsw.lastDecayPick.get() === "pq-kernel",
      "a query-time probe at/above the stamp probe satisfies the coverage gate")
    // an explicitly recorded stamp_probe equal to the pick opens too
    Hnsw.annQueryAdaptive(stamped(0.97, 10).copy(
      pq = stamped(0.97, 10).pq.map(_.copy(stampProbe = 4))), q, k = 10, ef = 2).count()
    assert(Hnsw.lastDecayPick.get() === "pq-kernel",
      "stamp_probe == contract pick must keep the gate open")
    built.nodes.unpersist()
  }
}
