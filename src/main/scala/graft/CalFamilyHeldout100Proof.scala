package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Distances
import graft.hnsw.Hnsw
import graft.operators.Knn

/** The k-family no-flag contract statistics at ≥100 held-out queries
  * (VERDICT r15 item 4): the committed 25/50-query contrasts left the
  * k=5 point (0.940) exactly on the target−0.01 line — one more
  * doubling settles whether that is sampling noise or a real ~1 pp
  * family-floor bias.
  *
  * 100 held-out queries (modulus class 1 — disjoint from the
  * calibration family's class 0 and the PQ stamp's class 3) can NOT be
  * pushed through one no-flag adaptive call: at ≥ ScanMinQueries=64
  * uniform queries the decay tier takes the exact scan (recall 1.0
  * whatever the probe), which would measure the chooser, not the curve.
  * So the 100 queries run as FOUR disjoint 25-query batches — each
  * below the floor, each a genuine no-flag probed-join contract call —
  * and recall pools over all 100. The per-batch recalls ARE the
  * clustered-noise estimate: their spread is the per-query-clustered sd
  * the single-number artifacts could only bound analytically.
  *
  * One exact-oracle pass at kMax=50 over the 100 queries serves every
  * k (truth at k is the rank ≤ k restriction — the same argument as
  * measureCurves). One untimed warm-up per plan family. Prints one JSON
  * line, committed as `BENCH_SCALE_CALFAMILY512_100Q.json`. Run:
  *
  *   SPARK_DRIVER_MEM=96g scripts/run_main.sh graft.CalFamilyHeldout100Proof /root/scale/idx512
  */
object CalFamilyHeldout100Proof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/scale/idx512")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-calfamily-100q-proof")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val idx0 = Hnsw.load(spark, dir)
    require(idx0.calibration.nonEmpty, s"$dir must carry calibration.json (run --calibrate)")
    val ks = Seq(5, 10, 50)
    ks.foreach(k => require(Hnsw.curveFor(idx0, k).isDefined, s"family must cover k=$k"))
    val index = idx0.copy(nodes = idx0.nodes.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val n = index.meta.num_nodes
    require(n > 0, s"$dir meta.num_nodes=$n — the proof needs a live count")
    index.nodes.count() // materialize the cache before any timing

    val nQ = 100L
    val nBatches = 4
    val step = math.max(1L, n / nQ)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("qid"))
    val sampleAll = index.nodes
      .filter(!col("tombstone") && col("id") % step === 1)
      .groupBy(col("id")).agg(first(col("vector")).as("vector"))
      .select(col("id").as("qid"), col("vector"))
      .withColumn("batch", (row_number().over(w) - 1) % nBatches)
      .localCheckpoint()
    val qCount = sampleAll.count()
    val batches: Seq[DataFrame] = (0 until nBatches).map { b =>
      sampleAll.filter(col("batch") === b).drop("batch").localCheckpoint()
    }
    batches.foreach { b =>
      require(b.count() < 64, "each batch must stay below the ScanMinQueries floor")
    }
    val uniq = index.nodes.filter(!col("tombstone"))
      .groupBy(col("id")).agg(first(col("vector")).as("vector"))

    // one exact pass at kMax over all 100 queries; per-k truth = rank ≤ k
    val kMax = ks.max
    val exactAll = Knn.exactTopK(uniq, sampleAll.drop("batch"), kMax,
      Distances.metric(index.meta.metric)).localCheckpoint()

    def timed[T](f: => T): (T, Double) = {
      val s = System.nanoTime(); val r = f; (r, (System.nanoTime() - s) / 1e9)
    }

    val rows = ks.map { k =>
      val exactK = exactAll.filter(col("rank") <= k)
      // warm the probed-join plan family once, untimed (first-plan JIT)
      Hnsw.annQueryAdaptive(index, batches.head, k = k).count()
      val perBatch = batches.zipWithIndex.map { case (b, i) =>
        val (ann, sec) = timed(
          Hnsw.annQueryAdaptive(index, b, k = k).localCheckpoint())
        val probe = Hnsw.lastAdaptiveProbe.get()
        val pick = Hnsw.lastDecayPick.get()
        require(pick.startsWith("probed"),
          s"batch $i at k=$k took '$pick' — the contrast needs the probed join")
        // recallAtK averages over the EXACT frame's qids — restrict the
        // truth to this batch or the 75 out-of-batch queries dilute the
        // mean to ~recall/4
        val exactB = exactK.join(b.select("qid"), Seq("qid"), "left_semi")
        val rec = Hnsw.recallAtK(ann, exactB, k).agg(avg(col("recall"))).head().getDouble(0)
        System.err.println(f"[calfamily100] k=$k batch $i: recall $rec%.4f " +
          f"(probe $probe, pick $pick, $sec%.1f s)")
        (rec, probe, sec)
      }
      val recs = perBatch.map(_._1)
      val pooled = recs.sum / recs.size
      val mean = pooled
      val sdBatch = math.sqrt(recs.map(r => (r - mean) * (r - mean)).sum / (recs.size - 1))
      val sdPooled = sdBatch / math.sqrt(recs.size.toDouble)
      val probes = perBatch.map(_._2).distinct
      require(probes.size == 1, s"probe must be deterministic per k, got $probes")
      System.err.println(f"[calfamily100] k=$k pooled recall $pooled%.4f " +
        f"(batch sd $sdBatch%.4f, pooled sd $sdPooled%.4f, probe ${probes.head})")
      s"""{"k":$k,"pooled_recall":$pooled,"batch_recalls":${recs.mkString("[", ",", "]")},""" +
        s""""batch_sd":$sdBatch,"pooled_sd":$sdPooled,"family_probe":${probes.head},""" +
        s""""batch_secs":${perBatch.map(_._3).mkString("[", ",", "]")}}"""
    }
    println(s"""{"n":$n,"dim":${index.meta.dim},"num_cells":${index.meta.num_cells},""" +
      s""""queries":$qCount,"batches":$nBatches,"target":0.95,""" +
      s""""points":${rows.mkString("[", ",", "]")},""" +
      s""""note":"r16 (VERDICT r15 item 4): the no-flag k-family contract at 100 held-out """ +
      s"""queries (modulus class 1), run as 4 disjoint 25-query batches so each call stays """ +
      s"""below the ScanMinQueries=64 floor and genuinely exercises the probed join - one """ +
      s"""no-flag adaptive call per batch, recall pooled over all 100. batch_sd is the """ +
      s"""MEASURED per-25-query-batch spread (the per-query-clustered noise the earlier """ +
      s"""artifacts bounded analytically); pooled_sd = batch_sd/2. One exact-oracle pass at """ +
      s"""kMax=50 serves every k by rank restriction. Supersedes the 25q/50q runs in """ +
      s"""BENCH_SCALE_CALFAMILY512.json as the held-out headline."}""")
    spark.stop()
  }
}
