package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.hnsw.{Hnsw, PqSidecar}

/** VERDICT r12 items 3 + 4: the PQ sidecar's two open questions, measured
  * on the saved 5M×512 index.
  *
  * Item 4 (mode "mem", driver 96g, tables cached): does the batched
  * mapPartitions ADC kernel ([[graft.operators.Pq.pqScanRefinedKernel]])
  * remove the per-pair iteration overhead that made the codegen'd
  * expression ADC run at float-scan speed? Times coarse+refine end-to-end
  * at 100 and 1,000 uniform queries, kernel vs expression vs the exact
  * float scan, at the refine the r12 sweep needed for ≥0.94 recall
  * (3200) and at the cheap default (400).
  *
  * Item 3 (mode "lowmem", driver ~12g, NOTHING persisted): the sidecar's
  * claimed target regime — float table ≫ RAM, every pass streams parquet
  * from disk. The structural question it answers: the exact RESCORE is
  * itself one full-table disk pass (the candidate ids are uniform, so no
  * row group is skippable), so PQ-refined pays codes + that same pass,
  * and the mechanism predicts PQ ≥ exact in one-pass batch mode — this
  * run measures whether the predicted negative is real (win or documented
  * negative, either way committed).
  *
  * Prints one JSON line; committed as `BENCH_SCALE_PQ512_KERNEL.json`
  * (mem) / `BENCH_SCALE_PQ512_LOWMEM.json` (lowmem). Run:
  *
  *   SPARK_DRIVER_MEM=96g scripts/run_main.sh graft.PqKernelProof mem
  *   SPARK_DRIVER_MEM=12g scripts/run_main.sh graft.PqKernelProof lowmem
  */
object PqKernelProof {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("mem")
    val dir = args.lift(1).getOrElse("/root/scale/idx512")
    val pqDir = args.lift(2).getOrElse(s"${dir}_pq")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName(s"graft-pq-kernel-proof-$mode")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", if (mode == "mem") "3" else "2").toInt
    val m = 64
    val idx0 = Hnsw.load(spark, dir)
    val sidecar = PqSidecar(
      spark.read.parquet(s"$pqDir/pq_codebooks"),
      spark.read.parquet(s"$pqDir/pq_codes"), m)
    // mem: float table + codes cached (the r12 comparison's conditions);
    // lowmem: only the CODES persist (they are the thing that fits — the
    // whole point of the 32× cut); the float table streams from disk on
    // every pass, for both contenders
    val codesCached = sidecar.codes.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    codesCached.count()
    val base =
      if (mode == "mem") {
        val b = idx0.copy(nodes = idx0.nodes.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        b.nodes.count()
        b
      } else idx0
    val index = base.copy(pq = Some(sidecar.copy(codes = codesCached)))
    val n = index.meta.num_nodes

    def timedMin(f: => Long): Double =
      (1 to reps).map { _ => val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9 }.min
    def uniformSample(nQ: Long): DataFrame = index.nodes
      .filter(!col("tombstone") && col("id") % math.max(1L, n / nQ) === 0)
      .groupBy(col("id")).agg(first(col("vector")).as("vector"))
      .select(col("id").as("qid"), col("vector")).localCheckpoint()
    val dist = graft.functions.Distances.metric(index.meta.metric)
    def uniq = index.nodes.filter(!col("tombstone"))
      .groupBy(col("id")).agg(first(col("vector")).as("vector"))

    val batches = if (mode == "mem") Seq(100L, 1000L) else Seq(100L)
    val refines = Seq(400, 3200)
    val rows = batches.flatMap { nQ =>
      val s = uniformSample(nQ)
      val exactRef = graft.operators.Knn.exactTopK(uniq, s, 10, dist).localCheckpoint()
      val exactSec = timedMin(graft.operators.Knn.exactTopK(uniq, s, 10, dist).count())
      System.err.println(f"[pqkernel/$mode] $nQ q exact float scan: $exactSec%.1f s")
      refines.map { r =>
        val kernSec = timedMin(
          Hnsw.annQueryPqRefined(index, s, 10, refine = r, kernel = true).count())
        val exprSec = timedMin(
          Hnsw.annQueryPqRefined(index, s, 10, refine = r).count())
        val rec = Hnsw.recallAtK(
            Hnsw.annQueryPqRefined(index, s, 10, refine = r, kernel = true).localCheckpoint(),
            exactRef, 10)
          .agg(avg("recall")).head().getDouble(0)
        System.err.println(f"[pqkernel/$mode] $nQ q refine=$r: kernel $kernSec%.1f s, " +
          f"expression $exprSec%.1f s, exact $exactSec%.1f s (recall@10 $rec%.4f)")
        s"""{"queries":$nQ,"refine":$r,"kernel_sec":$kernSec,"expression_sec":$exprSec,""" +
          s""""exact_scan_sec":$exactSec,"recall10":$rec}"""
      }
    }
    println(s"""{"mode":"$mode","n":$n,"dim":${index.meta.dim},"m":$m,"reps":$reps,""" +
      s""""points":${rows.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
