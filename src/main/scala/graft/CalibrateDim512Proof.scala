package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.{Hnsw, HnswParams}

/** Recall-target calibration sweep (VERDICT r11 item 3): at 1M × dim-512,
  * [[Hnsw.calibrateProbeCells]] must turn targets 0.90 / 0.95 / 0.99 into
  * probe budgets whose MEASURED recall@10 on held-out queries lands within
  * ±0.02 of each target (calibration queries: id % (n/100) == 0; held-out:
  * a disjoint modulus class). Builds the routed index once and saves it to
  * the arg-1 dir for reuse (loads it when already present). Prints one
  * JSON line, committed as `BENCH_SCALE_CALIBRATE512.json`. Run:
  *
  *   SPARK_DRIVER_MEM=96g scripts/run_main.sh graft.CalibrateDim512Proof /root/scale/idx512_1m
  */
object CalibrateDim512Proof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/scale/idx512_1m")
    val n = args.lift(1).map(_.toLong).getOrElse(1_000_000L)
    val dim = 512
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-calibrate-512-proof")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.sql.adaptive.enabled", "true")
      // safety net for stats mis-estimates on expression-generated input
      // (ArrayType defaultSize): a wrongly-planned broadcast then fails
      // fast in planning review, not as a hung task-result-getter
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val index0 =
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$dir/meta.json"))) {
        System.err.println(s"[calibrate512] loading $dir")
        Hnsw.load(spark, dir)
      } else {
        val input = graft.sources.Datagen.hashVectors(spark, n, dim)
        val params = HnswParams(dim = dim, m = 16, efConstruction = 200,
          metric = "cosine", numPartitions = 64)
        val t0 = System.nanoTime()
        val idx = Hnsw.buildRouted(input, params, cellsPerShard = 4)
        idx.edges.count()
        System.err.println(f"[calibrate512] built $n x $dim in " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s")
        // autoCalibrate = false: this proof's entire point is measuring
        // calibration itself (calSec below) — save's built-in pass would
        // double-pay it and hide the cost being reported (ADVICE r14)
        Hnsw.save(idx, dir, autoCalibrate = false)
        idx
      }
    val index = index0.copy(nodes = index0.nodes.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val nn = index.meta.num_nodes
    index.nodes.count()

    def timed[T](f: => T): (T, Double) = {
      val s = System.nanoTime(); val r = f; (r, (System.nanoTime() - s) / 1e9)
    }
    // held-out queries: a modulus class DISJOINT from the calibration
    // sample (calibrateProbeCells samples id % (nn/100) == 0; offset by
    // half the step keeps the classes apart)
    val step = math.max(1L, nn / 100L)
    val heldOut = index.nodes
      .filter(!col("tombstone") && col("id") % step === step / 2)
      .groupBy(col("id")).agg(first(col("vector")).as("vector"))
      .select(col("id").as("qid"), col("vector")).localCheckpoint()
    val nQ = heldOut.count()
    val dist = graft.functions.Distances.metric(index.meta.metric)
    val uniq = index.nodes.filter(!col("tombstone"))
      .groupBy(col("id")).agg(first(col("vector")).as("vector"))
    val exact = graft.operators.Knn.exactTopK(uniq, heldOut, 10, dist).localCheckpoint()

    val targets = Seq(0.90, 0.95, 0.99)
    val results = targets.map { t =>
      val ((pc, curve), calSec) = timed(Hnsw.calibrateProbeCells(index, k = 10,
        recallTarget = t, sampleQueries = 100))
      val predicted = curve.filter(col("probe_cells") <= pc)
        .agg(max(col("predicted_recall"))).head().getDouble(0)
      val ann = Hnsw.annQueryRoutedExact(index, heldOut, k = 10, probeCells = pc)
      val measured = Hnsw.recallAtK(ann, exact, 10).agg(avg("recall")).head().getDouble(0)
      System.err.println(f"[calibrate512] target $t%.2f -> probe $pc " +
        f"(predicted $predicted%.4f), measured $measured%.4f on $nQ held-out q " +
        f"(calibration $calSec%.1f s)")
      require(measured >= t - 0.02,
        f"measured $measured%.4f more than 0.02 under target $t%.2f")
      (t, pc, predicted, measured, calSec)
    }

    val json = results.map { case (t, pc, pred, meas, sec) =>
      s"""{"target":$t,"probe_cells":$pc,"predicted":$pred,"measured":$meas,"calibrate_sec":$sec}"""
    }.mkString("[", ",", "]")
    println(s"""{"n":$nn,"dim":$dim,"num_cells":${index.meta.num_cells},""" +
      s""""held_out_q":$nQ,"targets":$json}""")
    spark.stop()
  }
}
