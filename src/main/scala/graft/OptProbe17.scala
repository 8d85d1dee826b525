package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17 optimization scratch probe: times named sub-plans of the expensive
  * bench queries with the noop sink (guide §1.4) so the computation is
  * measured, not the sink or count()'s column pruning. Local iteration
  * aid only — not part of the bench/verify surface.
  *
  * Usage: scripts/run_main.sh graft.OptProbe17 <probe> [reps]
  */
object OptProbe17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probe = args.headOption.getOrElse("bpe")
    val reps = if (args.length > 1) args(1).toInt else 3

    def tbl(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")
    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-44s min=${ts.min}%7.3f  reps=${ts.map(t => f"$t%.2f").mkString(" ")}")
    }

    probe match {
      case "bpe" =>
        val docs = tbl("documents")
        val merges = graft.operators.TextStats.bpeTrainMerges(docs, "text", merges = 5)
          .collect().sortBy(_.getInt(0))
          .map(r => (r.getString(1), r.getString(2))).toSeq
        val vocab = graft.operators.TextStats.bpeVocab(docs, "text", merges)
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          val n = graft.operators.TextStats.bpeVocab(docs, "text", merges).collect().length
          println(f"[probe] bpe.vocab collect rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n syms)")
        }
        // current shape: element_at on a broadcast map inside transform —
        // per-symbol O(|vocab|) interpreted scan
        time("bpe.encode CURRENT (element_at map)")(
          graft.operators.TextStats.bpeEncodeIds(docs, "doc_id", "text", merges))
        // driver-side alphabet ids (default-vocab path) must equal the
        // bpeVocab-plan ids (explicit-vocab path) exactly
        locally {
          val dflt = graft.operators.TextStats.bpeEncodeIds(docs, "doc_id", "text", merges)
            .select(col("doc_id"), col("token_ids").cast("string").as("t"))
          val expl = graft.operators.TextStats.bpeEncodeIds(docs, "doc_id", "text", merges,
              graft.operators.TextStats.bpeVocab(docs, "text", merges))
            .select(col("doc_id"), col("token_ids").cast("string").as("t"))
          val d = dflt.join(expl, Seq("doc_id"), "full_outer")
            .filter(!(dflt("t") <=> expl("t"))).count()
          println(s"[probe] bpe.default-vs-explicit-vocab diff rows = $d (n=${dflt.count()})")
        }
        // variant A: collect vocab once, UDF closes over a broadcast
        // Map[String, Long] — O(1) per symbol; split stays codegen'd
        locally {
          val spaced = concat(lit(" "),
            regexp_replace(col("text"), "(?s)(.)(?=.)", "$1  "), lit(" "))
          val chained = merges.foldLeft(spaced) { case (acc, (pair, merged)) =>
            call_function("replace", acc,
              lit(" " + pair.replace(" ", "  ") + " "), lit(s" $merged "))
          }
          val vmapLocal: Map[String, Long] = vocab.collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap
          val bc = spark.sparkContext.broadcast(vmapLocal)
          val encA = udf((syms: Seq[String]) => syms.map(s => bc.value.getOrElse(s, -1L)))
          def outA = docs
            .filter(trim(col(textColName)) =!= "")
            .select(col("doc_id"), encA(split(trim(chained), "  +")).as("token_ids"))
          time("bpe.encode A (udf on split array)")(outA)
          // variant B: UDF does trim+split+lookup from the chained string
          val encB = udf((s: String) => s.trim.split("  +").map(x => bc.value.getOrElse(x, -1L)))
          def outB = docs
            .filter(trim(col(textColName)) =!= "")
            .select(col("doc_id"), encB(chained).as("token_ids"))
          time("bpe.encode B (udf trim+split+lookup)")(outB)
          // bit-equality vs current
          val cur = graft.operators.TextStats.bpeEncodeIds(docs, "doc_id", "text", merges)
            .select(col("doc_id"), col("token_ids").cast("string").as("t"))
          val nwA = outA.select(col("doc_id"), col("token_ids").cast("string").as("t"))
          val diffA = cur.join(nwA, Seq("doc_id"), "full_outer")
            .filter(!(cur("t") <=> nwA("t"))).count()
          println(s"[probe] bpe.variantA vs current diff rows = $diffA (cur=${cur.count()})")
          val nwB = outB.select(col("doc_id"), col("token_ids").cast("string").as("t"))
          val diffB = cur.join(nwB, Seq("doc_id"), "full_outer")
            .filter(!(cur("t") <=> nwB("t"))).count()
          println(s"[probe] bpe.variantB vs current diff rows = $diffB")
          println("[probe] schemas: cur=" +
            graft.operators.TextStats.bpeEncodeIds(docs, "doc_id", "text", merges).schema.sql +
            " A=" + outA.schema.sql + " B=" + outB.schema.sql)
        }
        time("bpe.pack full CURRENT")(
          graft.operators.Packing.packTokenIds(docs, "doc_id", "text", merges, targetTokens = 5000))
      case "q60" =>
        import graft.operators.Dedup
        val docs = tbl("documents")
        def sigs = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, h = 4)
        def pairs = Dedup.lshCandidatePairs(sigs, "doc_id", h = 4, rows = 2, maxBandSize = 1000)
          .select("id_a", "id_b").distinct()
        time("q60.pairs alone")(pairs)
        time("q60.full CURRENT (pairs re-eval x3)")(
          Dedup.jaccardForPairs(pairs, docs, "doc_id", "text", n = 3, minJaccard = 0.4))
        time("q60.full pairs PRE-CKPT")(
          Dedup.jaccardForPairs(pairs.localCheckpoint(), docs, "doc_id", "text", n = 3, minJaccard = 0.4))
      case "q93" =>
        val e = tbl("embeddings").select(col("vec_id").as("id"), col("embedding").as("vector"))
        time("q93.full CURRENT")(
          graft.operators.Ivf.kmeansExact(e, k = 8, iters = 2))
        // how much of it is re-deriving pts (scan+posexplode+floor) 5x?
        locally {
          val pts = e.select(col("id"),
              posexplode(graft.functions.Distances.toDouble(col("vector"))).as(Seq("d", "x")))
            .select(col("id"), col("d"),
              floor((col("x") + lit(4.0)) * lit((1L << 20).toDouble)).cast("long").as("qv"))
          time("q93.pts once")(pts)
        }
      case "q55" =>
        import graft.operators.Dedup
        val docs = tbl("documents")
        def mkPairs = {
          val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, h = 4)
            .localCheckpoint()
          Dedup.lshCandidatePairs(sigs, "doc_id", h = 4, rows = 2, maxBandSize = 1000)
            .select("id_a", "id_b").distinct()
        }
        (1 to reps).foreach { i =>
          val t0 = System.nanoTime()
          val cl = Dedup.dupClusters(docs, mkPairs, "doc_id")
          val t1 = System.nanoTime()
          cl.write.format("noop").mode("overwrite").save()
          println(f"[probe] q55.dupClusters rep $i construct=${(t1 - t0) / 1e9}%6.3f consume=${(System.nanoTime() - t1) / 1e9}%6.3f")
          graft.operators.Checkpoints.releaseTracked(spark)
        }
        // does Dataset.localCheckpoint(eager) fire observe metrics? If yes,
        // the convergence isEmpty job can fuse into the materialize job.
        locally {
          val obs = new org.apache.spark.sql.Observation("conv")
          val df = spark.range(100).toDF("id").observe(obs, sum(col("id")).as("s"))
          val cp = df.localCheckpoint()
          val got = try {
            val f = obs.getClass.getDeclaredMethod("getOrEmpty")
            f.setAccessible(true)
            Some(f.invoke(obs))
          } catch { case _: Throwable => None }
          println(s"[probe] q55.observe-on-localCheckpoint -> $got (rows=${cp.count()})")
        }
      case other => System.err.println(s"unknown probe $other")
    }
    spark.stop()
  }

  private val textColName = "text"
}
