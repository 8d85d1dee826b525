package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Datagen

/** Scale proof for [[graft.operators.Dedup.semanticDedup]] — the embedding
  * twin of [[TextScaleProof]]'s span-dedup phases: 5M base vectors (dim 64)
  * + 1% planted near-duplicates (id + n carries id's vector perturbed by
  * +0.001 per component, the [[ScaleProof]] phase-5 convention), then the
  * END-TO-END verdict — blocking, capped within-block pairs, connected
  * components, keep/drop — in one call.
  *
  * The scale lesson this run encodes: `bits` must grow with corpus size.
  * At bits=8 every one of the 256 blocks holds ~20k vectors, so the
  * in-block pairwise pass explodes (and `maxBlock` would drop every
  * block); at bits=16 the 65k blocks average ~77 vectors and the pairwise
  * work is trivial, while a ±0.001 perturbation still lands in the same
  * block >98% of the time (a sign-group flip needs |group sum| < 0.004).
  *
  * Correctness gates, sharp at 5M: every flagged duplicate's canonical
  * must be exactly its base (id − n) — uniform random dim-64 vectors
  * essentially never reach cosine distance < 0.05, so organic pairs and
  * false merges are ~0 — and ≥95% of the plants must be flagged (the
  * bucket-flip tail is the documented recall/cost dial, measured here).
  * Prints one JSON line, committed as `BENCH_SCALE_SEMDEDUP.json`. Run:
  *
  *   SPARK_DRIVER_MEM=64g sbt "runMain graft.SemDedupScaleProof [n]"
  */
object SemDedupScaleProof {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val dim = 64
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-semdedup-scale-proof")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      // bounded-heap TopK aggregations (TypedImperative) stay in the HASH
      // aggregation path instead of sort-falling-back at 128 keys; each
      // buffer holds <= k entries, so 1M keys is a few hundred MB worst case
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      // local mode frees shuffle files only when the ContextCleaner GCs
      // dereferenced RDDs; a 96g heap never GCs naturally, so multi-phase
      // proofs accumulate every stage's shuffle spill until ENOSPC
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val input = Datagen.hashVectors(spark, n, dim)
    val planted = input.filter(col("id") % 100 === 0)
      .select((col("id") + n).as("id"),
        transform(col("vector"), x => (x + lit(0.001f)).cast("float")).as("vector"))
    val corpus = input.union(planted).localCheckpoint()
    val nPlant = (n + 99) / 100
    System.err.println(s"[semdedup] corpus ${corpus.count()} vectors ($n base + $nPlant planted near-dups)")

    val ((dups, good), secs) = timed {
      val verdicts = Dedup.semanticDedup(corpus, "id", "vector", dim,
        bits = 16, maxDist = 0.05, maxBlock = 10000).localCheckpoint()
      (verdicts.filter(col("is_dup")).count(),
        verdicts.filter(col("is_dup") && col("canonical_id") === col("id") - n).count())
    }
    val falseMerges = dups - good
    require(falseMerges <= 5,
      s"$falseMerges flagged duplicates whose canonical is not their planted base")
    require(good >= (nPlant * 95) / 100,
      s"only $good/$nPlant plants flagged — below the 95% bucket-retention floor")
    System.err.println(f"[semdedup] verdicts: $dups flagged, $good/$nPlant plants with the " +
      f"exact base as canonical, $falseMerges false merges in $secs%.1f s")

    // phase 2: INGEST — a 50k batch statused against the 5M corpus
    // (incrementalSemanticDedup, the q78 path). Half the batch is exact
    // re-encodings of corpus vectors, half is fresh; the verdicts must
    // split exactly, and the corpus must never be self-compared (cost is
    // one bucketed equi-join, not a corpus re-cluster). bits auto-sizes
    // from the corpus count (autoBits → 17 at 5M).
    val batchDup = input.filter(col("id") % 100 === 50).limit(25000)
      .select((col("id") + lit(20000000L)).as("id"), col("vector"))
    val batchNew = Datagen.hashVectors(spark, 25000, dim, seed = 777)
      .select((col("id") + lit(30000000L)).as("id"), col("vector"))
    val batch = batchDup.union(batchNew).localCheckpoint()
    val nBatch = batch.count()
    val (ingest, ingestSecs) = timed {
      val v = Dedup.incrementalSemanticDedup(batch, input, "id", "vector", dim,
        maxDist = 0.05, maxBlock = 10000).localCheckpoint()
      (v.filter(col("status") === "semantic_dup" && col("id") < 30000000L).count(),
        v.filter(col("status") === "new" && col("id") >= 30000000L).count())
    }
    val (dupHits, newHits) = ingest
    require(dupHits >= 25000L * 95 / 100,
      s"only $dupHits/25000 re-encoded batch rows flagged semantic_dup")
    require(newHits >= 25000L * 95 / 100,
      s"only $newHits/25000 fresh batch rows statused new")
    System.err.println(f"[semdedup] ingest: $nBatch-row batch vs 5M corpus in $ingestSecs%.1f s " +
      f"($dupHits/25000 dups flagged, $newHits/25000 fresh passed)")

    val line = s"""{"n":$n,"dim":$dim,"bits":16,"max_dist":0.05,""" +
      s""""semdedup_sec":$secs,"flagged":$dups,"planted_flagged":$good,""" +
      s""""planted_total":$nPlant,"false_merges":$falseMerges,""" +
      s""""ingest_batch":$nBatch,"ingest_sec":$ingestSecs,""" +
      s""""ingest_dup_flagged":$dupHits,"ingest_new_passed":$newHits}"""
    println(line)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_SEMDEDUP_OUT", "BENCH_SCALE_SEMDEDUP.json")), line + "\n")
    catch { case e: Throwable => System.err.println(s"[semdedup] could not write artifact: $e") }
    spark.stop()
  }
}
