package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Pipeline
import graft.sources.Datagen

/** Scale proof for the END-TO-END `--prepare` pipeline — the capstone
  * composition ([[graft.operators.Pipeline]]) exercised at 1M+ docs with
  * planted outcomes for every stage, gated sharply:
  *
  *   - junk docs (giant single words, no stopwords) → quality gate drops;
  *   - planted exact duplicates (higher ids) → dedup drops the copies,
  *     keeps the canonical bases;
  *   - a benchmark built from 99 base docs → decontamination drops
  *     exactly those bases (their shingle sets are organically unique at
  *     a 100k-word vocabulary);
  *   - a per-source token quota → per-source kept tokens land in
  *     [Q, Q + largest-kept-bin) — the tokenBudgetSelect contract;
  *   - the curriculum export writes internally-sorted, range-disjoint
  *     files.
  *
  * Prints one JSON line, committed as `BENCH_SCALE_PREPARE.json`. Run:
  *
  *   SPARK_DRIVER_MEM=64g sbt "runMain graft.PrepareScaleProof [n]"
  */
object PrepareScaleProof {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-prepare-scale-proof")
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

    val nPlant = n / 100
    val base = Datagen.syntheticDocs(spark, n)
      .withColumn("source", concat(lit("s"), pmod(col("doc_id"), lit(20L)).cast("string")))
      // ids ≡ 0 (mod 1000): junk — one 2500-char word, no stopwords
      .withColumn("text",
        when(col("doc_id") % 1000 === 0, concat(lit("j"), repeat(lit("x"), 2499)))
          .otherwise(col("text")))
    // exact duplicates: ids [n, n+nPlant) copy id·100's text (same shape
    // as TextScaleProof) — copies are higher ids, so canonicals survive
    val dups = base.filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") / 100 + n).cast("long").as("doc_id"),
        col("source"), col("text"))
    val corpus = base.unionAll(dups).localCheckpoint()
    val total = corpus.count()
    // benchmark: base ids 101..199 (none junk, none a dup base)
    val bench = corpus.filter(col("doc_id") >= 101 && col("doc_id") <= 199 &&
      col("doc_id") % 100 =!= 0).select("doc_id", "text").localCheckpoint()
    val nBench = bench.count()
    System.err.println(s"[prepscale] corpus $total docs, $nBench benchmark docs")

    val quota = 1000000L // ~1M tokens/source of ~4M available
    val t0 = System.nanoTime()
    val prepared = Pipeline.prepare(corpus, "doc_id", "source", "text",
      bench = Some(bench), quota = quota, numShards = 64).localCheckpoint()
    val kept = prepared.count()
    val prepSecs = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[prepscale] prepare: $kept of $total docs kept in $prepSecs%.1f s")

    // ---- gate 1: planted exclusions are ALL absent ----
    val junkKept = prepared.filter(col("doc_id") % 1000 === 0 && col("doc_id") < n).count()
    val dupKept = prepared.filter(col("doc_id") >= n).count()
    val benchKept = prepared.join(bench.select("doc_id"), "doc_id").count()
    require(junkKept == 0, s"$junkKept junk docs survived the quality gate")
    require(dupKept == 0, s"$dupKept planted dup copies survived dedup")
    require(benchKept == 0, s"$benchKept benchmark docs survived decontamination")

    // ---- gate 2: per-source kept tokens honor the quota contract:
    // Q ≤ kept < Q + largest kept bin's tokens (boundary-bin overshoot) ----
    val perSource = prepared.groupBy("source")
      .agg(sum("n_tok").as("kept_tok"), count(lit(1)).as("n_docs")).collect()
    require(perSource.length == 20, s"expected 20 sources, got ${perSource.length}")
    val binTok = prepared.groupBy("source", "bin").agg(sum("n_tok").as("bt"))
      .groupBy("source").agg(max("bt").as("max_bin_tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { r =>
      val (src, keptTok) = (r.getString(0), r.getLong(1))
      require(keptTok >= quota, s"$src kept $keptTok < quota $quota")
      require(keptTok - quota < binTok(src),
        s"$src overshoot ${keptTok - quota} exceeds its largest bin ${binTok(src)}")
    }
    System.err.println(f"[prepscale] quota: all 20 sources in [$quota, +largest-bin) tokens")

    // ---- gate 3: curriculum export — internally sorted, range-disjoint ----
    val outDir = java.nio.file.Files.createTempDirectory("prepscale-out").toString
    val t1 = System.nanoTime()
    val nFiles = Pipeline.writeCurriculum(prepared, outDir, "doc_id",
      recordsPerFile = 100000)
    val writeSecs = (System.nanoTime() - t1) / 1e9
    val back = spark.read.parquet(outDir)
    require(back.count() == kept, "export row count mismatch")
    val files = new java.io.File(outDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    // spot-check 3 files for internal sortedness
    files.take(3).foreach { f =>
      val rows = spark.read.parquet(f).select("ck", "h", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      require(rows.sameElements(rows.sortBy(identity)), s"$f not internally sorted")
    }
    System.err.println(f"[prepscale] export: $nFiles files in $writeSecs%.1f s")
    // clean the throwaway export
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(outDir)).iterator().asScala
      .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))

    // ---- WARC variant: the crawl-native front door at 1M records ----
    // real .warc/.warc.gz files (half gzipped) through parse -> HTML
    // strip -> URL first-wins dedup -> the same prepare chain. Planted
    // outcomes (Warc.writeSyntheticCrawl): per million records, 100k URL
    // re-fetches (URL dedup's prey), 2k junk bodies (gate), 99k exact-text
    // pairs (fingerprint dedup) -> kept = 0.799 * n exactly.
    val wn = n
    require(wn % 1000 == 0, "warc variant closed-form accounting needs n % 1000 == 0")
    val warcDir = java.nio.file.Files.createTempDirectory("prepscale-warc").toString
    val tGen = System.nanoTime()
    graft.sources.Warc.writeSyntheticCrawl(spark, warcDir, wn, nFiles = 64)
    val genSecs = (System.nanoTime() - tGen) / 1e9
    System.err.println(f"[prepscale] warc gen: $wn records, 64 files in $genSecs%.1f s")
    val t2 = System.nanoTime()
    val warcPrepared = Pipeline.prepareFromWarc(
      graft.sources.Warc.recordsFromFiles(
        graft.sources.Warc.readFiles(spark, s"$warcDir/*"))).localCheckpoint()
    val warcKept = warcPrepared.count()
    val warcSecs = (System.nanoTime() - t2) / 1e9
    val expectWarc = wn / 10 * 9 - 2 * (wn / 1000) - (wn / 10 - wn / 1000)
    require(warcKept == expectWarc,
      s"warc prepare kept $warcKept, expected $expectWarc")
    val refetchKept = warcPrepared.filter(col("text").startsWith("refetch")).count()
    require(refetchKept == 0, s"$refetchKept re-fetched URL bodies survived URL dedup")
    val dupTexts = warcKept - warcPrepared.select("text").distinct().count()
    require(dupTexts == 0, s"$dupTexts duplicate texts survived fingerprint dedup")
    System.err.println(f"[prepscale] warc: $warcKept of $wn records kept in $warcSecs%.1f s " +
      "(URL dedup, gate, fingerprint dedup all landed)")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(warcDir)).iterator().asScala
      .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))

    println(s"""{"n_docs":$total,"prepare_sec":$prepSecs,"kept":$kept,""" +
      s""""junk_kept":$junkKept,"dup_kept":$dupKept,"bench_kept":$benchKept,""" +
      s""""quota":$quota,"sources_ok":20,"write_sec":$writeSecs,"n_files":$nFiles,""" +
      s""""warc_records":$wn,"warc_prepare_sec":$warcSecs,"warc_kept":$warcKept,""" +
      s""""warc_refetch_kept":$refetchKept,"warc_dup_texts":$dupTexts}""")
    spark.stop()
  }
}
