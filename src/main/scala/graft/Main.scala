package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.hnsw.{Hnsw, HnswParams}
import graft.sources.Datagen

/** spark-submit CLI with the reference's flag surface (`hsnw_trial.py:450-481`):
  *
  *   --build --n N --dim D --out DIR [--M --efc --efs --mL --metric --seed --partitions]
  *           [--input PARQUET | --input-idx IDX3-UBYTE(.gz) | --input-cifar CIFAR10-BIN(.gz)]
  *   --load DIR [--query-file PARQUET] [--k K] [--ef EF] [--max-queries N] [--out DIR]
  *   --compact DIR --out DIR [--target-shards N]
  *
  * plus the dedup-pipeline surface (S2 parity for the corpus-prep half):
  *
  *   --dedup-spans PARQUET --out DIR    span-level exact substring dedup report
  *   --scrub PARQUET --corpus PARQUET --out DIR    ingest-time span scrub
  *   --semdedup PARQUET --out DIR       semantic dedup verdicts (auto bits)
  *   --bm25 PARQUET --terms t1,t2 --out DIR    lexical / hybrid-RRF search
  *   --phash PARQUET --out DIR [--pairs-out DIR]    image perceptual hashes + near-dup pairs
  *   --shards PARQUET --out DIR         deterministic per-epoch training-shard export
  *   --datacard PARQUET --out DIR       per-(source, lang) corpus composition table
  *   --kmeans PARQUET --out DIR         exact fixed-point k-means assignment
  *   --ppl-buckets PARQUET --out DIR    CCNet-style head/middle/tail perplexity thirds
  *   --lm-train PARQUET --out DIR       frozen bigram-LM artifact (+ optional held-out --score)
  *   --domain-cap PARQUET --out DIR     per-domain top-N quality cap (anti-domination)
  *   --decontam PARQUET --bench PARQUET --out DIR   semantic decontamination verdicts
  *   --kmv PARQUET --out DIR            KMV per-group distinct-vocabulary sketch
  *   --nb-train PARQUET --out DIR       Naive-Bayes quality filter (+ optional --score)
  *   --signature PARQUET --out DIR      per-source TF-IDF signature terms
  *   --token-budget PARQUET --out DIR   per-source best-quality quota fill
  *   --epoch-upsample PARQUET --out DIR materialize the training mixture (capped
  *                                      whole epochs + hash-bin fractional epoch)
  *   --embedding-outliers PARQUET --out DIR   fixed-point centroid-distance scrub
  *   --diversity-sample PARQUET --out DIR     per-sign-LSH-cell cap (coreset)
  *   --vocab-drift PARQUET --ref PARQUET --out DIR   snapshot drift monitor
  *   --dsir-select PARQUET --target PARQUET --out DIR   DSIR importance
  *                                      selection (--quota, --buckets, --ngram)
  *   --posting-lists PARQUET --out DIR  delta-encoded inverted-index postings
  *                                      (--min-df, --max-df)
  *   --length-quantiles PARQUET --out DIR   exact per-source p50/p90/p99
  *   --cms-audit PARQUET --out DIR      Count-Min sketch vs exact counts
  *   --scrub-boilerplate PARQUET --out DIR    host-template line removal
  *                                      (--host-col, --min-docs, --min-frac)
  *   --prepare PARQUET --out DIR        END-TO-END corpus prep: quality gate ->
  *                                      dedup -> decontam -> budget -> curriculum shards
  *   --prepare --input-warc GLOB --out DIR   crawl-native prep: raw .warc(.gz) ->
  *                                      record parse -> HTML strip -> URL first-wins
  *                                      dedup -> the same prepare stage chain
  *   --gen-warc OUT --n N --files F     synthetic crawl fixture (real WARC files;
  *                                      --links plants outbound anchors)
  *   --link-graph --input-warc GLOB --out DIR   host degree views + fixed-point
  *                                      PageRank-lite off raw crawl payloads
  *   (--canonical-urls on the WARC path normalizes URLs before first-wins dedup)
  *
  * `--serve` is intentionally absent (BASELINE.json scope: batch index
  * construction, no query serving); batch query over a file replaces it
  * (reference `_cli_query`, `hsnw_trial.py:417-427`).
  */
object Main {

  private[graft] def parseArgs(args: Array[String]): Map[String, String] = {
    val flags = Set("--build", "--serve", "--large", "--routed", "--adaptive",
      "--exact-probe", "--link-graph", "--canonical-urls", "--links",
      "--no-calibrate", "--pq-kernel") // boolean flags
    // the ONLY value-taking flag that may legitimately appear without a
    // value (`--prepare --input-warc GLOB` marks prepare mode with the
    // input coming from the WARC glob). Every other flag followed by a
    // flag — or trailing — is a forgotten value and must error LOUDLY
    // here, not downstream as spark.read.parquet("true").
    val valuelessOk = Set("--prepare")
    @annotation.tailrec
    def go(rest: List[String], acc: Map[String, String]): Map[String, String] = rest match {
      case Nil => acc
      case f :: tail if flags.contains(f) => go(tail, acc + (f.drop(2) -> "true"))
      case k :: v :: tail if valuelessOk.contains(k) && v.startsWith("--") =>
        go(v :: tail, acc + (k.drop(2) -> "true"))
      case k :: Nil if valuelessOk.contains(k) => acc + (k.drop(2) -> "true")
      case k :: v :: tail if k.startsWith("--") && v.startsWith("--") =>
        throw new IllegalArgumentException(s"flag '$k' requires a value (got '$v')")
      case k :: Nil if k.startsWith("--") =>
        throw new IllegalArgumentException(s"flag '$k' requires a value")
      case k :: v :: tail if k.startsWith("--") => go(tail, acc + (k.drop(2) -> v))
      case other :: _ => throw new IllegalArgumentException(s"unexpected argument '$other'")
    }
    go(args.toList, Map.empty)
  }

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .appName("graft-hnsw")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, opts)
    finally spark.stop()
  }

  /** Vector/ANN modes whose plans aggregate through BOUNDED TopK heaps
    * (TypedImperative, ≤ k entries per key): these get the raised
    * ObjectHashAggregate sort-fallback threshold so 1M-key top-k merges
    * stay in the hash path (the r10 spill root-cause). Document-pipeline
    * modes are deliberately NOT listed — their TypedImperative buffers
    * (collect_list of whole documents in the boilerplate-scrub reassembly,
    * KMV sketches over raw lines) are unbounded per key, and a raised
    * threshold there would hold up to 1M unspillable full-document buffers
    * per task before sort fallback: those modes run at Spark's default.
    */
  private val topKHeapModes =
    Set("build", "load", "eval-recall", "compact", "kmeans",
      "embedding-outliers", "semdedup", "gen-queries")

  /** Raise the ObjectHashAggregate sort-fallback threshold for `body`,
    * restoring the previous session value after — the threshold applies at
    * job execution, and every CLI mode executes its jobs inside its own
    * branch, so branch scope is execution scope.
    */
  private def withTopKHashAgg[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "1048576")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  def run(spark: SparkSession, opts: Map[String, String]): Unit =
    if (topKHeapModes.exists(opts.contains)) withTopKHashAgg(spark)(runMode(spark, opts))
    else runMode(spark, opts)

  private def runMode(spark: SparkSession, opts: Map[String, String]): Unit = {
    if (opts.contains("build")) {
      val n = opts.getOrElse("n", "1000").toLong
      val dim = opts.getOrElse("dim", "64").toInt
      val out = opts.getOrElse("out", sys.error("--build requires --out DIR"))
      val params = HnswParams(
        dim = dim,
        m = opts.getOrElse("M", "16").toInt,
        efConstruction = opts.getOrElse("efc", "200").toInt,
        efSearch = opts.getOrElse("efs", "50").toInt,
        mL = opts.get("mL").map(_.toDouble).getOrElse(Double.NaN),
        metric = opts.getOrElse("metric", "l2"),
        numPartitions = opts.getOrElse("partitions", "16").toInt)
      val input = (opts.get("input"), opts.get("input-idx"), opts.get("input-cifar")) match {
        case (Some(path), _, _) => spark.read.parquet(path)
        // raw Fashion-MNIST-style idx3-ubyte(.gz) — the reference's actual
        // dataset format, decoded natively (sources/Idx)
        case (None, Some(path), _) => graft.sources.Idx.readImages(spark, path)
        // raw cifar-10-binary data_batch_*.bin(.gz) — the reference's
        // second pipeline's distribution format (sources/Cifar); labels
        // ride along and are persisted for the label-join report when
        // --labels-out is given
        case (None, None, Some(path)) =>
          val cifar = graft.sources.Cifar.read(spark, path)
          opts.get("labels-out").foreach(lp =>
            cifar.select("id", "label").write.mode("overwrite").parquet(lp))
          cifar.select("id", "vector")
        case (None, None, None) => Datagen.gaussianVectors(spark, n, dim, opts.getOrElse("seed", "42").toLong)
      }
      val t0 = System.nanoTime()
      // --routed: locality-sharded build with a centroid routing table —
      // --load --routed then probes the nearest cells instead of all shards
      val index =
        if (opts.contains("routed"))
          Hnsw.buildRouted(input, params,
            cellsPerShard = opts.getOrElse("cells-per-shard", "4").toInt,
            spill = opts.getOrElse("spill", "0.15").toDouble)
        else Hnsw.build(input, params)
      // save auto-calibrates decayed routed indexes by default (the
      // no-flag recall contract, ~2% of build wall); --no-calibrate skips
      // the measurement pass (e.g. throwaway builds)
      Hnsw.save(index, out, autoCalibrate = !opts.contains("no-calibrate"))
      // meta.num_nodes = distinct vectors (a routed build also stores
      // spill copies of border vectors — those are storage, not corpus)
      val built = index.meta.num_nodes
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[build] indexed $built vectors dim=$dim in $secs%.1f s " +
        f"(${built / secs}%.1f vec/s) -> $out" +
        (if (opts.contains("routed")) f" [routed, ${index.meta.num_cells} cells]" else ""))

    } else if (opts.contains("load")) {
      val dir = opts("load")
      val index = Hnsw.load(spark, dir)
      val k = opts.getOrElse("k", "10").toInt
      val ef = opts.getOrElse("ef", "-1").toInt
      val queries: DataFrame = opts.get("query-file") match {
        case Some(path) =>
          val q = spark.read.parquet(path)
          opts.get("max-queries").map(m => q.limit(m.toInt)).getOrElse(q)
        case None => // reference default: query the index's own first vector
          index.nodes.orderBy("id").limit(1).select(col("id").as("qid"), col("vector"))
      }
      val t0 = System.nanoTime()
      // --large: the driver-free single-shuffle path (queries stay
      // distributed; the index is scanned once however big the file is) —
      // for query files too large to stream through the driver in chunks
      // --recall-target T: calibrate the probe budget for the target and
      // use it wherever a probe-taking path runs below (the C/4 default
      // becomes a measured contract — Hnsw.calibrateProbeCells)
      val probeCellsOpt = opts.get("recall-target") match {
        case Some(t) =>
          val (pc, _) = Hnsw.calibrateProbeCells(index, k, t.toDouble,
            sampleQueries = opts.getOrElse("calibrate-sample", "100").toInt)
          println(s"[calibrate] recall target $t -> probeCells $pc")
          pc
        case None => opts.getOrElse("probe-cells", "-1").toInt
      }
      val res =
        // --pq-refine R: ADC byte-code coarse + exact rescore (needs a
        // sidecar in the index dir — --attach-pq writes one)
        if (opts.contains("pq-refine")) Hnsw.annQueryPqRefined(index, queries, k,
          probeCells = probeCellsOpt, refine = opts("pq-refine").toInt,
          kernel = opts.contains("pq-kernel"))
        // --exact-probe: brute force within probed shards (recall = routing
        // recall; exact at full probe) — the small-batch/high-dim engine
        else if (opts.contains("exact-probe")) Hnsw.annQueryRoutedExact(index, queries, k,
          probeCells = probeCellsOpt)
        // --refine R: routed traversal top-R -> layer-0 expansion -> exact
        // rescore (see annQueryRoutedRefined scaladoc for when this wins)
        else if (opts.contains("refine")) Hnsw.annQueryRoutedRefined(index, queries, k,
          probeCells = probeCellsOpt, ef = ef,
          refine = opts("refine").toInt,
          expandHops = opts.getOrElse("hops", "1").toInt)
        else if (opts.contains("routed")) Hnsw.annQueryRouted(index, queries, k,
          probeCells = probeCellsOpt, ef = ef)
        // --adaptive: routed when the probed-shard union actually prunes,
        // all-shard when a dispersed batch would probe most shards anyway
        else if (opts.contains("adaptive")) Hnsw.annQueryAdaptive(index, queries, k,
          probeCells = probeCellsOpt, ef = ef)
        else if (opts.contains("large")) Hnsw.annQueryLarge(index, queries, k, ef)
        // no path flag: a routed index gets the regime-aware chooser (the
        // decay tier picks exact-probed where the ef dial measurably loses
        // — 5M×512; the cost tiers pick routed vs all-shard below that);
        // a plain index gets the batch path, which itself auto-dispatches
        // multi-chunk query files to the driver-free plan
        else if (index.centroids.isDefined) Hnsw.annQueryAdaptive(index, queries, k,
          probeCells = probeCellsOpt, ef = ef)
        else Hnsw.annQuery(index, queries, k, ef)
      // surface the no-flag recall contract when it engaged: an index
      // saved/--calibrate'd with a curve serves plain queries at the
      // 0.95-target probe instead of the C/4 heuristic (r14 default)
      if (!Seq("pq-refine", "exact-probe", "refine", "routed", "large")
            .exists(opts.contains) &&
          index.centroids.isDefined && probeCellsOpt <= 0 &&
          Hnsw.cachedProbeFor(index, k, Hnsw.DefaultRecallTarget).isDefined)
        println(s"[query] calibrated default: recall target ${Hnsw.DefaultRecallTarget} " +
          s"-> probe ${Hnsw.lastAdaptiveProbe.get()} cells (from calibration.json)")
      opts.get("out") match {
        case Some(out) =>
          res.write.mode("overwrite").parquet(out)
          println(s"[query] wrote results -> $out")
        case None => res.show(50, truncate = false)
      }
      println(f"[query] done in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    } else if (opts.contains("eval-recall")) {
      // recall@k of the ANN path vs the exact oracle on sampled queries
      // (the reference's declared-but-unimplemented evaluation, SURVEY D8)
      val dir = opts("eval-recall")
      val index = Hnsw.load(spark, dir)
      val k = opts.getOrElse("k", "10").toInt
      val ef = opts.getOrElse("ef", "-1").toInt
      val sampleMod = opts.getOrElse("sample-mod", "1000").toLong
      // one row per id: a routed index stores spill copies of border
      // vectors, which would otherwise occupy two ranks in the exact
      // oracle and double queries
      val uniq = index.nodes.filter(!col("tombstone"))
        .groupBy(col("id")).agg(first(col("vector")).as("vector"))
      val queries = uniq.filter(col("id") % sampleMod === 0)
        .select(col("id").as("qid"), col("vector"))
      val dist = graft.functions.Distances.metric(index.meta.metric)
      val t0 = System.nanoTime()
      val ann =
        // adaptive: eval queries are a uniform sample of the index, the
        // dispersed shape where always-routed loses to all-shard
        if (index.centroids.isDefined) Hnsw.annQueryAdaptive(index, queries, k, ef = ef)
        else Hnsw.annQuery(index, queries, k, ef)
      val exact = graft.operators.Knn.exactTopK(uniq, queries, k, dist)
      val recall = Hnsw.recallAtK(ann, exact, k)
        .agg(avg("recall").as("avg"), min("recall").as("min"), count(lit(1)).as("n"))
        .head()
      println(f"[eval] recall@$k avg=${recall.getDouble(0)}%.4f min=${recall.getDouble(1)}%.4f " +
        f"over ${recall.getLong(2)} queries in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    } else if (opts.contains("compact")) {
      // streaming maintenance pass: fold accumulated appended shards back
      // into the base sharding. A routed index keeps its cell geometry and
      // routed query path (Hnsw.compactRouted — exact pid % P fold); a
      // plain index merges its sub-graphs into --target-shards balanced
      // shards (Hnsw.compact). Build params are reused from the index meta.
      val dir = opts("compact")
      val out = opts.getOrElse("out", sys.error("--compact requires --out DIR"))
      val index = Hnsw.load(spark, dir)
      val t0 = System.nanoTime()
      val compacted =
        if (index.centroids.isDefined) Hnsw.compactRouted(index, Hnsw.paramsOf(index.meta))
        else Hnsw.compact(index,
          opts.getOrElse("target-shards", index.meta.num_partitions.toString).toInt)
      Hnsw.save(compacted, out, autoCalibrate = !opts.contains("no-calibrate"))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[compact] ${index.meta.num_nodes} -> ${compacted.meta.num_nodes} live vectors, " +
        f"${compacted.meta.num_partitions} shards in $secs%.1f s -> $out" +
        (if (index.centroids.isDefined) f" [routed, ${compacted.meta.num_cells} cells kept]" else ""))

    } else if (opts.contains("attach-pq")) {
      // train + attach the PQ byte-code sidecar to a saved index, then
      // measure and STAMP its refine-capped recall (pq_meta.json). The
      // stamp is what lets the adaptive chooser pick the ADC kernel —
      // but ONLY under a recall-target contract that the stamp clears
      // (explicit --recall-target / SET conf, or the calibrated no-flag
      // default); with no contract in force the sidecar stays the
      // explicit --pq-refine lever and the chooser's picks are unchanged
      // (PqScanSpec pins both sides of the gate)
      val dir = opts("attach-pq")
      val index = Hnsw.load(spark, dir)
      val t0 = System.nanoTime()
      val withPq = Hnsw.attachPq(index,
        m = opts.getOrElse("pq-m", "-1").toInt,
        kCells = opts.getOrElse("pq-cells", "256").toInt,
        sampleSize = opts.getOrElse("pq-sample", (1 << 17).toString).toInt,
        iters = opts.getOrElse("pq-iters", "3").toInt,
        measureK = opts.getOrElse("k", "10").toInt,
        measureRefine = opts.getOrElse("refine", "-1").toInt)
      val sc = withPq.pq.get
      sc.codebooks.write.mode("overwrite").parquet(s"$dir/pq_codebooks")
      sc.codes.write.mode("overwrite").parquet(s"$dir/pq_codes")
      Hnsw.writePqMeta(dir, index.meta.num_nodes, sc.refineRecall, sc.refine, sc.recallK,
        sc.stampProbe)
      val rows = spark.read.parquet(s"$dir/pq_codes").count()
      println(f"[attach-pq] m=${sc.m} codes for $rows rows " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $dir/pq_codes " +
        f"(stamped recall@${sc.recallK} ${sc.refineRecall}%.4f at refine ${sc.refine})")

    } else if (opts.contains("pq-measure")) {
      // (re-)measure an EXISTING sidecar's refine-capped recall and stamp
      // pq_meta.json — for sidecars attached before the stamp existed, or
      // to re-stamp at a different refine/k operating point
      val dir = opts("pq-measure")
      val index = Hnsw.load(spark, dir)
      require(index.pq.isDefined, s"no PQ sidecar under $dir — run --attach-pq first")
      val k = opts.getOrElse("k", "10").toInt
      val t0 = System.nanoTime()
      val st = Hnsw.measurePqRecall(index, k,
        refine = opts.getOrElse("refine", "-1").toInt,
        sampleQueries = opts.getOrElse("calibrate-sample", "100").toInt,
        probeCells = opts.getOrElse("probe-cells", "-1").toInt)
      // the persisted stamp is the MARGINED value (measured − 1 clustered
      // sd) — what the adaptive kernel gate compares against its target
      Hnsw.writePqMeta(dir, index.meta.num_nodes, st.stamp, st.refine, k, st.probeCells)
      println(f"[pq-measure] recall@$k measured ${st.measured}%.4f over ${st.queries} queries " +
        f"-> stamp ${st.stamp}%.4f at refine ${st.refine}, probe ${st.probeCells} " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $dir/pq_meta.json")

    } else if (opts.contains("calibrate")) {
      // run the recall calibration once and persist the curve next to the
      // index (calibration.json + num_nodes coverage marker). Every later
      // recall-target pick on this index — --recall-target on --load,
      // annQueryAdaptive(recallTarget=), SET spark.graft.ann.recallTarget
      // in SQL — is then driver-side from the saved curve, no sample scan
      // or exact-oracle batch per query session.
      val dir = opts("calibrate")
      val index = Hnsw.load(spark, dir)
      // --k takes a comma list; default = the save-time family, so a CLI
      // re-calibration covers the same k range the out-of-box contract
      // does ([[Hnsw.DefaultCalibrationKs]], one exact-oracle pass total)
      val ks = opts.get("k").map(_.split(",").map(_.trim.toInt).toSeq)
        .getOrElse(Hnsw.DefaultCalibrationKs)
      val t0 = System.nanoTime()
      val calibrated = Hnsw.withCalibration(index, ks,
        sampleQueries = opts.getOrElse("calibrate-sample", "100").toInt)
      require(calibrated.calibration.nonEmpty, s"no live vectors under $dir to calibrate on")
      Hnsw.writeCalibration(dir, calibrated.calibration, index.meta.num_nodes)
      // persist the (possibly load-backfilled) node_rows geometry too, so
      // later loads of a pre-r14 index skip the footer-count backfill and
      // the ghost-aware break-even reads it straight from meta.json
      Hnsw.saveMeta(index.meta, dir)
      val sizes = calibrated.calibration
        .map(cv => s"k=${cv.k}:${cv.points.size}pts").mkString(", ")
      println(f"[calibrate] $sizes " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $dir/calibration.json")

    } else if (opts.contains("dedup-spans")) {
      // span-level exact substring dedup report (Dedup.dupSpans): maximal
      // runs of >= --min-run consecutive duplicated --shingle-k-token
      // shingles, as 1-based inclusive token ranges
      val in = opts("dedup-spans")
      val out = opts.getOrElse("out", sys.error("--dedup-spans requires --out DIR"))
      val idCol = opts.getOrElse("id-col", "doc_id")
      val textCol = opts.getOrElse("text-col", "text")
      val t0 = System.nanoTime()
      val spans = graft.operators.Dedup.dupSpans(spark.read.parquet(in), idCol, textCol,
        k = opts.getOrElse("shingle-k", "8").toInt,
        minRun = opts.getOrElse("min-run", "2").toInt)
      spans.write.mode("overwrite").parquet(out)
      val n = spark.read.parquet(out).count()
      println(f"[dedup-spans] $n duplicated spans in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("scrub")) {
      // ingest-time span scrub (Dedup.scrubSpans): rewrite each NEW doc
      // with every token covered by a corpus-known shingle removed
      // (keep-first — the corpus copy is the one retained)
      val in = opts("scrub")
      val corpus = opts.getOrElse("corpus", sys.error("--scrub requires --corpus PARQUET"))
      val out = opts.getOrElse("out", sys.error("--scrub requires --out DIR"))
      val idCol = opts.getOrElse("id-col", "doc_id")
      val textCol = opts.getOrElse("text-col", "text")
      val t0 = System.nanoTime()
      graft.operators.Dedup.scrubSpans(
          spark.read.parquet(in), spark.read.parquet(corpus), idCol, textCol,
          k = opts.getOrElse("shingle-k", "8").toInt)
        .write.mode("overwrite").parquet(out)
      val stats = spark.read.parquet(out)
        .agg(count(lit(1)), sum("n_tokens"), sum("kept_tokens")).head()
      println(f"[scrub] ${stats.getLong(0)} docs, ${stats.getLong(2)}/${stats.getLong(1)} tokens kept " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("semdedup")) {
      // SemDeDup-style semantic dedup (Dedup.semanticDedup): per-row
      // keep/drop verdicts from embedding proximity; --bits defaults to
      // auto (derived from the corpus count, Dedup.autoBits)
      val in = opts("semdedup")
      val out = opts.getOrElse("out", sys.error("--semdedup requires --out DIR"))
      val idCol = opts.getOrElse("id-col", "id")
      val vecCol = opts.getOrElse("vec-col", "vector")
      val df = spark.read.parquet(in).select(col(idCol), col(vecCol))
      val dim = opts.get("dim").map(_.toInt)
        .getOrElse(df.select(size(col(vecCol))).head().getInt(0))
      val t0 = System.nanoTime()
      graft.operators.Dedup.semanticDedup(df, idCol, vecCol, dim,
          bits = opts.getOrElse("bits", "-1").toInt,
          maxDist = opts.getOrElse("max-dist", "0.2").toDouble,
          maxBlock = opts.getOrElse("max-block", Int.MaxValue.toString).toInt)
        .write.mode("overwrite").parquet(out)
      val verdicts = spark.read.parquet(out)
      val dropped = verdicts.filter(col("is_dup")).count()
      println(f"[semdedup] ${verdicts.count()} rows, $dropped dropped as semantic dups " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("phash")) {
      // perceptual-hash pipeline (MediaOps.imagePhash): hash a binary
      // image table; with --pairs-out also emit banded Hamming near-dup
      // pairs over --hash (dhash default — brightness-shift invariant)
      val in = opts("phash")
      val out = opts.getOrElse("out", sys.error("--phash requires --out DIR"))
      val idCol = opts.getOrElse("id-col", "id")
      val contentCol = opts.getOrElse("content-col", "content")
      val t0 = System.nanoTime()
      val hashes = graft.multimodal.MediaOps.imagePhash(
        spark.read.parquet(in).select(col(idCol).as("id"), col(contentCol).as("content")))
      hashes.write.mode("overwrite").parquet(out)
      val n = spark.read.parquet(out).count()
      println(f"[phash] $n images hashed in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")
      opts.get("pairs-out").foreach { pairsOut =>
        val prefix = if (opts.getOrElse("hash", "dhash") == "ahash") "ahash" else "dhash"
        val t1 = System.nanoTime()
        graft.operators.Dedup.hammingNearDupPairs(
            spark.read.parquet(out), "id", s"${prefix}_hi", s"${prefix}_lo",
            maxHamming = opts.getOrElse("max-hamming", "8").toInt,
            maxBand = opts.getOrElse("max-band", Int.MaxValue.toString).toInt)
          .write.mode("overwrite").parquet(pairsOut)
        val np = spark.read.parquet(pairsOut).count()
        println(f"[phash] $np near-dup pairs ($prefix) in ${(System.nanoTime() - t1) / 1e9}%.1f s -> $pairsOut")
      }

    } else if (opts.contains("shards")) {
      // deterministic training-shard export (Packing.shardAssign)
      val in = opts("shards")
      val out = opts.getOrElse("out", sys.error("--shards requires --out DIR"))
      val t0 = System.nanoTime()
      graft.operators.Packing.shardAssign(spark.read.parquet(in),
          opts.getOrElse("id-col", "doc_id"),
          numShards = opts.getOrElse("num-shards", "8").toInt,
          epochs = opts.getOrElse("epochs", "1").toInt)
        .write.mode("overwrite").parquet(out)
      val n = spark.read.parquet(out).count()
      println(f"[shards] $n (doc, epoch) assignments in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("datacard")) {
      // corpus datacard (TextStats.datacard)
      val in = opts("datacard")
      val out = opts.getOrElse("out", sys.error("--datacard requires --out DIR"))
      val t0 = System.nanoTime()
      graft.operators.TextStats.datacard(spark.read.parquet(in),
          opts.getOrElse("source-col", "source"), opts.getOrElse("lang-col", "lang"),
          opts.getOrElse("text-col", "text"))
        .write.mode("overwrite").parquet(out)
      val n = spark.read.parquet(out).count()
      println(f"[datacard] $n (source, lang) groups in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("kmeans")) {
      // exact fixed-point k-means (Ivf.kmeansExact): cluster an embedding
      // table; writes the (id, cid, dist) assignment
      val in = opts("kmeans")
      val out = opts.getOrElse("out", sys.error("--kmeans requires --out DIR"))
      val idCol = opts.getOrElse("id-col", "id")
      val vecCol = opts.getOrElse("vec-col", "vector")
      val t0 = System.nanoTime()
      graft.operators.Ivf.kmeansExact(
          spark.read.parquet(in).select(col(idCol).as("id"), col(vecCol).as("vector")),
          k = opts.getOrElse("k", "8").toInt,
          iters = opts.getOrElse("iters", "2").toInt)
        .write.mode("overwrite").parquet(out)
      val card = spark.read.parquet(out).groupBy("cid").count().orderBy("cid").collect()
      println(f"[kmeans] ${card.map(_.getLong(1)).sum} points -> ${card.length} clusters " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("bpe-train")) {
      // BPE trainer (TextStats.bpeTrainMerges): learn the first --merges
      // byte-pair merges from the corpus; optionally apply them back and
      // write per-doc symbol counts (--segment-out)
      val in = opts("bpe-train")
      val out = opts.getOrElse("out", sys.error("--bpe-train requires --out DIR"))
      val idCol = opts.getOrElse("id-col", "doc_id")
      val textCol = opts.getOrElse("text-col", "text")
      val docs = spark.read.parquet(in)
      val t0 = System.nanoTime()
      val merges = graft.operators.TextStats.bpeTrainMerges(docs, textCol,
        opts.getOrElse("merges", "50").toInt)
      merges.write.mode("overwrite").parquet(out)
      val learned = spark.read.parquet(out).collect().sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[String]("pair"), r.getAs[String]("merged"))).toSeq
      opts.get("segment-out").foreach { segOut =>
        graft.operators.TextStats.bpeSegmentCounts(docs, idCol, textCol, learned)
          .write.mode("overwrite").parquet(segOut)
      }
      println(f"[bpe-train] ${learned.size} merges in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out" +
        opts.get("segment-out").map(s => s" (segment counts -> $s)").getOrElse(""))

    } else if (opts.contains("bm25")) {
      // BM25 lexical search (Retrieval.bm25TopK) with optional hybrid
      // fusion against an embedding table (--fuse-vectors): the RRF
      // combiner over the lexical and exact-cosine rankings
      val in = opts("bm25")
      val out = opts.getOrElse("out", sys.error("--bm25 requires --out DIR"))
      val terms = opts.getOrElse("terms", sys.error("--bm25 requires --terms t1,t2,..."))
        .split(",").toSeq.filter(_.nonEmpty)
      val idCol = opts.getOrElse("id-col", "doc_id")
      val textCol = opts.getOrElse("text-col", "text")
      val k = opts.getOrElse("k", "10").toInt
      val docs = spark.read.parquet(in)
      val t0 = System.nanoTime()
      val result = opts.get("fuse-vectors") match {
        case None if opts.contains("phrase-n") =>
          graft.operators.Retrieval.bm25PhraseTopK(docs, idCol, textCol, terms,
            n = opts("phrase-n").toInt, k = k)
        case None =>
          graft.operators.Retrieval.bm25TopK(docs, idCol, textCol, terms, k)
        case Some(vecPath) =>
          val qid = opts.getOrElse("query-id", sys.error("--fuse-vectors requires --query-id ID")).toLong
          val vecCol = opts.getOrElse("vec-col", "vector")
          val e = spark.read.parquet(vecPath)
            .select(col(opts.getOrElse("vec-id-col", "id")).as("id"), col(vecCol).as("vector"))
          val q = e.filter(col("id") === qid).select(col("id").as("qid"), col("vector"))
          val lex = graft.operators.Retrieval.bm25RankedTopK(docs, idCol, textCol, terms, 2 * k)
          val vec = graft.operators.Knn.exactTopK(e, q, 2 * k, graft.functions.Distances.cosine)
            .select(col("id").as(idCol), col("rank"))
          graft.operators.Retrieval.rrfFuse(lex, vec, idCol, k = k)
      }
      result.write.mode("overwrite").parquet(out)
      val rows = spark.read.parquet(out).count()
      println(f"[bm25] $rows results for ${terms.size} terms " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("ppl-buckets")) {
      // CCNet-style perplexity buckets (Retrieval.perplexityBuckets):
      // head/middle/tail thirds by bigram-LM fluency, histogram thresholds
      val in = opts("ppl-buckets")
      val out = opts.getOrElse("out", sys.error("--ppl-buckets requires --out DIR"))
      val t0 = System.nanoTime()
      graft.operators.Retrieval.perplexityBuckets(spark.read.parquet(in),
          opts.getOrElse("id-col", "doc_id"), opts.getOrElse("text-col", "text"),
          binsPerNat = opts.getOrElse("bins-per-nat", "100").toInt)
        .write.mode("overwrite").parquet(out)
      val card = spark.read.parquet(out).groupBy("bucket").count().collect()
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
      println(f"[ppl-buckets] $card in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("lm-train")) {
      // frozen bigram LM (Retrieval.lmTable): train once, write the
      // (bigram, lp_fp) artifact; --score applies it to a second table
      val in = opts("lm-train")
      val out = opts.getOrElse("out", sys.error("--lm-train requires --out DIR"))
      val textCol = opts.getOrElse("text-col", "text")
      val t0 = System.nanoTime()
      graft.operators.Retrieval.lmTable(spark.read.parquet(in), textCol)
        .write.mode("overwrite").parquet(out)
      val n = spark.read.parquet(out).count()
      opts.get("score").foreach { scoreIn =>
        val scoreOut = opts.getOrElse("score-out", sys.error("--score requires --score-out DIR"))
        graft.operators.Retrieval.lmScoreAgainst(
            spark.read.parquet(scoreIn), spark.read.parquet(out),
            opts.getOrElse("id-col", "doc_id"), textCol,
            unkLpFp = opts.getOrElse("unk-lp-fp", "-20000000").toLong)
          .write.mode("overwrite").parquet(scoreOut)
      }
      println(f"[lm-train] $n bigrams in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out" +
        opts.get("score-out").map(s => s" (held-out scores -> $s)").getOrElse(""))

    } else if (opts.contains("domain-cap")) {
      // per-domain top-N quality cap (Sampling.perDomainCap): bounded-heap
      // anti-domination over the quality score
      val in = opts("domain-cap")
      val out = opts.getOrElse("out", sys.error("--domain-cap requires --out DIR"))
      val idCol = opts.getOrElse("id-col", "doc_id")
      val domainCol = opts.getOrElse("domain-col", "source")
      val textCol = opts.getOrElse("text-col", "text")
      val t0 = System.nanoTime()
      val docs = spark.read.parquet(in)
      graft.operators.Sampling.perDomainCap(
          docs.select(col(domainCol), col(idCol),
            graft.functions.TextFunctions.qualityScore(col(textCol)).as("quality")),
          idCol, domainCol, "quality", n = opts.getOrElse("n", "25").toInt)
        .write.mode("overwrite").parquet(out)
      val kept = spark.read.parquet(out).count()
      println(f"[domain-cap] kept $kept of ${docs.count()} docs " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("decontam")) {
      // semantic decontamination (Dedup.semanticDecontaminate): training
      // embeddings vs a benchmark table, contaminated rows attributed
      val in = opts("decontam")
      val bench = opts.getOrElse("bench", sys.error("--decontam requires --bench PARQUET"))
      val out = opts.getOrElse("out", sys.error("--decontam requires --out DIR"))
      val idCol = opts.getOrElse("id-col", "id")
      val vecCol = opts.getOrElse("vec-col", "vector")
      val train = spark.read.parquet(in).select(col(idCol), col(vecCol))
      val dim = opts.get("dim").map(_.toInt)
        .getOrElse(train.select(size(col(vecCol))).head().getInt(0))
      val t0 = System.nanoTime()
      graft.operators.Dedup.semanticDecontaminate(train,
          spark.read.parquet(bench).select(col(idCol), col(vecCol)),
          idCol, vecCol, dim,
          bits = opts.getOrElse("bits", "-1").toInt,
          maxDist = opts.getOrElse("max-dist", "0.2").toDouble,
          maxBlock = opts.getOrElse("max-block", Int.MaxValue.toString).toInt)
        .write.mode("overwrite").parquet(out)
      val verdicts = spark.read.parquet(out)
      val bad = verdicts.filter(col("status") === "contaminated").count()
      println(f"[decontam] ${verdicts.count()} rows, $bad contaminated " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("nb-train")) {
      // Naive-Bayes quality filter (Classify): train the token model +
      // priors on a labeled parquet; --score applies the frozen model
      val in = opts("nb-train")
      val out = opts.getOrElse("out", sys.error("--nb-train requires --out DIR"))
      val clsCol = opts.getOrElse("cls-col", "cls")
      val textCol = opts.getOrElse("text-col", "text")
      val t0 = System.nanoTime()
      val train = spark.read.parquet(in)
      graft.operators.Classify.nbModel(train, clsCol, textCol)
        .write.mode("overwrite").parquet(s"$out/model")
      graft.operators.Classify.nbPriors(train, clsCol)
        .write.mode("overwrite").parquet(s"$out/priors")
      val n = spark.read.parquet(s"$out/model").count()
      opts.get("score").foreach { scoreIn =>
        val scoreOut = opts.getOrElse("score-out", sys.error("--score requires --score-out DIR"))
        graft.operators.Classify.nbScore(
            spark.read.parquet(scoreIn),
            spark.read.parquet(s"$out/model"), spark.read.parquet(s"$out/priors"),
            opts.getOrElse("id-col", "doc_id"), textCol)
          .write.mode("overwrite").parquet(scoreOut)
      }
      println(f"[nb-train] $n model rows in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out" +
        opts.get("score-out").map(s => s" (held-out verdicts -> $s)").getOrElse(""))

    } else if (opts.contains("prepare")) {
      // end-to-end corpus prep (operators.Pipeline): quality gate -> exact
      // dedup -> optional decontam -> token budget -> curriculum shards.
      // Two front doors: a parquet documents table (`--prepare PARQUET`),
      // or the crawl-native path (`--prepare --input-warc GLOB`) — raw
      // .warc/.warc.gz files through record parse -> HTML strip -> URL
      // first-wins dedup, then the same stage chain
      val out = opts.getOrElse("out", sys.error("--prepare requires --out DIR"))
      val minQuality = opts.getOrElse("min-quality", "0.3").toDouble
      val bench = opts.get("bench").map(p => spark.read.parquet(p))
      val quota = opts.getOrElse("quota", Long.MaxValue.toString).toLong
      val bins = opts.getOrElse("bins", "1000").toInt
      val numShards = opts.getOrElse("num-shards", "64").toInt
      val bestLast = opts.getOrElse("best-last", "true").toBoolean
      val nearDedup = opts.get("near-dedup").map(_.toDouble)
      val nearMaxBand = opts.getOrElse("near-max-band", "1000").toInt
      val decontamN = opts.getOrElse("decontam-n", "3").toInt
      val decontamMinOverlap = opts.getOrElse("decontam-min-overlap", "5").toInt
      val t0 = System.nanoTime()
      val (prepared, idCol, nIn) = opts.get("input-warc") match {
        case Some(glob) =>
          // persist the parsed records BEFORE anything consumes them: the
          // record count for the summary line and prepareFromWarc's doc
          // derivation share one gunzip+parse pass instead of decoding
          // every WARC byte twice (lineage kept — a lost executor
          // recomputes, it doesn't fail the crawl-scale run)
          val recs = graft.sources.Warc.recordsFromFiles(
            graft.sources.Warc.readFiles(spark, glob))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val p = graft.operators.Pipeline.prepareFromWarc(recs,
            minQuality = minQuality, bench = bench, quota = quota, bins = bins,
            numShards = numShards, bestLast = bestLast, nearDedup = nearDedup,
            nearMaxBand = nearMaxBand, decontamN = decontamN,
            decontamMinOverlap = decontamMinOverlap,
            canonicalizeUrls = opts.get("canonical-urls").contains("true"))
          (p, "doc_id", recs.count())
        case None =>
          val in = opts("prepare")
          require(in != "true",
            "--prepare requires a PARQUET input (or --input-warc GLOB)")
          val idCol = opts.getOrElse("id-col", "doc_id")
          val docs = spark.read.parquet(in)
          val p = graft.operators.Pipeline.prepare(docs,
            idCol, opts.getOrElse("source-col", "source"),
            opts.getOrElse("text-col", "text"),
            minQuality = minQuality, bench = bench, quota = quota, bins = bins,
            numShards = numShards, bestLast = bestLast, nearDedup = nearDedup,
            nearMaxBand = nearMaxBand, decontamN = decontamN,
            decontamMinOverlap = decontamMinOverlap)
          (p, idCol, docs.count())
      }
      val nFiles = graft.operators.Pipeline.writeCurriculum(prepared, out, idCol,
        recordsPerFile = opts.getOrElse("records-per-file", "1000000").toInt)
      val sel = spark.read.parquet(out)
      val stats = sel.agg(count(lit(1)), coalesce(sum("n_tok"), lit(0L))).head()
      val inLabel = if (opts.contains("input-warc")) "WARC records" else "docs"
      println(f"[prepare] $nIn $inLabel in -> ${stats.getLong(0)} kept " +
        f"(${stats.getLong(1)} tokens) across $nFiles curriculum files " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("gen-warc")) {
      // synthetic crawl fixture: real .warc/.warc.gz files with planted
      // junk / URL re-fetch / exact-dup outcomes (Warc.writeSyntheticCrawl)
      val out = opts("gen-warc")
      val n = opts.getOrElse("n", "10000").toLong
      val files = opts.getOrElse("files", "8").toInt
      val links = opts.contains("links")
      graft.sources.Warc.writeSyntheticCrawl(spark, out, n, files, links)
      println(s"[gen-warc] wrote $n records across $files WARC files" +
        (if (links) " with outbound anchors" else "") + s" -> $out")

    } else if (opts.contains("link-graph")) {
      // crawl-native link analysis: host degree views + fixed-point
      // PageRank-lite centrality straight off raw WARC payloads
      val glob = opts.getOrElse("input-warc",
        sys.error("--link-graph requires --input-warc GLOB"))
      val out = opts.getOrElse("out", sys.error("--link-graph requires --out DIR"))
      val t0 = System.nanoTime()
      val docs = graft.sources.Warc
        .recordsFromFiles(graft.sources.Warc.readFiles(spark, glob))
        .filter(col("warc_type") === "response")
        .select(col("host"), col("payload"))
        .localCheckpoint() // both views read it; decode gzip+parse once
      graft.operators.Pipeline.hostLinkGraph(docs, "host", "payload")
        .write.mode("overwrite").parquet(s"$out/degrees")
      graft.operators.Pipeline.hostRank(docs, "host", "payload",
          iterations = opts.getOrElse("iters", "2").toInt)
        .write.mode("overwrite").parquet(s"$out/rank")
      val deg = spark.read.parquet(s"$out/degrees")
      val top = spark.read.parquet(s"$out/rank").orderBy(col("rank_fp").desc)
        .limit(3).collect().map(r => s"${r.getString(0)}(${r.getLong(1)})").mkString(", ")
      println(f"[link-graph] ${deg.count()} hosts, " +
        f"${deg.agg(coalesce(sum("out_links"), lit(0L))).head().getLong(0)} links, " +
        f"top rank: $top in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("token-budget")) {
      // token-budget quota fill (Sampling.tokenBudgetSelect): best-quality
      // docs per source until the token quota, histogram-sized decision
      val in = opts("token-budget")
      val out = opts.getOrElse("out", sys.error("--token-budget requires --out DIR"))
      val t0 = System.nanoTime()
      graft.operators.Sampling.tokenBudgetSelect(spark.read.parquet(in),
          opts.getOrElse("id-col", "doc_id"), opts.getOrElse("source-col", "source"),
          opts.getOrElse("text-col", "text"),
          quota = opts.getOrElse("quota", "1000000").toLong,
          bins = opts.getOrElse("bins", "1000").toInt)
        .write.mode("overwrite").parquet(out)
      val sel = spark.read.parquet(out)
      val kept = sel.filter(col("keep") === 1)
        .agg(coalesce(sum("n_tok"), lit(0L))).head().getLong(0)
      println(f"[token-budget] kept $kept tokens across " +
        f"${sel.select("source").distinct().count()} sources " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("epoch-upsample")) {
      // mixture execution (Sampling.epochUpsample): capped whole epochs
      // + one hash-bin fractional epoch per source
      val in = opts("epoch-upsample")
      val out = opts.getOrElse("out", sys.error("--epoch-upsample requires --out DIR"))
      val t0 = System.nanoTime()
      graft.operators.Sampling.epochUpsample(spark.read.parquet(in),
          opts.getOrElse("id-col", "doc_id"), opts.getOrElse("source-col", "source"),
          opts.getOrElse("text-col", "text"),
          targetTokens = opts.getOrElse("target-tokens", "1000000").toLong,
          maxEpochs = opts.getOrElse("max-epochs", "4").toInt,
          bins = opts.getOrElse("bins", "1000").toInt)
        .write.mode("overwrite").parquet(out)
      val sel = spark.read.parquet(out)
      println(f"[epoch-upsample] ${sel.count()} doc-epoch rows " +
        f"(${sel.agg(coalesce(sum("n_tok"), lit(0L))).head().getLong(0)} tokens) across " +
        f"${sel.select("source").distinct().count()} sources " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("embedding-outliers")) {
      // embedding-space outlier scrub (Features.embeddingOutliers):
      // exact fixed-point distance to the integer corpus centroid
      val in = opts("embedding-outliers")
      val out = opts.getOrElse("out", sys.error("--embedding-outliers requires --out DIR"))
      val t0 = System.nanoTime()
      graft.operators.Features.embeddingOutliers(spark.read.parquet(in),
          opts.getOrElse("id-col", "vec_id"), opts.getOrElse("vec-col", "embedding"),
          threshold = opts.getOrElse("threshold", "1000000000000").toLong,
          offset = opts.getOrElse("offset", "1.0").toDouble)
        .write.mode("overwrite").parquet(out)
      val sel = spark.read.parquet(out)
      println(f"[embedding-outliers] flagged " +
        f"${sel.filter(col("is_outlier") === 1).count()} of ${sel.count()} vectors " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("scrub-boilerplate")) {
      // host-template line removal (Dedup.scrubBoilerplate): the
      // CCNet/RefinedWeb cleaning step between extraction and gating
      val in = opts("scrub-boilerplate")
      val out = opts.getOrElse("out", sys.error("--scrub-boilerplate requires --out DIR"))
      val t0 = System.nanoTime()
      graft.operators.Dedup.scrubBoilerplate(spark.read.parquet(in),
          opts.getOrElse("id-col", "doc_id"), opts.getOrElse("host-col", "source"),
          opts.getOrElse("text-col", "text"),
          minDocs = opts.getOrElse("min-docs", "2").toInt,
          minFrac = opts.getOrElse("min-frac", "0.5").toDouble)
        .write.mode("overwrite").parquet(out)
      val sel = spark.read.parquet(out)
      println(f"[scrub-boilerplate] removed " +
        f"${sel.agg(coalesce(sum("n_removed"), lit(0L))).head().getLong(0)} of " +
        f"${sel.agg(coalesce(sum("n_lines"), lit(0L))).head().getLong(0)} lines " +
        f"across ${sel.count()} docs " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("vocab-drift")) {
      // corpus drift monitor (TextStats.vocabDrift): top TV contributors
      // between a snapshot and a reference, exact cross-multiplied ints
      val in = opts("vocab-drift")
      val ref = opts.getOrElse("ref", sys.error("--vocab-drift requires --ref PARQUET"))
      val out = opts.getOrElse("out", sys.error("--vocab-drift requires --out DIR"))
      val t0 = System.nanoTime()
      graft.operators.TextStats.vocabDrift(
          spark.read.parquet(ref), spark.read.parquet(in),
          opts.getOrElse("text-col", "text"),
          topN = opts.getOrElse("top", "20").toInt)
        .write.mode("overwrite").parquet(out)
      val top = spark.read.parquet(out).orderBy(col("rank")).limit(3).collect()
        .map(r => s"${r.getString(1)}(${r.getLong(4)})").mkString(", ")
      println(f"[vocab-drift] top contributors: $top " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("diversity-sample")) {
      // diversity-capped sampling (Sampling.diversitySample): <= cap
      // vectors per sign-LSH cell in id-hash order
      val in = opts("diversity-sample")
      val out = opts.getOrElse("out", sys.error("--diversity-sample requires --out DIR"))
      val t0 = System.nanoTime()
      val emb = spark.read.parquet(in)
      val vecCol = opts.getOrElse("vec-col", "embedding")
      val dim = opts.get("dim").map(_.toInt).getOrElse(
        emb.select(size(col(vecCol))).head().getInt(0))
      graft.operators.Sampling.diversitySample(emb,
          opts.getOrElse("id-col", "vec_id"), vecCol, dim = dim,
          capPerBucket = opts.getOrElse("cap", "100").toInt,
          bits = opts.getOrElse("bits", "8").toInt)
        .write.mode("overwrite").parquet(out)
      val sel = spark.read.parquet(out)
      println(f"[diversity-sample] kept ${sel.count()} vectors across " +
        f"${sel.select("bucket").distinct().count()} cells " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("dsir-select")) {
      // DSIR data selection (Sampling.dsirWeights + quotaSelectByScore):
      // importance-weight the raw corpus against a target distribution,
      // then keep the highest-importance quota without a global sort
      val in = opts("dsir-select")
      val target = opts.getOrElse("target", sys.error("--dsir-select requires --target PARQUET"))
      val out = opts.getOrElse("out", sys.error("--dsir-select requires --out DIR"))
      val t0 = System.nanoTime()
      val weights = graft.operators.Sampling.dsirWeights(
        spark.read.parquet(in), spark.read.parquet(target),
        opts.getOrElse("id-col", "doc_id"), opts.getOrElse("text-col", "text"),
        n = opts.getOrElse("ngram", "2").toInt,
        buckets = opts.getOrElse("buckets", "65536").toInt)
      graft.operators.Sampling.quotaSelectByScore(weights,
          opts.getOrElse("id-col", "doc_id"), "dsir_fp",
          quota = opts.getOrElse("quota", "1000000").toLong,
          bins = opts.getOrElse("bins", "1000").toInt)
        .write.mode("overwrite").parquet(out)
      val sel = spark.read.parquet(out)
      println(f"[dsir-select] kept ${sel.filter(col("keep") === 1).count()} of " +
        f"${sel.count()} docs " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("posting-lists")) {
      // inverted-index layout sink (Retrieval.postingLists):
      // delta-encoded postings with a df band
      val in = opts("posting-lists")
      val out = opts.getOrElse("out", sys.error("--posting-lists requires --out DIR"))
      val t0 = System.nanoTime()
      graft.operators.Retrieval.postingLists(spark.read.parquet(in),
          opts.getOrElse("id-col", "doc_id"), opts.getOrElse("text-col", "text"),
          minDf = opts.getOrElse("min-df", "1").toLong,
          maxDf = opts.getOrElse("max-df", "1000").toLong)
        .write.mode("overwrite").parquet(out)
      val sel = spark.read.parquet(out)
      println(f"[posting-lists] ${sel.count()} postings over " +
        f"${sel.select("tok").distinct().count()} terms " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("length-quantiles")) {
      // per-source length quantiles (TextStats.lengthQuantiles): exact
      // order statistics by histogram inversion, no doc-stream sort
      val in = opts("length-quantiles")
      val out = opts.getOrElse("out", sys.error("--length-quantiles requires --out DIR"))
      val t0 = System.nanoTime()
      graft.operators.TextStats.lengthQuantiles(spark.read.parquet(in),
          opts.getOrElse("source-col", "source"), opts.getOrElse("text-col", "text"),
          maxLen = opts.getOrElse("max-len", "4096").toInt)
        .write.mode("overwrite").parquet(out)
      val sel = spark.read.parquet(out)
      println(f"[length-quantiles] ${sel.count()} sources " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("cms-audit")) {
      // Count-Min sketch audit (TextStats.cmsEstimates): bounded-memory
      // token frequencies next to exact counts
      val in = opts("cms-audit")
      val out = opts.getOrElse("out", sys.error("--cms-audit requires --out DIR"))
      val t0 = System.nanoTime()
      graft.operators.TextStats.cmsEstimates(spark.read.parquet(in),
          opts.getOrElse("text-col", "text"),
          depth = opts.getOrElse("depth", "4").toInt,
          width = opts.getOrElse("width", "65536").toInt)
        .write.mode("overwrite").parquet(out)
      val sel = spark.read.parquet(out)
      val over = sel.filter(col("n_est") > col("n_true")).count()
      println(f"[cms-audit] ${sel.count()} terms, $over overestimated " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("signature")) {
      // per-source TF-IDF signature terms (TextStats.sourceSignature):
      // the datacard's distinctive-vocabulary table
      val in = opts("signature")
      val out = opts.getOrElse("out", sys.error("--signature requires --out DIR"))
      val t0 = System.nanoTime()
      graft.operators.TextStats.sourceSignature(spark.read.parquet(in),
          opts.getOrElse("group-col", "source"), opts.getOrElse("text-col", "text"),
          topN = opts.getOrElse("n", "5").toInt)
        .write.mode("overwrite").parquet(out)
      val n = spark.read.parquet(out).count()
      println(f"[signature] $n signature rows in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("kmv")) {
      // KMV distinct sketch (TextStats.kmvVocabulary): per-group
      // vocabulary cardinality estimates, no distinct shuffle
      val in = opts("kmv")
      val out = opts.getOrElse("out", sys.error("--kmv requires --out DIR"))
      val t0 = System.nanoTime()
      graft.operators.TextStats.kmvVocabulary(spark.read.parquet(in),
          opts.getOrElse("group-col", "source"), opts.getOrElse("text-col", "text"),
          k = opts.getOrElse("k", "128").toInt)
        .write.mode("overwrite").parquet(out)
      val n = spark.read.parquet(out).count()
      println(f"[kmv] $n groups sketched in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")

    } else if (opts.contains("gen-queries")) {
      // synthetic (qid, vector) query file for --load --query-file runs
      val n = opts.getOrElse("n", "1000").toLong
      val dim = opts.getOrElse("dim", "64").toInt
      val out = opts("gen-queries")
      Datagen.gaussianVectors(spark, n, dim, opts.getOrElse("seed", "7").toLong)
        .select(col("id").as("qid"), col("vector"))
        .write.mode("overwrite").parquet(out)
      println(s"[gen-queries] wrote $n queries dim=$dim -> $out")

    } else if (opts.contains("serve")) {
      sys.error("--serve is out of scope (batch engine; use --load --query-file for batch queries)")
    } else {
      println(
        """usage:
          |  --build [--input PARQUET | --input-idx IDX3-UBYTE(.gz) | --input-cifar CIFAR10-BIN(.gz) [--labels-out DIR] | --n N --dim D]
          |          --out DIR [--M 16 --efc 200 --efs 50 --mL x --metric l2|cosine --seed 42 --partitions 16]
          |          [--routed [--cells-per-shard 4 --spill 0.15]] [--no-calibrate]
          |  --load DIR [--query-file PARQUET --max-queries N] [--k 10 --ef EF] [--large | --routed [--probe-cells PC] | --refine R [--hops H] | --exact-probe [--probe-cells PC] | --pq-refine R [--pq-kernel] | --adaptive] [--out DIR]
          |            [--recall-target T [--calibrate-sample 100]]   (calibrates probe-cells for the target; job-free when --calibrate saved a curve)
          |            (no path flag: routed indexes use the regime-aware chooser automatically;
          |             an index carrying calibration.json serves no-flag queries at the 0.95
          |             recall-target probe — otherwise the C/4 cost heuristic; pass --large
          |             to keep the old all-shard recall exactly)
          |  --attach-pq DIR [--pq-m M --pq-cells 256 --pq-sample N --pq-iters 3 --refine R --k 10]   (byte-code ADC sidecar; measures + stamps refine-capped recall)
          |  --pq-measure DIR [--refine R --k 10 --probe-cells PC --calibrate-sample 100]   (re-stamp an existing sidecar's measured recall + the probe it was measured at)
          |  --calibrate DIR [--k 5,10,50,100 --calibrate-sample 100]   (persist the recall curve FAMILY in one pass: later --recall-target picks are job-free, and no-flag --load queries at any covered k consume it at target 0.95)
          |  --eval-recall DIR [--k 10 --ef EF --sample-mod 1000]
          |  --compact DIR --out DIR [--target-shards N]   (routed: keeps geometry + routed path)
          |  --gen-queries OUT --n N --dim D [--seed 7]
          |  --dedup-spans PARQUET --out DIR [--id-col doc_id --text-col text --shingle-k 8 --min-run 2]
          |  --scrub PARQUET --corpus PARQUET --out DIR [--id-col doc_id --text-col text --shingle-k 8]
          |  --semdedup PARQUET --out DIR [--id-col id --vec-col vector --dim D --bits N(auto) --max-dist 0.2 --max-block N]
          |  --bpe-train PARQUET --out DIR [--merges 50 --segment-out DIR --id-col doc_id --text-col text]
          |  --bm25 PARQUET --terms t1,t2 --out DIR [--k 10 --id-col doc_id --text-col text]
          |         [--phrase-n N   (terms are N-word phrases, exact contiguous match)]
          |         [--fuse-vectors PARQUET --query-id ID --vec-id-col id --vec-col vector]
          |  --phash PARQUET --out DIR [--id-col id --content-col content]
          |          [--pairs-out DIR --hash dhash|ahash --max-hamming 8 --max-band N]
          |  --shards PARQUET --out DIR [--id-col doc_id --num-shards 8 --epochs 1]
          |  --datacard PARQUET --out DIR [--source-col source --lang-col lang --text-col text]
          |  --kmeans PARQUET --out DIR [--id-col id --vec-col vector --k 8 --iters 2]
          |  --ppl-buckets PARQUET --out DIR [--id-col doc_id --text-col text --bins-per-nat 100]
          |  --lm-train PARQUET --out DIR [--text-col text] [--score PARQUET --score-out DIR --unk-lp-fp -20000000]
          |  --domain-cap PARQUET --out DIR [--domain-col source --id-col doc_id --text-col text --n 25]
          |  --decontam PARQUET --bench PARQUET --out DIR [--id-col id --vec-col vector --dim D --bits N(auto) --max-dist 0.2 --max-block N]
          |  --kmv PARQUET --out DIR [--group-col source --text-col text --k 128]
          |  --nb-train PARQUET --out DIR [--cls-col cls --text-col text] [--score PARQUET --score-out DIR --id-col doc_id]
          |  --signature PARQUET --out DIR [--group-col source --text-col text --n 5]
          |  --token-budget PARQUET --out DIR [--id-col doc_id --source-col source --text-col text --quota 1000000 --bins 1000]
          |  --epoch-upsample PARQUET --out DIR [--id-col doc_id --source-col source --text-col text --target-tokens 1000000 --max-epochs 4 --bins 1000]
          |  --embedding-outliers PARQUET --out DIR [--id-col vec_id --vec-col embedding --threshold 1000000000000 --offset 1.0]
          |  --diversity-sample PARQUET --out DIR [--id-col vec_id --vec-col embedding --dim auto --cap 100 --bits 8]
          |  --vocab-drift PARQUET --ref PARQUET --out DIR [--text-col text --top 20]
          |  --prepare PARQUET --out DIR [--bench PARQUET --min-quality 0.3 --quota N --num-shards 64 --records-per-file 1000000 --best-last true --near-dedup 0.8 --near-max-band 1000 --decontam-n 3 --decontam-min-overlap 5]
          |  --prepare --input-warc GLOB --out DIR [same knobs]   (crawl-native: .warc/.warc.gz -> parse -> HTML strip -> URL dedup -> prepare)
          |  --gen-warc OUT [--n 10000 --files 8]   (synthetic crawl fixture, half gzipped)""".stripMargin)
    }
  }
}
