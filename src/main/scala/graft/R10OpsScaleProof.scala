package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the round-10 pipeline additions at 1M documents:
  * DSIR importance weighting + quota resampling, delta-encoded posting
  * lists, the Count-Min sketch audit, exact length quantiles, mojibake
  * repair, and the crawl link graph with fixed-point centrality. Every
  * gate is DETERMINISTIC (planted counts recovered exactly, separation
  * directions guaranteed by construction) — wall-clock numbers are the
  * evidence that the shapes hold at corpus scale, the gates are the
  * evidence they stay CORRECT there. Prints one JSON line, committed as
  * `BENCH_SCALE_R10OPS.json`. Run:
  *
  *   SPARK_DRIVER_MEM=64g scripts/run_main.sh graft.R10OpsScaleProof [n]
  */
object R10OpsScaleProof {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-r10-ops-proof")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val s = System.nanoTime(); val r = f; (r, (System.nanoTime() - s) / 1e9)
    }

    // deterministic corpus: 25 tokens from a 50k-term vocabulary (bigrams
    // near-unique — the postings/CMS regime) plus 5 tokens from a
    // parity-split 100-term vocabulary (bigrams heavily repeated — the
    // DSIR signal: even ids write zone A, odd ids zone B); 1% carry
    // planted mojibake; each page links to 1-2 other hosts out of 1,000
    val moji = lit(" donâ€™t cafÃ©")
    val docs = spark.range(0, n, 1, 32).select(
      col("id").as("doc_id"),
      concat(lit("h"), pmod(col("id") * 131, lit(1000L))).as("host"),
      concat(
        concat_ws(" ", transform(sequence(lit(0), lit(24)),
          j => concat(lit("w"),
            pmod(xxhash64(col("id") * 31L + j), lit(50000L)).cast("string")))),
        lit(" "),
        concat_ws(" ", transform(sequence(lit(0), lit(4)),
          j => concat(lit("s"),
            ((col("id") % 2) * 100L +
              pmod(xxhash64(col("id") * 17L + j * 7L), lit(100L))).cast("string")))),
        // hash-spread plant: id % 100 would land every mojibake doc on 10
        // of the 1,000 hosts (gcd(131·100, 1000) structure) and flip
        // whole-host length quantiles
        when(pmod(xxhash64(col("id")), lit(100L)) === 0, moji)
          .otherwise(lit(""))).as("text"))
      .withColumn("html", concat(
        lit("<html><body><p>"), col("text"), lit("</p><a href=\"http://h"),
        pmod(col("doc_id") * 7 + 1, lit(1000L)).cast("string"),
        lit(".example/p"), col("doc_id").cast("string"), lit("\">x</a>"),
        when(col("doc_id") % 3 === 0,
          concat(lit("<a href=\"http://h"), pmod(col("doc_id") * 13 + 5, lit(1000L)).cast("string"),
            lit(".example/q\">y</a>"))).otherwise(lit("")),
        lit("</body></html>")))
      .localCheckpoint()
    val nDocs = docs.count()
    System.err.println(s"[r10ops] corpus $nDocs docs materialized")

    // ---- DSIR: even-vocab target must pull even docs above odd docs ----
    val target = docs.filter(col("doc_id") % 20 === 0).select("doc_id", "text")
    val (dsir, dsirSec) = timed {
      val w = graft.operators.Sampling.dsirWeights(docs, target, "doc_id", "text")
        .localCheckpoint()
      val m = w.groupBy((col("doc_id") % 2).as("par"))
        .agg(avg(col("dsir_fp")).as("m")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      require(m(0L) > m(1L),
        s"DSIR must rank target-vocabulary docs above off-vocabulary: $m")
      val sel = graft.operators.Sampling.quotaSelectByScore(
        w, "doc_id", "dsir_fp", quota = n / 10)
      val kept = sel.filter(col("keep") === 1)
      val k = kept.count()
      require(k >= n / 10, s"quota underfilled: $k < ${n / 10}")
      val evenShare = kept.filter(col("doc_id") % 2 === 0).count().toDouble / k
      // dominance needs the repeated-bigram statistics of the full corpus;
      // small smoke runs only assert the mean ordering above
      if (n >= 500000) require(evenShare > 0.9,
        s"selection must be target-dominated, got $evenShare")
      (k, evenShare)
    }
    System.err.println(f"[r10ops] dsir: kept ${dsir._1} (even share ${dsir._2}%.3f) in $dsirSec%.1f s")

    // ---- posting lists: df band bounds every partition ----
    val (postings, postSec) = timed {
      val p = graft.operators.Retrieval.postingLists(docs, "doc_id", "text",
        minDf = 50L, maxDf = 2000L).localCheckpoint()
      val cnt = p.count()
      val maxDf = p.agg(max("df")).head().getLong(0)
      require(maxDf <= 2000L, s"df band violated: $maxDf")
      (cnt, maxDf)
    }
    System.err.println(s"[r10ops] postings: ${postings._1} rows (max df ${postings._2}) in $postSec s")

    // ---- CMS: overestimate-only at 100k-term vocabulary ----
    val (cms, cmsSec) = timed {
      val est = graft.operators.TextStats.cmsEstimates(docs, "text",
        depth = 4, width = 1 << 16).localCheckpoint()
      val bad = est.filter(col("n_est") < col("n_true")).count()
      require(bad == 0, s"CMS undercounted $bad tokens")
      val over = est.filter(col("n_est") > col("n_true")).count()
      (est.count(), over)
    }
    System.err.println(s"[r10ops] cms: ${cms._1} probed terms, ${cms._2} overestimates in $cmsSec s")

    // ---- length quantiles: constant-length corpus pins all three ----
    val (lq, lqSec) = timed {
      val q = graft.operators.TextStats.lengthQuantiles(docs, "host", "text")
        .localCheckpoint()
      val rows = q.count()
      require(rows == 1000L, s"expected 1000 host rows, got $rows")
      // every doc has 30 tokens (+3 on the 1% mojibake rows): p50 = 30
      val p50s = q.select("p50").distinct().collect().map(_.getLong(0)).toSet
      require(p50s == Set(30L), s"constant-length corpus must pin p50=30, got $p50s")
      rows
    }
    System.err.println(s"[r10ops] quantiles: $lq hosts in $lqSec s")

    // ---- mojibake: planted rows recovered EXACTLY, clean rows untouched ----
    val planted = docs.filter(pmod(xxhash64(col("doc_id")), lit(100L)) === 0).count()
    val (fixed, mojiSec) = timed {
      val f = docs.select(col("doc_id"), col("text"),
        graft.functions.TextFunctions.fixMojibake(col("text")).as("fx"))
      val changed = f.filter(col("fx") =!= col("text")).count()
      require(changed == planted,
        s"mojibake repair must touch exactly the $planted planted docs: $changed")
      changed
    }
    System.err.println(s"[r10ops] mojibake: $fixed repaired in $mojiSec s")

    // ---- link graph + centrality over 1M pages / 1,000 hosts ----
    val (graph, graphSec) = timed {
      val g = graft.operators.Pipeline.hostLinkGraph(docs, "host", "html")
        .localCheckpoint()
      val hosts = g.count()
      val links = g.agg(sum("out_links")).head().getLong(0)
      require(links == n + (n + 2) / 3,
        s"every page links once, every third twice: $links")
      (hosts, links)
    }
    val (rank, rankSec) = timed {
      val r = graft.operators.Pipeline.hostRank(docs, "host", "html", iterations = 2)
      val rows = r.count()
      val spread = r.agg(max("rank_fp").as("mx"), min("rank_fp").as("mn")).head()
      require(spread.getLong(0) > spread.getLong(1), "centrality must spread")
      (rows, spread.getLong(0))
    }
    System.err.println(s"[r10ops] graph: ${graph._1} hosts / ${graph._2} links in $graphSec s; " +
      s"rank 2 iters in $rankSec s")

    println(s"""{"n":$nDocs,"dsir_sec":$dsirSec,"dsir_kept":${dsir._1},""" +
      s""""dsir_even_share":${dsir._2},"postings_sec":$postSec,""" +
      s""""postings_rows":${postings._1},"cms_sec":$cmsSec,""" +
      s""""cms_probed_terms":${cms._1},"cms_overestimates":${cms._2},""" +
      s""""quantiles_sec":$lqSec,"quantile_hosts":$lq,""" +
      s""""mojibake_sec":$mojiSec,"mojibake_repaired":$fixed,""" +
      s""""linkgraph_sec":$graphSec,"linkgraph_hosts":${graph._1},""" +
      s""""linkgraph_links":${graph._2},"hostrank_sec":$rankSec,""" +
      s""""hostrank_rows":${rank._1}}""")
    spark.stop()
  }
}
