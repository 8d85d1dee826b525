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
      case "lmq96" =>
        val docs = tbl("documents")
        time("lm.perplexityBuckets only")(
          graft.operators.Retrieval.perplexityBuckets(docs, "doc_id", "text"))
      case "lmabc" =>
        // interleaved same-JVM comparison (the r14 ScanTier lesson: gate on
        // paired reps, never all-A-then-all-B): A = r16 shape (partial agg
        // by (id,bigram) + ckpt), B = repartition(bigram) + ckpt,
        // C = repartition(bigram) fully lazy.
        val docs = tbl("documents")
        import graft.functions.TextFunctions
        def bg = docs
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("w"))
          .select(col("doc_id"),
            explode(TextFunctions.wordShinglesFromTokens(col("w"), 2)).as("bigram"))
        def tail(docBg: DataFrame) = {
          val pairCounts = docBg.groupBy("bigram").agg(sum(col("n")).as("n_pair"))
            .withColumn("w1", split(col("bigram"), " ").getItem(0))
          val firstCounts = pairCounts.groupBy("w1").agg(sum(col("n_pair")).as("n_first"))
          val lp = pairCounts.join(firstCounts, "w1")
            .select(col("bigram"),
              floor(log(col("n_pair").cast("double") / col("n_first").cast("double")) *
                lit(1e6) + lit(0.5)).cast("long").as("lp_fp"))
          docBg.join(lp, "bigram")
            .groupBy(col("doc_id"))
            .agg(sum(col("n")).as("n_bigrams"), sum(col("n") * col("lp_fp")).as("lp_total_fp"))
        }
        def mkA = tail(graft.operators.Checkpoints.tracked(
          bg.groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("n"))))
        def mkB = tail(graft.operators.Checkpoints.tracked(
          bg.repartition(col("bigram"))
            .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("n"))))
        def mkC = tail(bg.repartition(col("bigram"))
          .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("n")))
        val variants = Seq("A.partial+ckpt" -> (() => mkA), "B.repart+ckpt" -> (() => mkB),
          "C.repart lazy" -> (() => mkC))
        // one untimed warmup each, then `reps` interleaved rounds
        variants.foreach { case (_, mk) =>
          mk().write.format("noop").mode("overwrite").save()
          graft.operators.Checkpoints.releaseTracked(spark)
        }
        val acc = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
        (1 to reps).foreach { _ =>
          variants.foreach { case (name, mk) =>
            val t0 = System.nanoTime()
            mk().write.format("noop").mode("overwrite").save()
            acc(name) = ((System.nanoTime() - t0) / 1e9) :: acc(name)
            graft.operators.Checkpoints.releaseTracked(spark)
          }
        }
        variants.foreach { case (name, _) =>
          val ts = acc(name).reverse
          println(f"[probe] lmabc $name%-16s min=${ts.min}%8.2f reps=${ts.map(t => f"$t%.1f").mkString(" ")}")
        }
      case "spans" =>
        // q71/q72's dupPositions evaluates the corpus positioned-shingle
        // explode twice (count agg + semi-join side). Interleaved A/B/C:
        // A = current, B = ps checkpointed, C = ps repartition(shingle)+ckpt
        val docs = tbl("documents")
        import graft.functions.TextFunctions
        val k = 8
        def ps = docs
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("w"))
          .select(col("doc_id"), posexplode(TextFunctions.wordShinglesFromTokens(col("w"), k)))
          .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("shingle"))
        def spans(psIn: DataFrame) = {
          val dup = psIn.groupBy("shingle").agg(count(lit(1)).as("n_occ"))
            .filter(col("n_occ") >= 2).select("shingle")
          val marked = psIn.join(dup, Seq("shingle"), "left_semi").select(col("doc_id"), col("pos"))
          marked
            .withColumn("island",
              col("pos") - row_number().over(org.apache.spark.sql.expressions.Window
                .partitionBy("doc_id").orderBy("pos")))
            .groupBy(col("doc_id"), col("island"))
            .agg(min("pos").as("span_start"),
              (max("pos") + lit(k - 1).cast("long")).as("span_end"),
              count(lit(1)).as("n_shingles"))
            .filter(col("n_shingles") >= 2)
            .select(col("doc_id"), col("span_start"), col("span_end"), col("n_shingles"))
        }
        val variants = Seq(
          "A.current" -> (() => spans(ps)),
          "B.ps ckpt" -> (() => spans(graft.operators.Checkpoints.tracked(ps))),
          "C.repart+ckpt" -> (() => spans(graft.operators.Checkpoints.tracked(
            ps.repartition(col("shingle"))))))
        variants.foreach { case (_, mk) =>
          mk().write.format("noop").mode("overwrite").save()
          graft.operators.Checkpoints.releaseTracked(spark)
        }
        val acc = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
        (1 to reps).foreach { _ =>
          variants.foreach { case (name, mk) =>
            val t0 = System.nanoTime()
            mk().write.format("noop").mode("overwrite").save()
            acc(name) = ((System.nanoTime() - t0) / 1e9) :: acc(name)
            graft.operators.Checkpoints.releaseTracked(spark)
          }
        }
        variants.foreach { case (name, _) =>
          val ts = acc(name).reverse
          println(f"[probe] spans $name%-14s min=${ts.min}%8.2f reps=${ts.map(t => f"$t%.1f").mkString(" ")}")
        }
      case "lmlazy" =>
        // fully-lazy docBg: the repartition(bigram) exchange is the SAME
        // subtree for all three consumers -- does ReuseExchange/stage reuse
        // cover it without the checkpoint?
        val docs = tbl("documents")
        def docScoresLazy = {
          val docBg = docs
            .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("w"))
            .select(col("doc_id"),
              explode(graft.functions.TextFunctions.wordShinglesFromTokens(col("w"), 2)).as("bigram"))
            .repartition(col("bigram"))
            .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("n"))
          val pairCounts = docBg.groupBy("bigram").agg(sum(col("n")).as("n_pair"))
            .withColumn("w1", split(col("bigram"), " ").getItem(0))
          val firstCounts = pairCounts.groupBy("w1").agg(sum(col("n_pair")).as("n_first"))
          val lp = pairCounts.join(firstCounts, "w1")
            .select(col("bigram"),
              floor(log(col("n_pair").cast("double") / col("n_first").cast("double")) *
                lit(1e6) + lit(0.5)).cast("long").as("lp_fp"))
          docBg.join(lp, "bigram")
            .groupBy(col("doc_id"))
            .agg(sum(col("n")).as("n_bigrams"),
              sum(col("n") * col("lp_fp")).as("lp_total_fp"))
            .select(col("doc_id"), col("n_bigrams"), col("lp_total_fp"),
              ((col("lp_total_fp").cast("double") / lit(1e6)) /
                col("n_bigrams").cast("double")).as("avg_nats"))
        }
        time("lm.docScores LAZY reuse-exchange")(docScoresLazy)
        val plan = docScoresLazy.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        println(s"[probe] lmlazy exchanges=${plan.split("\n").count(_.contains("Exchange"))} " +
          s"reused=${plan.split("\n").count(_.contains("ReusedExchange"))}")
      case "lm" =>
        val docs = tbl("documents")
        time("lm.docScores")(
          graft.operators.Retrieval.lmDocScores(docs, "doc_id", "text"))
        time("lm.perplexityBuckets (q96)")(
          graft.operators.Retrieval.perplexityBuckets(docs, "doc_id", "text"))
      case "spacing" =>
        val docs = tbl("documents")
        val viaRegex = concat(lit(" "),
          regexp_replace(col("text"), "(?s)(.)(?=.)", "$1  "), lit(" "))
        val viaSplitJoin = concat(lit(" "),
          array_join(split(col("text"), ""), "  "), lit(" "))
        time("spacing.regexp_replace lookahead")(
          docs.select(col("doc_id"), viaRegex.as("s")))
        time("spacing.split+array_join")(
          docs.select(col("doc_id"), viaSplitJoin.as("s")))
        val diff = docs.select(col("doc_id"), viaRegex.as("a"), viaSplitJoin.as("b"))
          .filter(!(col("a") <=> col("b"))).count()
        println(s"[probe] spacing diff rows = $diff")
      case "skew" =>
        // zipfian-host slice (VERDICT r16 item 5): the sf0.1 fixture's host
        // key is perfectly uniform (20 hosts x 250 docs), so plant a head
        // host owning 80% of rows and measure what actually crosses each
        // exchange in the host-keyed tier.
        val docs = tbl("documents").withColumn("host",
          when(col("doc_id") % 5 =!= 0, lit("hot.example"))
            .otherwise(concat(lit("cold"), (col("doc_id") % 17).cast("string"))))
        def nodeRows(name: String, df: DataFrame): Unit = {
          // collect() executes THIS df.queryExecution, so its node metrics
          // populate (a noop write spawns a separate QueryExecution);
          // outputs here are host-aggregated — tiny
          df.collect()
          def finalPlan(p: org.apache.spark.sql.execution.SparkPlan): org.apache.spark.sql.execution.SparkPlan = p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
            case other => other
          }
          println(s"[skew] $name")
          def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
            val rows = p.metrics.get("numOutputRows").map(_.value)
            val recs = p.metrics.get("shuffleRecordsWritten").map(_.value)
            val label = p.getClass.getSimpleName
            if (rows.nonEmpty || recs.nonEmpty)
              println(f"[skew]   ${"  " * depth}$label rows=${rows.getOrElse(-1L)} shuffleRecs=${recs.getOrElse(-1L)}")
            p.children.foreach(walk(_, depth + 1))
            p match {
              case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan, depth + 1)
              case _ => ()
            }
          }
          walk(finalPlan(df.queryExecution.executedPlan), 0)
          graft.operators.Checkpoints.releaseTracked(spark)
        }
        // q115 shape: pure partial-agg groupBy(host)
        nodeRows("hostStats agg (80% hot key)",
          docs.groupBy("host").agg(count(lit(1)).as("n_pages"),
            sum(length(col("text")).cast("long")).as("bytes")))
        // q137/q138 shape: linkEdges groupBy(src,dst) + degree views + rank join
        val crawl = docs.select(col("doc_id"), col("host"),
          concat(lit("<html><body><a href=\"http://h"), (col("doc_id") % 7).cast("string"),
            lit(".example/p"), col("doc_id").cast("string"), lit("\">x</a>"),
            col("text"), lit("</body></html>")).as("html"))
        nodeRows("hostLinkGraph (80% hot src)",
          graft.operators.Pipeline.hostLinkGraph(crawl, "host", "html"))
        nodeRows("hostRank 2 iters (80% hot src)",
          graft.operators.Pipeline.hostRank(crawl, "host", "html", iterations = 2))
      case other => System.err.println(s"unknown probe $other")
    }
    spark.stop()
  }

  private val textColName = "text"
}
