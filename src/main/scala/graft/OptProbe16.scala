package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16 optimization scratch probe: times named sub-plans of the expensive
  * bench queries with the noop sink (guide §1.4) so the computation is
  * measured, not the sink or count()'s column pruning. Local iteration
  * aid only — not part of the bench/verify surface.
  *
  * Usage: scripts/run_main.sh graft.OptProbe16 <probe> [reps]
  */
object OptProbe16 {
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
    val probe = args.headOption.getOrElse("q141")
    val reps = if (args.length > 1) args(1).toInt else 3

    def tbl(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")
    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-40s min=${ts.min}%7.3f  reps=${ts.map(t => f"$t%.2f").mkString(" ")}")
    }

    probe match {
      case "q141" =>
        val docs = tbl("documents")
        // stage 1: the KMV sketch alone (heap agg over all shingles)
        val h = conv(substring(md5(col("sh")), 1, 8), 16, 10).cast("long")
        def sketch = docs
          .select(col("source").as("g"),
            explode(graft.functions.TextFunctions.wordShingles(col("text"), 3)).as("sh"))
          .select(col("g"), h.as("h"))
          .groupBy(col("g"))
          .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDistDedup(
            col("h").cast("double"), col("h"), 64).as("top"))
          .select(col("g"), explode(col("top")).as("e"))
          .select(col("g"), col("e.id").as("h"))
        time("q141.sketch (no ckpt)")(sketch)
        def shRows = docs
          .select(col("source").as("g"),
            explode(graft.functions.TextFunctions.wordShingles(col("text"), 3)).as("sh"))
        def shRows2 = docs
          .select(col("source").as("g"), graft.functions.TextFunctions.tokens(col("text")).as("w"))
          .select(col("g"),
            explode(graft.functions.TextFunctions.wordShinglesFromTokens(col("w"), 3)).as("sh"))
        time("q141.explode only (inline split)")(shRows)
        time("q141.explode only (two-step)")(shRows2)
        time("q141.explode+md5h")(shRows.select(col("g"), h.as("h")))
        time("q141.minagg lower bound")(
          shRows.select(col("g"), h.as("h")).groupBy("g").agg(min(col("h"))))
        time("q141.heap no dedup")(
          shRows.select(col("g"), h.as("h")).groupBy("g")
            .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDist(
              col("h").cast("double"), col("h"), 64).as("top")))
        time("q141.distinct then heap")(
          shRows.select(col("g"), h.as("h")).groupBy("g", "h").agg(count(lit(1)))
            .groupBy(col("g"))
            .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDist(
              col("h").cast("double"), col("h"), 64).as("top")))
        time("q141.full")(graft.operators.TextStats.kmvContainmentPairs(docs, "source", "text", n = 3, k = 64))
      case "q119" =>
        val docs = tbl("documents")
        val corpus = docs.filter(col("doc_id") % 10 >= 2).select("doc_id", "text")
        val recrawled = docs.filter(col("doc_id") % 10 >= 2 && col("doc_id") % 50 === 7)
          .select((col("doc_id") + lit(10000L)).as("doc_id"), col("source"), col("text"))
        val newBatch = docs.filter(col("doc_id") % 10 < 2)
          .select("doc_id", "source", "text").unionAll(recrawled)
        time("q119.full (ckpt inside)")(
          graft.operators.Pipeline.prepareVerdicts(newBatch, corpus, "doc_id", "source", "text",
            minQuality = 0.3, n = 3, minJaccard = 0.2, maxDf = 5))
        time("q119.incdedup ckpt=true")(
          graft.operators.Dedup.incrementalDedup(newBatch.select("doc_id", "text"), corpus,
            "doc_id", "text", n = 3, minJaccard = 0.2, maxDf = 5))
        time("q119.incdedup ckpt=false")(
          graft.operators.Dedup.incrementalDedup(newBatch.select("doc_id", "text"), corpus,
            "doc_id", "text", n = 3, minJaccard = 0.2, maxDf = 5, materialize = false))
        time("q119.gopherHof")(
          graft.operators.TextStats.gopherRulesHof(newBatch, "doc_id", "text").filter(col("keep")))
        time("q119.gopherRelational")(
          graft.operators.TextStats.gopherRules(newBatch, "doc_id", "text").filter(col("keep")))
        val q = graft.functions.TextFunctions.qualityScore(col("text"))
        time("q119.scored projection")(
          newBatch.select(col("doc_id"), col("source"), col("text"),
            graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"),
            floor(q * 1000).cast("long").as("bin")))
      case "merge" =>
        val e = tbl("embeddings").select(col("vec_id").as("id"), col("embedding").as("vector"))
        val idx0 = graft.hnsw.Hnsw.build(e,
          graft.hnsw.HnswParams(dim = 64, m = 8, efConstruction = 64, numPartitions = 8))
        val idx = idx0.copy(edges = idx0.edges.cache())
        idx.edges.count()
        time("merge.stats")(
          graft.hnsw.HnswMerge.merge(idx, level0SampleMod = 8)
            .edges.select("src", "layer", "dst").distinct().groupBy("layer").agg(
              count(lit(1)).as("n_edges")))
        // sub-DAG decomposition (mirrors HnswMerge.merge internals)
        locally {
          val m = idx.meta
          val dist = graft.functions.Distances.metric(m.metric)
          val nodes = idx.nodes
          val levels = nodes.select(col("id"), col("level"))
          val boundary = nodes.filter(col("level") >= 1 || pmod(col("id"), lit(8L)) === 0)
          val bQueries = boundary.select(col("id").as("qid"), col("vector"))
          val sampled = boundary.filter(pmod(col("id"), lit(64L)) === 0)
            .select(col("id").as("cid"), col("vector").as("cvector"))
          val t0 = System.nanoTime()
          val empty = sampled.isEmpty
          println(f"[probe] merge.isEmpty check                     one-shot=${(System.nanoTime()-t0)/1e9}%7.3f (empty=$empty)")
          val assigned = graft.operators.Ivf.assign(boundary.select(col("id"), col("vector")), sampled, dist)
            .join(boundary.select(col("id"), col("vector")), "id")
          time("merge.assign")(assigned)
          def probed = graft.operators.Ivf.searchLarge(assigned, bQueries, sampled, m.m + 1, 4, dist)
            .filter(col("id") =!= col("qid"))
            .select(col("qid").as("src"), col("id").as("dst"))
          time("merge.probed (ivf knn)")(probed)
          def lonely = bQueries.select(col("qid").as("src")).distinct()
            .except(probed.select(col("src")).distinct())
            .filter(col("src") =!= m.entry_point)
          time("merge.probed+lonely")(probed.union(lonely.select(col("src"), lit(m.entry_point).as("dst"))))
          def topm = probed.union(lonely.select(col("src"), lit(m.entry_point).as("dst")))
          def bidir = topm.union(topm.select(col("dst").as("src"), col("src").as("dst")))
          def crossEdges = bidir
            .join(levels.select(col("id").as("src"), col("level").as("l_src")), "src")
            .join(levels.select(col("id").as("dst"), col("level").as("l_dst")), "dst")
            .select(col("src"), explode(sequence(lit(0), least(col("l_src"), col("l_dst")))).as("layer"), col("dst"))
          def unioned = idx.edges.select("src", "layer", "dst")
            .union(crossEdges.select("src", "layer", "dst")).distinct()
          time("merge.unioned.distinct")(unioned)
          def scored = unioned
            .join(nodes.select(col("id").as("src"), col("vector").as("v_src")), "src")
            .join(nodes.select(col("id").as("dst"), col("vector").as("v_dst")), "dst")
            .select(col("src"), col("layer"), col("dst"), dist(col("v_src"), col("v_dst")).as("dist"))
          def pruned = scored
            .groupBy(col("src"), col("layer"))
            .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDist(col("dist"), col("dst"), m.max_m0).as("top"))
            .select(col("src"), col("layer"), posexplode(col("top")).as(Seq("pos", "entry")))
            .filter(col("layer") === 0 || col("pos") < m.m)
            .select(col("src"), col("layer"), col("entry.id").as("dst"))
          time("merge.pruned")(pruned)
        }
      case "q55" =>
        import graft.operators.Dedup
        val docs = tbl("documents")
        def sigs = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, h = 4)
        time("q55.sigs (no ckpt)")(sigs)
        def pairs(s0: DataFrame) = Dedup.lshCandidatePairs(s0, "doc_id", h = 4, rows = 2, maxBandSize = 1000)
          .select("id_a", "id_b").distinct()
        time("q55.pairs (no ckpt)")(pairs(sigs))
        val t0 = System.nanoTime()
        val cl = Dedup.dupClusters(docs, pairs(sigs.localCheckpoint()), "doc_id")
        println(f"[probe] q55.clusters construct (eager loop)     one-shot=${(System.nanoTime()-t0)/1e9}%7.3f")
        time("q55.clusters consume")(cl)
        def scores = graft.operators.TextStats.textStats(docs, "doc_id", "text")
          .filter(col("n_tokens") >= 1).select(col("doc_id"), col("quality"))
        time("q55.scores")(scores)
        time("q55.canonical tail (ckpt'd inputs)")(
          Dedup.canonicalDocs(cl.localCheckpoint(), scores.localCheckpoint(), "doc_id", "quality"))
      case "q89" =>
        val m = graft.multimodal.MediaOps
        val base = tbl("documents").filter(col("doc_id") % 5 === 0).select(col("doc_id").as("id"))
        val variants = tbl("documents").filter(col("doc_id") % 10 === 0).select(col("doc_id").as("id"))
        time("q89.pngs only")(m.syntheticPngs(base))
        time("q89.hashes base")(m.imagePhash(m.syntheticPngs(base)))
        def media = m.syntheticPngs(base).unionAll(m.syntheticPngVariants(variants, delta = 60, idOffset = 100000L))
        def hashes = m.imagePhash(media)
        time("q89.hashes all")(hashes)
        time("q89.full")(graft.operators.Dedup.hammingNearDupPairs(hashes, "id", "dhash_hi", "dhash_lo",
          maxHamming = 8, maxBand = 1000))
      case "q149" =>
        val docs = tbl("documents")
        val merges = graft.operators.TextStats.bpeTrainMerges(docs, "text", merges = 5)
          .collect().sortBy(_.getInt(0))
          .map(r => (r.getString(1), r.getString(2))).toSeq
        val t0 = System.nanoTime()
        val vocab = graft.operators.TextStats.bpeVocab(docs, "text", merges)
        println(f"[probe] q149.vocab construct (count job)       one-shot=${(System.nanoTime()-t0)/1e9}%7.3f")
        time("q149.vocab consume")(vocab)
        time("q149.encode ids")(graft.operators.TextStats.bpeEncodeIds(docs, "doc_id", "text", merges))
        time("q149.pack full")(graft.operators.Packing.packTokenIds(docs, "doc_id", "text", merges, targetTokens = 5000))
        val t1 = System.nanoTime()
        val m2 = graft.operators.TextStats.bpeTrainMerges(docs, "text", merges = 5).collect()
        println(f"[probe] q149.trainMerges collect               one-shot=${(System.nanoTime()-t1)/1e9}%7.3f (${m2.length} rows)")
        // doc-level chain variant: one padded string per DOC (boundaries >= 3
        // spaces, intra-token exactly 2 -> merges can never cross tokens)
        locally {
          val vocabMap = vocab.agg(
            map_from_entries(collect_list(struct(col("sym"), col("token_id")))).as("vmap"))
          val spaced = concat(lit(" "),
            regexp_replace(col("text"), "(?s)(.)(?=.)", "$1  "), lit(" "))
          val chained = merges.foldLeft(spaced) { case (acc, (pair, merged)) =>
            call_function("replace", acc,
              lit(" " + pair.replace(" ", "  ") + " "), lit(s" $merged "))
          }
          val out = docs
            .filter(trim(col("text")) =!= "")
            .crossJoin(broadcast(vocabMap))
            .select(col("doc_id"),
              transform(split(trim(chained), "  +"),
                s => coalesce(element_at(col("vmap"), s), lit(-1L))).as("token_ids"))
          time("q149.encode DOC-LEVEL variant")(out)
          time("q149.spaced only")(docs.filter(trim(col("text")) =!= "").select(col("doc_id"), spaced.as("s")))
          time("q149.chained only")(docs.filter(trim(col("text")) =!= "").select(col("doc_id"), chained.as("s")))
          time("q149.split only")(docs.filter(trim(col("text")) =!= "")
            .select(col("doc_id"), split(trim(chained), "  +").as("syms")))
          // compare results bit-for-bit vs the current implementation
          val cur = graft.operators.TextStats.bpeEncodeIds(docs, "doc_id", "text", merges)
            .select(col("doc_id"), col("token_ids").cast("string").as("t"))
          val nw = out.select(col("doc_id"), col("token_ids").cast("string").as("t"))
          val diff = cur.join(nw, Seq("doc_id"), "full_outer")
            .filter(!(cur("t") <=> nw("t"))).count()
          println(s"[probe] q149.doc-level vs current diff rows = $diff (cur=${cur.count()}, new=${nw.count()})")
        }
      case other => System.err.println(s"unknown probe $other")
    }
    spark.stop()
  }
}
