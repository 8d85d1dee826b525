package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** CLI round-trips for the dedup-pipeline surface (--dedup-spans, --scrub,
  * --semdedup) — the S2 analog for the corpus-prep half — plus the
  * autoBits sizing rule the --semdedup default rides on.
  */
class CliDedupSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private val boiler = (1 to 12).map(i => s"boiler$i").mkString(" ")

  test("--dedup-spans round-trip: duplicated boilerplate surfaces as spans") {
    import spark.implicits._
    val base = tmp("cli-spans")
    Seq(
      (1L, s"alpha beta gamma $boiler delta"),
      (2L, s"epsilon $boiler zeta eta theta"),
      (3L, "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"))
      .toDF("doc_id", "text").write.parquet(s"$base/docs")
    Main.run(spark, Map("dedup-spans" -> s"$base/docs", "out" -> s"$base/spans",
      "shingle-k" -> "4", "min-run" -> "2"))
    val spans = spark.read.parquet(s"$base/spans")
    assert(spans.columns.toSet === Set("doc_id", "span_start", "span_end", "n_shingles"))
    assert(spans.select("doc_id").distinct().collect().map(_.getLong(0)).toSet === Set(1L, 2L),
      "both boilerplate carriers flagged, the clean doc absent")
  }

  test("--scrub round-trip: corpus-known boilerplate removed, fresh text verbatim") {
    import spark.implicits._
    val base = tmp("cli-scrub")
    Seq((10L, s"corpus prefix $boiler corpus suffix words here"))
      .toDF("doc_id", "text").write.parquet(s"$base/corpus")
    Seq((20L, s"fresh opening $boiler fresh closing"),
        (21L, "entirely new text with no shared shingles at all"))
      .toDF("doc_id", "text").write.parquet(s"$base/new")
    Main.run(spark, Map("scrub" -> s"$base/new", "corpus" -> s"$base/corpus",
      "out" -> s"$base/scrubbed", "shingle-k" -> "4"))
    val out = spark.read.parquet(s"$base/scrubbed").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text_scrubbed")).toMap
    assert(!out(20L).contains("boiler5"), "corpus-known span must be scrubbed")
    assert(out(21L) === "entirely new text with no shared shingles at all")
  }

  test("--semdedup round-trip: near-identical embedding dropped, auto bits by default") {
    import spark.implicits._
    val base = tmp("cli-semdedup")
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(8)(r.nextGaussian().toFloat)
    }
    val vecs = (0 until 40).map(i => (i.toLong, vec(i))) :+ (100L, vec(0)) // dup of id 0
    vecs.toDF("id", "vector").write.parquet(s"$base/embs")
    Main.run(spark, Map("semdedup" -> s"$base/embs", "out" -> s"$base/verdicts",
      "max-dist" -> "0.01"))
    val v = spark.read.parquet(s"$base/verdicts")
    assert(v.count() === 41)
    val dup = v.filter(col("id") === 100L).head()
    assert(dup.getAs[Boolean]("is_dup") && dup.getAs[Long]("canonical_id") === 0L)
    assert(v.filter(col("is_dup")).count() === 1)
  }

  test("incrementalSemanticDedup: exact/near corpus hits flag, fresh vectors pass, hot blocks drop") {
    import spark.implicits._
    def vec(seed: Long): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(16)(r.nextGaussian().toFloat)
    }
    val corpus = (0L until 30L).map(i => (i, vec(i))).toDF("id", "vector")
    val batch = Seq(
      (100L, vec(7)),                          // exact re-encoding of corpus 7
      (101L, vec(3).map(x => x + 1e-4f)),      // near-dup of corpus 3
      (102L, vec(999))                         // fresh
    ).toDF("id", "vector")
    val out = Dedup.incrementalSemanticDedup(batch, corpus, "id", "vector", dim = 16,
      maxDist = 0.05).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("status"), r.getAs[Long]("n_near"), Option(r.get(2)))).toMap
    // identical vectors: 1 - dot/(||a||·||a||) rounds to ~2e-16, not 0.0
    assert(out(100L)._1 === "semantic_dup" &&
      out(100L)._3.exists(d => math.abs(d.asInstanceOf[Double]) < 1e-12))
    assert(out(101L)._1 === "semantic_dup" && out(101L)._2 >= 1L)
    assert(out(102L) === (("new", 0L, None)))
    // a degenerate corpus block (identical vectors) over the cap drops
    // from BOTH sides: the batch copy of it reports new, not cap×1 pairs
    val hotCorpus = corpus.unionAll(
      (1000L until 1020L).map(i => (i, vec(42))).toDF("id", "vector"))
    val hotOut = Dedup.incrementalSemanticDedup(
      Seq((200L, vec(42))).toDF("id", "vector"), hotCorpus, "id", "vector", dim = 16,
      maxDist = 0.05, maxBlock = 10).collect()
    assert(hotOut.length === 1 && hotOut.head.getAs[String]("status") === "new")
  }

  test("--bpe-train round-trip: merge table persists; --segment-out applies it") {
    import spark.implicits._
    val base = tmp("cli-bpe")
    Seq((1L, "abab abab abab ab ab"), (2L, "ab cd"))
      .toDF("doc_id", "text").write.parquet(s"$base/docs")
    Main.run(spark, Map("bpe-train" -> s"$base/docs", "out" -> s"$base/merges",
      "merges" -> "2", "segment-out" -> s"$base/seg"))
    val m = spark.read.parquet(s"$base/merges").orderBy("rank").collect()
    assert(m.map(_.getAs[String]("pair")).toSeq === Seq("a b", "ab ab"))
    val seg = spark.read.parquet(s"$base/seg").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_syms")).toMap
    assert(seg(1L) === 5L, "five fully-merged words")
    assert(seg(2L) === 3L, "ab merges to 1 symbol, cd stays 2 chars")
  }

  test("--bm25 round-trip: lexical ranks land; --fuse-vectors adds the RRF combiner") {
    import spark.implicits._
    val base = tmp("cli-bm25")
    Seq(
      (0L, "rare spark table row"),
      (1L, "spark spark table row value key"),
      (2L, "table row value key merge sort"))
      .toDF("doc_id", "text").write.parquet(s"$base/docs")
    Main.run(spark, Map("bm25" -> s"$base/docs", "terms" -> "rare,spark",
      "out" -> s"$base/hits", "k" -> "3"))
    val hits = spark.read.parquet(s"$base/hits").orderBy(col("bm25").desc).collect()
    assert(hits.map(_.getAs[Long]("doc_id")).toSeq === Seq(0L, 1L),
      "both-term doc first, no-term doc absent")

    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(8)(r.nextGaussian().toFloat)
    }
    Seq((0L, vec(7)), (1L, vec(8)), (2L, vec(8)))
      .toDF("id", "vector").write.parquet(s"$base/embs")
    Main.run(spark, Map("bm25" -> s"$base/docs", "terms" -> "rare,spark",
      "out" -> s"$base/fused", "k" -> "3",
      "fuse-vectors" -> s"$base/embs", "query-id" -> "2"))
    val fused = spark.read.parquet(s"$base/fused").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rrf")).toMap
    // vector ranks: id1 and id2 both at dist 0 (identical vectors) — tie
    // breaks by id, so id1 takes rank 1, id2 rank 2, id0 rank 3
    assert(fused.keySet === Set(0L, 1L, 2L))
    assert(fused(1L) === 1.0 / 62 + 1.0 / 61, "lex rank 2 + vec rank 1")
    assert(fused(2L) === 1.0 / 62, "vector-only, rank 2 after the id tiebreak")
    assert(fused(0L) === 1.0 / 61 + 1.0 / 63, "lex rank 1 + vec rank 3")
  }

  test("--bm25 --phrase-n: exact contiguous phrase search from the CLI") {
    import spark.implicits._
    val base = tmp("cli-phrase")
    Seq(
      (0L, "spark window join table"),
      (1L, "spark join window table"))   // words present, never adjacent
      .toDF("doc_id", "text").write.parquet(s"$base/docs")
    Main.run(spark, Map("bm25" -> s"$base/docs", "terms" -> "spark window",
      "phrase-n" -> "2", "out" -> s"$base/hits", "k" -> "2"))
    val hits = spark.read.parquet(s"$base/hits").collect().map(_.getAs[Long]("doc_id"))
    assert(hits.toSeq === Seq(0L), "only the contiguous occurrence matches")
  }

  test("--phash round-trip: hashes written; planted near-dup pair surfaces in --pairs-out") {
    import spark.implicits._
    val base = tmp("cli-phash")
    val m = graft.multimodal.MediaOps
    // two near-identical images (top row +50, wrap-free) and one unrelated
    def png(rowShift: Int, scramble: Int) = m.encodeGrayPng(16, 12,
      (x, y) => 50 + (x * 7 + y * 13 + scramble * (x * x + 3 * y)) % 100 +
        (if (y == 0) rowShift else 0))
    Seq((1L, png(0, 0)), (2L, png(50, 0)), (3L, png(0, 5)))
      .toDF("id", "content").write.parquet(s"$base/imgs")
    Main.run(spark, Map("phash" -> s"$base/imgs", "out" -> s"$base/hashes",
      "pairs-out" -> s"$base/pairs", "max-hamming" -> "8"))
    val hashes = spark.read.parquet(s"$base/hashes")
    assert(hashes.count() === 3)
    assert(hashes.columns.toSet ===
      Set("id", "ahash_hi", "ahash_lo", "dhash_hi", "dhash_lo"))
    val pairs = spark.read.parquet(s"$base/pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "brightness-shifted twin found")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "scrambled image stays unpaired")
  }

  test("--shards and --datacard and --kmeans round-trips") {
    import spark.implicits._
    val base = tmp("cli-tail")
    (0L until 100L).map(i => (i, if (i % 2 == 0) "web" else "books", "en", s"doc $i text"))
      .toDF("doc_id", "source", "lang", "text").write.parquet(s"$base/docs")
    Main.run(spark, Map("shards" -> s"$base/docs", "out" -> s"$base/shards",
      "num-shards" -> "4", "epochs" -> "2"))
    val sh = spark.read.parquet(s"$base/shards")
    assert(sh.count() === 200)
    assert(sh.select("shard").distinct().count() === 4)
    Main.run(spark, Map("datacard" -> s"$base/docs", "out" -> s"$base/card"))
    val card = spark.read.parquet(s"$base/card").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(card === Map("web" -> 50L, "books" -> 50L))
    val r = new scala.util.Random(3)
    (0 until 60).map(i => (i.toLong, Array.fill(8)(r.nextGaussian().toFloat)))
      .toDF("id", "vector").write.parquet(s"$base/embs")
    Main.run(spark, Map("kmeans" -> s"$base/embs", "out" -> s"$base/clusters",
      "k" -> "4", "iters" -> "1"))
    val cl = spark.read.parquet(s"$base/clusters")
    assert(cl.count() === 60)
    assert(cl.select("cid").distinct().count() <= 4)
  }

  test("--ppl-buckets, --lm-train --score, --domain-cap, --kmv round-trips") {
    import spark.implicits._
    val base = tmp("cli-quality")
    val docs = (0L until 30L).map { i =>
      val body = if (i % 3 == 0) "a b a b a b" else if (i % 3 == 1) "a b a c" else "a c a d"
      (i, if (i % 2 == 0) "web" else "books", body)
    }
    docs.toDF("doc_id", "source", "text").write.parquet(s"$base/docs")
    Main.run(spark, Map("ppl-buckets" -> s"$base/docs", "out" -> s"$base/ppl"))
    val ppl = spark.read.parquet(s"$base/ppl")
    assert(ppl.count() === 30)
    assert(ppl.select("bucket").distinct().collect().map(_.getString(0)).toSet
      === Set("head", "middle", "tail"))
    Main.run(spark, Map("lm-train" -> s"$base/docs", "out" -> s"$base/lm",
      "score" -> s"$base/docs", "score-out" -> s"$base/scores"))
    val lm = spark.read.parquet(s"$base/lm")
    assert(lm.columns.toSet === Set("bigram", "lp_fp"))
    assert(spark.read.parquet(s"$base/scores").count() === 30)
    Main.run(spark, Map("domain-cap" -> s"$base/docs", "out" -> s"$base/capped", "n" -> "5"))
    val capped = spark.read.parquet(s"$base/capped")
    assert(capped.count() === 10, "two domains x cap 5")
    assert(capped.groupBy("source").count().collect().forall(_.getLong(1) === 5L))
    Main.run(spark, Map("kmv" -> s"$base/docs", "out" -> s"$base/kmv", "k" -> "8"))
    val kmv = spark.read.parquet(s"$base/kmv").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    // 4 distinct tokens per source, under k: exact
    assert(kmv === Map("web" -> 4.0, "books" -> 4.0))
    // --decontam: the train row duplicating a bench vector is flagged
    Seq((1L, Array(1.0f, 0.5f, 0.25f, 0.125f)),
        (2L, Array(-1.0f, -0.5f, -0.25f, -0.125f)))
      .toDF("id", "vector").write.parquet(s"$base/train")
    Seq((100L, Array(1.0f, 0.5f, 0.25f, 0.125f)))
      .toDF("id", "vector").write.parquet(s"$base/bench")
    Main.run(spark, Map("decontam" -> s"$base/train", "bench" -> s"$base/bench",
      "out" -> s"$base/verdicts", "bits" -> "4", "max-dist" -> "0.1"))
    val verd = spark.read.parquet(s"$base/verdicts").collect()
      .map(r => r.getAs[Long]("id") -> ((r.getAs[String]("status"), r.getAs[Long]("bench_id")))).toMap
    assert(verd(1L) === (("contaminated", 100L)))
    assert(verd(2L) === (("clean", -1L)))
  }

  test("--nb-train --score and --signature round-trips") {
    import spark.implicits._
    val base = tmp("cli-nb")
    Seq((0L, 1, "good good the"), (1L, 1, "good the"),
        (2L, 0, "bad the"), (3L, 0, "bad bad bad the"))
      .toDF("doc_id", "cls", "text").write.parquet(s"$base/seed")
    Seq((10L, "good good"), (11L, "bad"))
      .toDF("doc_id", "text").write.parquet(s"$base/held")
    Main.run(spark, Map("nb-train" -> s"$base/seed", "out" -> s"$base/nb",
      "score" -> s"$base/held", "score-out" -> s"$base/verdicts"))
    assert(spark.read.parquet(s"$base/nb/model").columns.toSet
      === Set("tok", "cls", "n_wc", "lp_fp"))
    assert(spark.read.parquet(s"$base/nb/priors").count() === 2)
    val v = spark.read.parquet(s"$base/verdicts").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("pred_hq")).toMap
    assert(v === Map(10L -> 1, 11L -> 0))
    Seq((0L, "web", "alpha alpha the"), (1L, "books", "beta the"))
      .toDF("doc_id", "source", "text").write.parquet(s"$base/docs")
    Main.run(spark, Map("signature" -> s"$base/docs", "out" -> s"$base/sig", "n" -> "2"))
    val sig = spark.read.parquet(s"$base/sig").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("tok"))).toSet
    assert(sig === Set(("web", "alpha"), ("books", "beta")),
      "everywhere-token 'the' must not be a signature term")
    Main.run(spark, Map("token-budget" -> s"$base/docs", "out" -> s"$base/budget",
      "quota" -> "2"))
    val sel = spark.read.parquet(s"$base/budget")
    assert(sel.count() === 2, "every doc present with a verdict")
    assert(sel.columns.toSet === Set("source", "doc_id", "n_tok", "bin", "keep"))
    // quota 2 < either doc's tokens: the single best bin per source keeps
    // (one-bin overshoot), nothing else exists to drop in this corpus
    assert(sel.filter(col("keep") === 1).count() === 2)
  }

  test("--epoch-upsample / --embedding-outliers / --diversity-sample round trips") {
    import spark.implicits._
    val base = tmp("cli-mix")
    // small source (8 tok) upsamples; big source (40 tok) caps/fractions
    (Seq((0L, "a", Seq.fill(8)("w").mkString(" "))) ++
      Seq.tabulate(5)(i => (10L + i.toLong, "b", Seq.fill(8)("w").mkString(" "))))
      .toDF("doc_id", "source", "text").write.parquet(s"$base/docs")
    Main.run(spark, Map("epoch-upsample" -> s"$base/docs", "out" -> s"$base/mix",
      "target-tokens" -> "16", "max-epochs" -> "3"))
    val mix = spark.read.parquet(s"$base/mix")
    assert(mix.columns.toSet === Set("doc_id", "source", "n_tok", "epoch"))
    // source a: t=8, full=2, rem=0 -> exactly 2 epochs; source b: t=40,
    // full=0, rem=16 -> hash-bin prefix of ~2 docs in epoch 1
    assert(mix.filter(col("source") === "a").count() === 2)
    val bTok = mix.filter(col("source") === "b").agg(sum("n_tok")).head().getLong(0)
    assert(bTok >= 16L && bTok < 16L + 8L, "fractional fill with one-bin overshoot")

    val vecs = (0L until 30L).map(i => (i, Array.fill(8)(0.25f))) :+
      (99L, Array.fill(8)(5.0f))
    vecs.toDF("vec_id", "embedding").write.parquet(s"$base/embs")
    Main.run(spark, Map("embedding-outliers" -> s"$base/embs", "out" -> s"$base/outl",
      "threshold" -> "1000000000000"))
    val outl = spark.read.parquet(s"$base/outl")
    assert(outl.filter(col("is_outlier") === 1).select("vec_id").collect()
      .map(_.getLong(0)).toSeq === Seq(99L), "only the planted far vector flags")

    Main.run(spark, Map("diversity-sample" -> s"$base/embs", "out" -> s"$base/core",
      "cap" -> "5"))
    val core = spark.read.parquet(s"$base/core")
    assert(core.columns.toSet === Set("bucket", "rank", "vec_id"))
    core.groupBy("bucket").count().collect().foreach(r =>
      assert(r.getLong(1) <= 5L, "every cell capped"))
    assert(core.count() < 31, "the dense cell trimmed")

    Seq((50L, "spamword spamword spamword")).toDF("doc_id", "text")
      .write.parquet(s"$base/snap")
    Main.run(spark, Map("vocab-drift" -> s"$base/snap", "ref" -> s"$base/docs",
      "out" -> s"$base/drift", "top" -> "5"))
    val drift = spark.read.parquet(s"$base/drift").orderBy(col("rank")).collect()
    assert(drift.head.getString(1) === "spamword", "the burst token leads the drift table")
  }

  test("--dsir-select and --posting-lists round trips") {
    import spark.implicits._
    val base = tmp("cli-dsir")
    // raw: half target-vocabulary docs, half junk; target: the wanted style
    (Seq.tabulate(6)(i => (i.toLong, "spark scan join table spark scan")) ++
      Seq.tabulate(6)(i => (10L + i, "junk spam junk spam junk spam")))
      .toDF("doc_id", "text").write.parquet(s"$base/raw")
    Seq((100L, "spark scan join table spark scan join"))
      .toDF("doc_id", "text").write.parquet(s"$base/target")
    Main.run(spark, Map("dsir-select" -> s"$base/raw", "target" -> s"$base/target",
      "out" -> s"$base/sel", "quota" -> "6", "bins" -> "4", "buckets" -> "4096"))
    val sel = spark.read.parquet(s"$base/sel")
    assert(sel.columns.toSet === Set("doc_id", "dsir_fp", "bin", "keep"))
    val keptIds = sel.filter(col("keep") === 1).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(keptIds === (0L until 6L).toSet,
      s"quota must select exactly the target-style docs, got $keptIds")

    Main.run(spark, Map("posting-lists" -> s"$base/raw", "out" -> s"$base/post",
      "min-df" -> "2", "max-df" -> "12"))
    val post = spark.read.parquet(s"$base/post")
    assert(post.columns.toSet === Set("tok", "df", "doc_id", "gap"))
    // 'spark' posts in docs 0..5: first gap = 0 − (−1) = 1, then five 1s
    val sparkGaps = post.filter(col("tok") === "spark").orderBy("doc_id")
      .select("gap").collect().map(_.getLong(0)).toSeq
    assert(sparkGaps === Seq(1L, 1L, 1L, 1L, 1L, 1L))

    spark.read.parquet(s"$base/raw").withColumn("source", lit("s"))
      .write.parquet(s"$base/src")
    Main.run(spark, Map("length-quantiles" -> s"$base/src", "out" -> s"$base/lq"))
    val lq = spark.read.parquet(s"$base/lq").head()
    assert(lq.getLong(2) === 6L && lq.getLong(4) === 6L,
      "every doc is 6 tokens: p50 = p99 = 6")
    Main.run(spark, Map("cms-audit" -> s"$base/src", "out" -> s"$base/cms",
      "width" -> "4096"))
    val cms = spark.read.parquet(s"$base/cms")
    assert(cms.filter(col("n_est") < col("n_true")).count() === 0L)
  }

  test("--scrub-boilerplate round trip: host footer removed, content byte-stable") {
    import spark.implicits._
    val base = tmp("cli-bp")
    (0L until 6L).map(i => (i, "h", s"body $i\nfooter text"))
      .toDF("doc_id", "source", "text").write.parquet(s"$base/docs")
    Main.run(spark, Map("scrub-boilerplate" -> s"$base/docs", "out" -> s"$base/clean"))
    val clean = spark.read.parquet(s"$base/clean")
    assert(clean.columns.toSet ===
      Set("doc_id", "source", "n_lines", "n_removed", "text_clean"))
    assert(clean.count() === 6)
    assert(clean.filter(col("n_removed") === 1).count() === 6,
      "the shared footer leaves every doc")
    assert(clean.filter(col("doc_id") === 3L).head().getAs[String]("text_clean")
      === "body 3", "content survives byte-for-byte")
  }

  test("autoBits: corpus-size-derived, >=16 bits at 5M scale, capped, q74-compatible") {
    assert(Dedup.autoBits(5_000_000L) >= 16, "5M vectors must auto-pick fine blocking")
    assert(Dedup.autoBits(5_000_000L) === 17) // ceil(log2(5e6/64))
    assert(Dedup.autoBits(64L) === 1)
    assert(Dedup.autoBits(0L) === 1)
    assert(Dedup.autoBits(Long.MaxValue) === 24, "hard cap at 24 bits")
    // explicit override unchanged (q74 passes bits = 8)
    assert(Dedup.autoBits(500L, targetBlock = 64) === 3)
  }

  test("parseArgs: real argv spellings of every boolean mode; forgotten values error loudly") {
    // the two modes the strict parser used to reject in their documented
    // argv spelling (boolean flags followed by another flag)
    val lg = Main.parseArgs(Array("--link-graph", "--input-warc", "/g/*.warc", "--out", "/o"))
    assert(lg === Map("link-graph" -> "true", "input-warc" -> "/g/*.warc", "out" -> "/o"))
    val ep = Main.parseArgs(Array("--load", "/idx", "--query-file", "/q",
      "--exact-probe", "--probe-cells", "8"))
    assert(ep("exact-probe") === "true" && ep("probe-cells") === "8" && ep("load") === "/idx")
    // every boolean flag parses in flag-then-flag and trailing positions
    // (--pq-kernel joined r14: the documented `--pq-refine R --pq-kernel`
    // spelling used to throw "requires a value"; --no-calibrate is the
    // r14 auto-calibration opt-out)
    for (f <- Seq("--build", "--serve", "--large", "--routed", "--adaptive",
      "--exact-probe", "--link-graph", "--canonical-urls", "--links",
      "--no-calibrate", "--pq-kernel")) {
      assert(Main.parseArgs(Array(f, "--out", "/o"))(f.drop(2)) === "true", s"$f before a flag")
      assert(Main.parseArgs(Array("--out", "/o", f))(f.drop(2)) === "true", s"$f trailing")
    }
    val pk = Main.parseArgs(Array("--load", "/idx", "--pq-refine", "3200", "--pq-kernel"))
    assert(pk("pq-kernel") === "true" && pk("pq-refine") === "3200")
    // --prepare may appear valueless before another flag (WARC mode) and
    // still takes a value in the parquet spelling
    assert(Main.parseArgs(Array("--prepare", "--input-warc", "/g", "--out", "/o"))
      .get("prepare").contains("true"))
    assert(Main.parseArgs(Array("--prepare", "/docs", "--out", "/o"))("prepare") === "/docs")
    // a forgotten value errors at parse, not as spark.read.parquet("true")
    intercept[IllegalArgumentException](Main.parseArgs(Array("--query-file", "--out", "/o")))
    intercept[IllegalArgumentException](Main.parseArgs(Array("--out")))
    intercept[IllegalArgumentException](Main.parseArgs(Array("stray")))
  }
}
