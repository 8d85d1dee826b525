package graft

import org.apache.spark.sql.functions._

import graft.functions.{Distances, Levels, TextFunctions}

class DistancesSpec extends SparkSpec {
  import spark.implicits._

  test("l2 column function matches hand-computed value") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 6.0, 3.0))).toDF("a", "b")
    val d = df.select(Distances.l2($"a", $"b")).head().getDouble(0)
    assert(d === 5.0)
  }

  test("cosine of identical vectors is 0; orthogonal is 1") {
    val df = Seq(
      (Array(1.0, 0.0), Array(1.0, 0.0)),
      (Array(1.0, 0.0), Array(0.0, 1.0))).toDF("a", "b")
    val res = df.select(Distances.cosine($"a", $"b")).collect().map(_.getDouble(0))
    assert(math.abs(res(0)) < 1e-12)
    assert(math.abs(res(1) - 1.0) < 1e-12)
  }

  test("cosine zero-norm convention returns exactly 1.0 (hsnw_trial.py:51-52)") {
    val df = Seq((Array(0.0, 0.0), Array(1.0, 2.0))).toDF("a", "b")
    assert(df.select(Distances.cosine($"a", $"b")).head().getDouble(0) === 1.0)
  }

  test("local distance twins agree with column functions") {
    val a = Array(0.5f, -1.5f, 2.0f)
    val b = Array(1.0f, 0.25f, -2.0f)
    val df = Seq((a.map(_.toDouble), b.map(_.toDouble))).toDF("a", "b")
    val colL2 = df.select(Distances.l2($"a", $"b")).head().getDouble(0)
    val colCos = df.select(Distances.cosine($"a", $"b")).head().getDouble(0)
    assert(math.abs(colL2 - Distances.l2Local(a, b)) < 1e-12)
    assert(math.abs(colCos - Distances.cosineLocal(a, b)) < 1e-12)
  }

  test("native codegen expressions are bit-identical to the HOF compositions") {
    val rng = new scala.util.Random(42)
    val rows = Seq.fill(50)((Array.fill(64)(rng.nextGaussian().toFloat),
                             Array.fill(64)(rng.nextGaussian().toFloat)))
    val df = rows.toDF("a", "b")
    val cmp = df.select(
      Distances.sqDist($"a", $"b").as("n_sq"),
      Distances.sqDistHof(Distances.toDouble($"a"), Distances.toDouble($"b")).as("h_sq"),
      Distances.dot($"a", $"b").as("n_dot"),
      Distances.dotHof(Distances.toDouble($"a"), Distances.toDouble($"b")).as("h_dot"),
      Distances.cosine($"a", $"b").as("n_cos"),
      Distances.cosineHof(Distances.toDouble($"a"), Distances.toDouble($"b")).as("h_cos"))
      .collect()
    cmp.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1)) // exact, not approximate
      assert(r.getDouble(2) === r.getDouble(3))
      assert(r.getDouble(4) === r.getDouble(5))
    }
  }

  test("native cosine zero-norm convention and float/double mixing") {
    val df = Seq((Array(0f, 0f), Array(1.0, 2.0))).toDF("a", "b")
    assert(df.select(Distances.cosine($"a", $"b")).head().getDouble(0) === 1.0)
  }

  test("cosineLocalPre with precomputed norms is BIT-identical to cosineLocal (the build hot-loop form)") {
    // the norm cache rewrites 1 - dot/(sqrt(na)*sqrt(nb)) with na/nb
    // computed once per vector; the three accumulators are independent
    // and i-ascending, so every IEEE intermediate is the same — pinned
    // here bitwise over adversarial values (denormals, huge/tiny mixes,
    // zero vectors), because the whole point is that cached-norm builds
    // produce the SAME graph as per-pair cosineLocal builds
    val rnd = new scala.util.Random(42)
    def vec(n: Int, f: Int => Float): Array[Float] = Array.tabulate(n)(f)
    val cases: Seq[(Array[Float], Array[Float])] = Seq(
      (vec(512, _ => rnd.nextFloat() * 2f - 1f), vec(512, _ => rnd.nextFloat() * 2f - 1f)),
      (vec(7, _ => rnd.nextFloat()), vec(7, _ => -rnd.nextFloat())),
      (vec(64, i => (i * 1e-42f)), vec(64, i => ((63 - i) * 1e38f))),
      (vec(16, _ => 0f), vec(16, _ => rnd.nextFloat())),
      (vec(16, _ => rnd.nextFloat()), vec(16, _ => 0f)),
      (vec(1, _ => 3.5f), vec(1, _ => -2.25f)))
    cases.foreach { case (a, b) =>
      val plain = Distances.cosineLocal(a, b)
      val pre = Distances.cosineLocalPre(a, Distances.normLocal(a), b, Distances.normLocal(b))
      assert(java.lang.Double.doubleToLongBits(plain) ===
        java.lang.Double.doubleToLongBits(pre),
        s"cosineLocalPre must be bit-identical (plain=$plain pre=$pre)")
    }
    // and the norm itself is cosineLocal's own na accumulation
    val v = vec(512, _ => rnd.nextFloat() * 2f - 1f)
    assert(java.lang.Double.doubleToLongBits(Distances.normLocal(v)) ===
      java.lang.Double.doubleToLongBits(math.sqrt(Distances.dotLocal(v, v))))
  }

  test("metric registry rejects unknown names (hsnw_trial.py:88-89)") {
    intercept[IllegalArgumentException](Distances.metric("manhattan"))
    intercept[IllegalArgumentException](Distances.metricLocal("manhattan"))
  }

  test("level function is id-stable and matches the local twin") {
    val mL = Levels.defaultML(16)
    val df = spark.range(1000).select(Levels.levelFor($"id", mL).as("level"))
    val fromCol = df.collect().map(_.getInt(0))
    val fromLocal = (0L until 1000L).map(Levels.levelForLocal(_, mL))
    assert(fromCol.toSeq === fromLocal)
    // levels follow the expected geometric-ish decay: most mass at 0
    assert(fromCol.count(_ == 0) > 600)
    assert(fromCol.max <= 10)
  }

  test("token count and shingles") {
    val df = Seq("the quick brown fox", "ab").toDF("text")
    val counts = df.select(TextFunctions.tokenCount($"text")).collect().map(_.getInt(0))
    assert(counts.toSeq === Seq(4, 1))
    val sh = df.select(TextFunctions.wordShingles($"text", 3)).collect().map(_.getSeq[String](0))
    assert(sh(0) === Seq("the quick brown", "quick brown fox"))
    assert(sh(1) === Seq.empty)
  }

  test("relational text stats equal the per-row HOF forms exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rel = graft.operators.TextStats.textStats(docs, "doc_id", "text")
      .select($"doc_id", $"n_tokens", $"quality", $"pred_lang")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getString(3))).toMap
    val hof = docs.select($"doc_id",
        TextFunctions.tokenCount($"text"),
        TextFunctions.qualityScore($"text"),
        TextFunctions.langId($"text"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getString(3))).toMap
    assert(rel === hof) // bit-exact, not approximate
  }

  test("langId picks the marker-richest language deterministically") {
    val df = Seq("the cat is on the mat", "der hund und die katze", "xyzzy plugh").toDF("text")
    val langs = df.select(TextFunctions.langId($"text")).collect().map(_.getString(0))
    assert(langs.toSeq === Seq("en", "de", "und"))
  }

  test("mismatched vector dimensions raise instead of reading out of bounds") {
    val df = Seq((Array(1f, 2f, 3f), Array(1f))).toDF("a", "b")
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).toSeq
    val e = intercept[Exception] { df.select(Distances.l2($"a", $"b")).collect() }
    assert(chain(e).exists(m => m != null && m.contains("dimension mismatch")), chain(e).toString)
    val e2 = intercept[Exception] { df.select(Distances.cosine($"a", $"b")).collect() }
    assert(chain(e2).exists(m => m != null && m.contains("dimension mismatch")))
  }

  test("char shingles, stopword count, cosine similarity, token-array simhash") {
    val df = Seq(("abcde", "the cat of doom")).toDF("a", "b")
    val row = df.select(
      TextFunctions.charShingles($"a", 3),
      TextFunctions.charShingles($"a", 9),
      TextFunctions.stopwordCount($"b")).head()
    assert(row.getSeq[String](0) === Seq("abc", "bcd", "cde"))
    assert(row.getSeq[String](1) === Seq.empty) // shorter than n → empty
    assert(row.getInt(2) === 2)                 // "the", "of"

    val v = Seq((Array(1.0, 0.0), Array(0.0, 3.0), Array(2.0, 0.0), Array(0.0, 0.0)))
      .toDF("x", "y", "z", "zero")
    val sims = v.select(
      Distances.cosineSim($"x", $"y"), Distances.cosineSim($"x", $"z"),
      Distances.cosineSim($"x", $"zero")).head()
    assert(sims.getDouble(0) === 0.0) // orthogonal
    assert(sims.getDouble(1) === 1.0) // parallel
    assert(sims.getDouble(2) === 0.0) // zero-norm convention

    // simhashFromTokens over the pre-split array equals simhash over text
    val t = Seq("the quick brown fox").toDF("text")
    val pair = t.select(
      graft.operators.Dedup.simhash($"text", 16),
      graft.operators.Dedup.simhashFromTokens(TextFunctions.tokens($"text"), 16)).head()
    assert(pair.getLong(0) === pair.getLong(1))
  }

  test("mojibake: fix(corrupt(s)) == s over seeded cp1252 fuzz; clean text untouched; detector counts exact") {
    import org.apache.spark.sql.functions._
    // corrupt the way crawls actually do: UTF-8 bytes re-read as cp1252
    // (which renders the Ã/Â accent pairs AND the â€ trigram family)
    def corrupt(s: String) = new String(s.getBytes("UTF-8"), "windows-1252")
    val rnd = new scala.util.Random(42)
    val alphabet = ("abcdefghijklmnopqrstuvwxyz ABC 0123456789 .,!?" +
      "éèáóúñäöüç’“–—…·°©»«").toCharArray
    val strs = (0 until 500).map { i =>
      val s = Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.length))).mkString
      (s, corrupt(s))
    }.toDF("orig", "bad")
    val fixed = strs.select(col("orig"),
      TextFunctions.fixMojibake(col("bad")).as("fixed")).collect()
    fixed.foreach(r => assert(r.getString(1) === r.getString(0),
      s"roundtrip failed for '${r.getString(0)}'"))
    // clean ASCII and a REAL café pass through byte-stable, zero hits
    val clean = Seq((0L, "plain ascii text."), (1L, "real café, no mojibake"))
      .toDF("id", "s")
      .select(col("s"), TextFunctions.fixMojibake(col("s")).as("f"),
        TextFunctions.mojibakeHits(col("s")).as("h")).collect()
    clean.foreach { r =>
      assert(r.getString(1) === r.getString(0)); assert(r.getInt(2) === 0)
    }
    // detector counts non-overlapping signature hits exactly
    val counted = Seq((0L, corrupt("don’t — café"))).toDF("id", "s")
      .select(TextFunctions.mojibakeHits(col("s")),
        TextFunctions.fixMojibake(col("s"))).head()
    assert(counted.getInt(0) === 3 && counted.getString(1) === "don’t — café")
  }
}
