package graft

/** DuckDB oracle-SQL fragments that reproduce the engine's arithmetic
  * bit-for-bit.
  *
  * Contract with the Spark side: every oracle-checked query restricts itself
  * to IEEE-754 exact operations (+, −, ×, ÷, sqrt) applied in the SAME
  * association order as Spark's `aggregate` fold (strict left-to-right,
  * starting from 0.0 — and `0.0 + t == t` for the non-negative terms used
  * here), plus md5 (identical hex in both engines) and integer arithmetic.
  * No rounding is applied anywhere, because none is needed.
  */
object OracleSql {

  /** Σᵢ (a[i]−b[i])² as an explicit left-associative sum (1-based list
    * indexing in both DuckDB and Spark's element_at).
    */
  def sqDistSql(a: String, b: String, dim: Int): String =
    (1 to dim).map { i =>
      val t = s"(CAST($a[$i] AS DOUBLE) - CAST($b[$i] AS DOUBLE))"
      s"$t * $t"
    }.mkString(" + ")

  def l2Sql(a: String, b: String, dim: Int): String =
    s"sqrt(${sqDistSql(a, b, dim)})"

  def dotSql(a: String, b: String, dim: Int): String =
    (1 to dim).map(i => s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)").mkString(" + ")

  /** Cosine distance with the reference's zero-norm → 1.0 convention. */
  def cosineSql(a: String, b: String, dim: Int): String = {
    val na = s"sqrt(${dotSql(a, a, dim)})"
    val nb = s"sqrt(${dotSql(b, b, dim)})"
    s"CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 1.0 ELSE 1.0 - (${dotSql(a, b, dim)}) / ($na * $nb) END"
  }

  /** Word n-gram shingle CTE over `documents`: (doc_id, shingle).
    * Mirrors TextFunctions.wordShingles (empty for docs shorter than n
    * tokens — generate_series(1, len-&lt;n-1&gt;) is empty when stop &lt; start).
    */
  def shingleCte(n: Int): String = {
    val from = shingleCteFrom(n, "documents", "shingles")
    // historical names: the single-source form keeps its original CTE names
    from.replace("shingles_toks", "toks").replace("shingles_tokidx", "tokidx")
  }

  /** [[shingleCte]] parametrized by source relation and output CTE name,
    * for queries shingling more than one document set (e.g. the
    * incremental new-batch-vs-corpus dedup). Internal CTEs are prefixed
    * with the output name to stay collision-free.
    */
  def shingleCteFrom(n: Int, src: String, name: String): String =
    s"""${name}_toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM $src),
       |${name}_tokidx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - ${n - 1})) AS i FROM ${name}_toks),
       |$name AS (
       |  SELECT doc_id, concat_ws(' ', ${(0 until n).map(j => s"w[i+$j]").mkString(", ")}) AS shingle
       |  FROM ${name}_tokidx)""".stripMargin

  /** [[shingleCteFrom]] with the 1-based shingle-start position kept:
    * (doc_id, pos, shingle) — the positioned form span-level dedup
    * reassembles runs from. Same tokenization, same empty-series behavior
    * for short docs.
    */
  def posShingleCteFrom(n: Int, src: String, name: String): String =
    s"""${name}_toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM $src),
       |${name}_tokidx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - ${n - 1})) AS i FROM ${name}_toks),
       |$name AS (
       |  SELECT doc_id, i AS pos, concat_ws(' ', ${(0 until n).map(j => s"w[i+$j]").mkString(", ")}) AS shingle
       |  FROM ${name}_tokidx)""".stripMargin

  /** Sign-pattern LSH bucket of an embedding list column — mirrors
    * Dedup.embeddingBucket: bit g = [group-g component sum > 0], packed as
    * an integer. Left-associative sums, identical association order.
    */
  def embeddingBucketSql(vec: String, dim: Int, bits: Int): String = {
    val group = dim / bits
    (0 until bits).map { g =>
      val s = (g * group until (g + 1) * group)
        .map(i => s"CAST($vec[${i + 1}] AS DOUBLE)").mkString(" + ")
      s"(CASE WHEN $s > 0.0 THEN ${1L << g} ELSE 0 END)"
    }.mkString(" + ")
  }

  /** Integer value of the first `nChars` md5 hex chars of an expression —
    * DuckDB twin of `conv(substring(md5(x), 1, nChars), 16, 10)` (Horner
    * chain over strpos-decoded hex digits; exact integer arithmetic).
    */
  def md5PrefixValueSql(expr: String, nChars: Int): String = {
    val digit = (p: Int) =>
      s"(strpos('0123456789abcdef', substring(md5($expr), $p, 1)) - 1)"
    s"CAST(${(2 to nChars).foldLeft(digit(1))((acc, p) => s"($acc * 16 + ${digit(p)})")} AS BIGINT)"
  }

  /** MinHash aggregate for seed s over column `shingle`. */
  def minhashSql(seed: Int): String = s"min(md5(concat('s$seed|', shingle)))"

  /** Stopword-hit count over single-space-separated text. */
  def stopCountSql(textExpr: String, words: Seq[String]): String = {
    val list = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(string_split($textExpr, ' '), x -> x IN ($list)))"
  }

  /** Whitespace token count: spaces + 1 (exact integer arithmetic). */
  def tokenCountSql(textExpr: String): String =
    s"(length($textExpr) - length(replace($textExpr, ' ', '')) + 1)"
}
