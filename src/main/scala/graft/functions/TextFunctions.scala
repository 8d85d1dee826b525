package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines:
  * tokenization, shingling, quality scoring, language-ID heuristic and
  * document fingerprinting. All built from codegen'd built-in functions
  * (no UDFs), and all designed so a DuckDB oracle can reproduce the exact
  * values: integer counts, single divisions, and md5 — nothing
  * engine-specific.
  */
object TextFunctions {

  /** Whitespace token count without materializing the split array:
    * spaces + 1, exact integer arithmetic in any engine.
    */
  def tokenCount(text: Column): Column =
    length(text) - length(regexp_replace(text, " ", "")) + lit(1)

  /** Tokens as an array (single-space separated corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles from an already-materialized token-array column.
    * Empty array when the document has fewer than n tokens (guards Spark's
    * `sequence(1,0)` descending-sequence surprise).
    *
    * PERFORMANCE: pass a *column reference* to a token array, not
    * `split(...)` inline — lambda bodies are excluded from codegen
    * subexpression elimination, so an inlined split would re-tokenize the
    * document once per element access (O(tokens²) per doc).
    */
  def wordShinglesFromTokens(w: Column, n: Int): Column = {
    val count = size(w) - lit(n - 1)
    when(count >= 1,
      transform(sequence(lit(1), count), i =>
        concat_ws(" ", (0 until n).map(j => element_at(w, i + lit(j))): _*))
    ).otherwise(array().cast("array<string>"))
  }

  /** Word n-gram shingles straight from text — convenience for small inputs;
    * see the performance note on [[wordShinglesFromTokens]].
    */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesFromTokens(tokens(text), n)

  /** Character n-gram shingles. */
  def charShingles(text: Column, n: Int): Column = {
    val count = length(text) - lit(n - 1)
    when(count >= 1,
      transform(sequence(lit(1), count), i => substring(text, i.cast("int"), lit(n)))
    ).otherwise(array().cast("array<string>"))
  }

  /** English-ish stopword list used by quality scoring and language ID. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "in", "to", "it")

  /** Count of tokens that are stopwords. */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(Stopwords.map(lit): _*)))

  /** Quality score in [0,1]: weighted mix of stopword ratio, mean word
    * length band and length band — the usual cheap heuristics a pretraining
    * pipeline applies before expensive model-based filters. Exact-arithmetic
    * composition (each ratio is one integer division).
    */
  def qualityScore(text: Column): Column = {
    val nTok  = tokenCount(text).cast("double")
    val nStop = stopwordCount(text).cast("double")
    val nChar = length(text).cast("double")
    val stopRatio = nStop / nTok
    // mean token length (chars excluding spaces / tokens)
    val meanLen = (nChar - (nTok - lit(1.0))) / nTok
    val lenOk  = when(nChar >= 100.0 && nChar <= 2000.0, lit(1.0)).otherwise(lit(0.0))
    val wordOk = when(meanLen >= 3.0 && meanLen <= 12.0, lit(1.0)).otherwise(lit(0.0))
    stopRatio * lit(0.4) + lenOk * lit(0.3) + wordOk * lit(0.3)
  }

  /** Language-marker token sets for the n-gram language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "los", "y", "es", "de"),
  )

  /** Language-ID heuristic: argmax of marker-token hits, first-listed wins
    * ties, "und" (unknown) when nothing matches. Deterministic and
    * reproducible in SQL.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isin(markers.map(lit): _*)))
    }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** BPE-ish subword token count: runs of letters, runs of digits, and
    * single other non-space characters — the cheap proxy for tokenizer cost
    * accounting in a pretraining pipeline. The pattern uses only constructs
    * with identical semantics in Java regex and RE2, so a DuckDB oracle
    * reproduces it.
    */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpePattern), lit(0)))

  /** Document fingerprint: md5 of the lowercased text — identical hex in
    * Spark and DuckDB, so exact-dedup and oracle checks can share it.
    */
  /** HTML boilerplate strip — the extraction step between a crawl fetch
    * and every text operator in this engine (the trafilatura-lite core):
    * script/style blocks drop whole, remaining tags drop, the four
    * universal entities decode, whitespace collapses. Every regex stays
    * in the Java-regex/RE2-identical subset (the [[graft.operators.Pii]]
    * contract), so a DuckDB oracle reproduces the output byte-for-byte.
    * Pure codegen'd projection — no UDF, no shuffle.
    */
  def stripHtml(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    // &amp; decodes LAST (standard entity order): author-escaped markup
    // like "&amp;lt;" must become the displayed "&lt;", not double-decode
    // to a literal "<"
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => regexp_replace(c, e, v) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  def fingerprint(text: Column): Column = md5(lower(text))

  /** Crawl URL canonicalization — the normalize step BEFORE first-wins
    * URL dedup ([[graft.operators.Pipeline.docsFromWarc]]): the same page
    * fetched as `HTTP://Site.COM:80/a?utm_source=x&b=1#frag` and
    * `http://site.com/a?b=1` must collide, or the crawl keeps both.
    * Rules (each a deliberate, documented choice):
    *   - fragment drops (never sent to the server);
    *   - scheme and host[:port] lowercase; the PATH keeps its case
    *     (case-significant on most origins);
    *   - default ports drop (`:80` for http, `:443` for https); real
    *     ports survive;
    *   - tracking params drop (`utm_*`, `gclid`, `fbclid`), remaining
    *     params sort byte-order for order-insensitive equality;
    *   - empty path becomes `/`; ONE trailing slash strips from a
    *     non-root path.
    * Every regex is anchored (single-match), staying in the
    * Java-regex/RE2-identical subset with DuckDB-equal replace
    * semantics, so an oracle reproduces the output byte-for-byte.
    * Pure codegen'd projection — no UDF, no shuffle.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val host = when(scheme === lit("http"), regexp_replace(hostport, ":80$", ""))
      .when(scheme === lit("https"), regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    val rawPath = regexp_replace(pathq, "\\?.*$", "")
    val query = when(instr(pathq, "?") > 0,
      regexp_replace(pathq, "^[^?]*\\?", "")).otherwise(lit(""))
    val params = filter(split(query, "&"),
      p => !(p === lit("") || p.rlike("^(utm_[^=]*|gclid|fbclid)(=|$)")))
    val canonQ = array_join(array_sort(params), "&")
    val path = when(rawPath === lit(""), lit("/"))
      .otherwise(regexp_replace(rawPath, "(.)/$", "$1"))
    concat(scheme, lit("://"), host, path,
      when(length(canonQ) > 0, concat(lit("?"), canonQ)).otherwise(lit("")))
  }

  /** Rolling polynomial hash (Karp–Rabin) over the token stream,
    * acc' = (acc·31 + h(tok)) mod (2³¹−1) with h = the integer value of the
    * first 5 md5 hex chars (20 bits). All intermediate products stay below
    * 2³⁶ — exact in int64 under ANSI mode and reproducible in any engine
    * (md5 + integer arithmetic only, so it is DuckDB-oracle-checkable).
    */
  val RollingHashMod: Long = 2147483647L // 2^31 − 1 (Mersenne)
  val RollingHashMul: Long = 31L

  def rollingHash(text: Column): Column =
    aggregate(
      transform(tokens(text), t => conv(substring(md5(t), 1, 5), 16, 10).cast("long")),
      lit(0L),
      (acc, h) => (acc * lit(RollingHashMul) + h) % lit(RollingHashMod))

  /** All `<a href="...">` target URLs of an HTML column, document order.
    * One anchored group regex — the Java-regex/RE2 shared subset (literal
    * prefix, negated-class body, no backtracking), so the DuckDB oracle
    * extracts the identical list. Single-quoted/unquoted href variants
    * are deliberately out of scope (the synthetic crawl and any sane
    * generator double-quote); the crawl's own strip runs AFTER link
    * extraction, so this reads the raw payload.
    */
  def extractHrefs(html: Column): Column =
    regexp_extract_all(html, lit("<a href=\"([^\"]*)\""), lit(1))

  /** Host of an absolute http(s) URL, lowercased, port stripped — the
    * link-graph node key ("" for relative/other schemes; callers filter).
    */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^[Hh][Tt][Tt][Pp][Ss]?://([^/:?#]*)", 1))

  /** Mojibake signature table: UTF-8 text decoded as Latin-1/cp1252 (the
    * classic crawl corruption: "café" → "cafÃ©", a curly apostrophe →
    * "donâ€™t") mapped back to the intended character. Covers the common
    * Western-European two-byte family (lead Ã = 0xC3 accents, Â = 0xC2
    * symbols) and the cp1252 â€ trigram family (0xE2 0x80 xx — curly
    * quotes, dashes, ellipsis). A TABLE, not a codec round-trip, for two
    * reasons: Spark 4's `encode` THROWS on any unmappable character
    * (MALFORMED_CHARACTER_CODING) so charset-based repair is unsafe as a
    * column expression, and a literal table is exactly reproducible in
    * any engine (the ftfy approach, minus its iteration). Single-pass:
    * doubly-encoded mojibake ("ÃƒÂ©") repairs one layer per application.
    */
  val MojibakePairs: Seq[(String, String)] = Seq(
    "Ã©" -> "é", "Ã¨" -> "è", "Ã¡" -> "á", "Ã³" -> "ó", "Ãº" -> "ú",
    "Ã±" -> "ñ", "Ã¤" -> "ä", "Ã¶" -> "ö", "Ã¼" -> "ü", "Ã§" -> "ç",
    "â€™" -> "’", "â€œ" -> "“", "â€“" -> "–",
    "â€”" -> "—", "â€¦" -> "…",
    "Â·" -> "·", "Â°" -> "°", "Â©" -> "©", "Â»" -> "»", "Â«" -> "«")

  /** Literal alternation over [[MojibakePairs]] keys — no classes, no
    * metacharacters, so Java regex and RE2/DuckDB count identically.
    */
  val MojibakePattern: String = MojibakePairs.map(_._1).mkString("|")

  /** Count of mojibake signature hits — the detection half (oracle-exact:
    * literal alternation, non-overlapping match count in both engines).
    */
  def mojibakeHits(text: Column): Column =
    size(regexp_extract_all(text, lit(MojibakePattern), lit(0)))

  /** Mojibake repair: the [[MojibakePairs]] replace chain, left to right.
    * Safe by construction — replace is a no-op without a match, repaired
    * characters (é, ', —, …) never begin another signature, and no key is
    * a substring of another — so application order cannot cascade on
    * singly-encoded text. Codegen'd builtins, never throws, and the SAME
    * chain spells in DuckDB — the repaired text itself is oracle-checked
    * (q135). DistancesSpec fuzzes fix(corrupt(s)) == s over the covered
    * alphabet.
    */
  def fixMojibake(text: Column): Column =
    MojibakePairs.foldLeft(text) { case (c, (bad, good)) =>
      replace(c, lit(bad), lit(good))
    }

  /** Unicode NFC normalization — canonical composition, the cleaning-tier
    * step that runs AFTER [[fixMojibake]] (repair first: mojibake
    * signatures are byte patterns normalization must not disturb) and
    * BEFORE [[tokens]]/[[wordShingles]]/[[fingerprint]] (decomposed
    * `e + U+0301` and precomposed `é` must be ONE spelling before any
    * dedup key or vocabulary statistic sees the text). Native codegen'd
    * expression; oracle-exact vs DuckDB's `nfc_normalize` (both implement
    * UAX #15). Already-normalized text (all ASCII) returns untouched.
    */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graft.UnicodeNormalize.column(text, "NFC")

  /** Unicode NFKC normalization — compatibility composition ([[nfcNormalize]]
    * plus compatibility folding: ﬁ → fi, ² → 2, full-width → ASCII), the
    * aggressive variant for search/dedup keys where visually-equivalent
    * spellings must collide. Same composition point as [[nfcNormalize]].
    */
  def nfkcNormalize(text: Column): Column =
    org.apache.spark.sql.graft.UnicodeNormalize.column(text, "NFKC")

  /** Any UAX #15 form (NFC/NFD/NFKC/NFKD). */
  def unicodeNormalize(text: Column, form: String): Column =
    org.apache.spark.sql.graft.UnicodeNormalize.column(text, form)

  /** Homoglyph table: the Cyrillic and Greek letters that render
    * identically (or near-identically) to Basic-Latin ones — the spoofing
    * alphabet of crawl spam ("pаypal" with U+0430 evades every ASCII
    * dedup key and blocklist). Lowercase pairs only: [[confusableFold]]
    * lowercases FIRST (Spark and DuckDB lower() agree on Cyrillic/Greek
    * case folding), which halves the table and keeps it auditable.
    * Deliberately NOT the full UTS #39 confusables data (thousands of
    * pairs, many font-dependent): these are the exact-render lookalikes
    * that dominate real spoofing, and the table is the contract — the
    * oracle replays it literally.
    */
  val ConfusablePairs: Seq[(String, String)] = Seq(
    // Cyrillic → Latin (identical glyphs in all common fonts)
    "а" -> "a", "е" -> "e", "о" -> "o", "р" -> "p", "с" -> "c",
    "х" -> "x", "у" -> "y", "і" -> "i", "ј" -> "j", "ѕ" -> "s",
    "ԛ" -> "q", "ԝ" -> "w", "ь" -> "b",
    // Greek → Latin
    "ο" -> "o", "ν" -> "v", "ι" -> "i", "κ" -> "k", "ρ" -> "p",
    "υ" -> "u", "τ" -> "t")

  /** Confusable-fold — the homoglyph half of the dedup-key normalization
    * ladder (compose AFTER [[nfcNormalize]], which canonicalizes combining
    * sequences, and alongside [[nfkcNormalize]], which folds fullwidth and
    * ligature forms; this folds the CROSS-SCRIPT lookalikes none of the
    * UAX #15 forms touch): lowercase, then the [[ConfusablePairs]] replace
    * chain. A spoofed "pаypal" and the ASCII "paypal" now share every
    * fingerprint, shingle and blocklist key. Codegen'd builtins, and the
    * identical lower + replace chain spells in DuckDB — oracle-exact.
    */
  def confusableFold(text: Column): Column =
    ConfusablePairs.foldLeft(lower(text)) { case (c, (bad, good)) =>
      replace(c, lit(bad), lit(good))
    }
}
