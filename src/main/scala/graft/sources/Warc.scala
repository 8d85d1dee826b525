package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) ingestion — the distribution format of
  * Common Crawl and every major web archive, i.e. the raw input of a
  * 100 TB text pipeline. A WARC file is a sequence of records:
  *
  *   WARC/1.0\r\n
  *   &lt;header-name&gt;: &lt;value&gt;\r\n ...
  *   \r\n
  *   &lt;Content-Length payload bytes&gt;\r\n\r\n
  *
  * The parser honors `Content-Length` — it never delimiter-splits on the
  * "WARC/1.0" magic, so payloads CONTAINING that literal parse correctly
  * (the classic naive-splitter bug; the synthetic fixtures plant exactly
  * that case and the spec + oracle pin it).
  *
  * Scale shape: one record-set per input row, decoded in a typed
  * `flatMap` (per-row imperative byte parsing — the documented multimodal
  * exception, like [[Cifar]]/[[Idx]]); everything downstream is
  * relational. No driver collection anywhere.
  */
object Warc {

  /** Closed-form synthetic WARC byte streams for the oracle rows — REAL
    * WARC/1.0 layout built from pure integer arithmetic on `id`, so a SQL
    * oracle re-derives every parsed field without touching bytes:
    *
    *   - records per stream: 1 + id % 3
    *   - record i targets http://h{(id·7 + i) % 5}.example/p{(id·13 + i) % 7}
    *   - payload: tokens w{(id·13 + i·3 + j) % 50} for j &lt; 20 + (id + i) % 10,
    *     and record 0 additionally embeds the literal token "WARC/1.0"
    *     (the naive-splitter trap).
    */
  def syntheticWarc(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("id").cast("long")).as[Long].map { id =>
      val sb = new java.lang.StringBuilder()
      val recs = (1 + id % 3).toInt
      var i = 0
      while (i < recs) {
        val payload = payloadFor(id, i)
        sb.append("WARC/1.0\r\n")
        sb.append("WARC-Type: response\r\n")
        sb.append(s"WARC-Target-URI: ${urlFor(id, i)}\r\n")
        sb.append(s"Content-Length: ${payload.length}\r\n")
        sb.append("\r\n")
        sb.append(payload)
        sb.append("\r\n\r\n")
        i += 1
      }
      (id, sb.toString.getBytes("US-ASCII"))
    }.toDF("id", "content")
  }

  private[graft] def urlFor(id: Long, i: Int): String =
    s"http://h${(id * 7 + i) % 5}.example/p${(id * 13 + i) % 7}"

  private[graft] def payloadFor(id: Long, i: Int): String = {
    val n = (20 + (id + i) % 10).toInt
    val base = (0 until n).map(j => s"w${(id * 13 + i * 3 + j) % 50}").mkString(" ")
    if (i == 0) base + " WARC/1.0" else base
  }

  /** Parse `(id, content)` WARC byte streams to one row per record:
    * (id, rec, warc_type, url, host, content_length, payload). Truncated
    * trailing bytes (a record whose Content-Length overruns the stream)
    * are dropped, matching archive-reader convention.
    */
  def records(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("id").cast("long"), col("content")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) => parseRecords(bytes).zipWithIndex.map {
        case ((wtype, url, len, payload), rec) =>
          (id, rec.toLong, wtype, url, hostOf(url), len, payload)
      }}
      .toDF("id", "rec", "warc_type", "url", "host", "content_length", "payload")
  }

  /** Read raw `.warc` / `.warc.gz` files from a glob into `(path, content)`
    * rows — the crawl-native front door. Built on Spark's `binaryFile`
    * source (one task per file — WARC's Content-Length framing is not
    * splittable without an index, the standard Common Crawl trade-off;
    * crawls ship thousands of ~1 GB files, so file-level parallelism
    * saturates any cluster). Gzip members are inflated per file
    * (multi-member aware — `gzip -c a b > c` concatenations decode whole).
    */
  def readFiles(spark: SparkSession, glob: String): DataFrame =
    inflateFiles(spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content")))

  /** The per-file gzip-inflate step of [[readFiles]], reusable over any
    * `(path, content)` table (e.g. the in-memory crawl fixture).
    */
  def inflateFiles(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("path"), col("content")).as[(String, Array[Byte])]
      .map { case (path, bytes) => (path, gunzipIfNeeded(bytes)) }
      .toDF("path", "content")
  }

  /** Parse `(path, content)` file rows to one row per record:
    * (path, rec, warc_type, url, host, content_length, payload) — the
    * file-keyed twin of [[records]]; `(path, rec)` is the fetch's stable
    * identity (lexicographic path order ≈ crawl order for the
    * timestamp-named files every archive writes).
    */
  def recordsFromFiles(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => parseRecords(bytes).zipWithIndex.map {
        case ((wtype, url, len, payload), rec) =>
          (path, rec.toLong, wtype, url, hostOf(url), len, payload)
      }}
      .toDF("path", "rec", "warc_type", "url", "host", "content_length", "payload")
  }

  private[graft] def hostOf(url: String): String =
    url.stripPrefix("http://").stripPrefix("https://")
      .takeWhile(c => c != '/' && c != ':')

  /** Inflate gzip bytes (magic 0x1f 0x8b) — multi-member aware; plain
    * bytes pass through untouched.
    */
  private[graft] def gunzipIfNeeded(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length < 2 || (bytes(0) & 0xff) != 0x1f || (bytes(1) & 0xff) != 0x8b) bytes
    else {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes), 65536)
      try in.readAllBytes() finally in.close()
    }

  // --------------------------------------------------------------------
  // Synthetic crawl fixture — a deterministic, crawl-shaped WARC corpus
  // written as REAL .warc / .warc.gz files, with planted outcomes for
  // every --prepare stage. Record r in [0, n):
  //   - URL: r % 10 == 9 re-fetches record (r−9)'s URL with CHANGED
  //     content (prefix "refetch") — only URL first-wins dedup drops it;
  //   - body: r % 10 == 8 copies record (r−8)'s body under a fresh URL —
  //     only fingerprint dedup drops one of the pair;
  //   - base % 1000 == 0 → junk body (one giant word) — quality-gate prey;
  //   - otherwise 34 globally-unique tokens + 2 stopwords, HTML-wrapped
  //     with a <script> carrying the literal "WARC/1.0" (the framing trap).
  // --------------------------------------------------------------------

  /** The fetch URL of crawl record r (re-fetch collapses to the original). */
  private[graft] def crawlUrl(r: Long): String = {
    val base = if (r % 10 == 9) r - 9 else r
    s"http://h${base % 97}.example/p$base"
  }

  /** The EXPECTED post-stripHtml text of crawl record r — shared with the
    * specs/proof so planted outcomes are derivable without re-parsing.
    */
  private[graft] def crawlText(r: Long): String = {
    val base = if (r % 10 == 8) r - 8 else r
    if (base % 1000 == 0) "j" + "x" * 2499
    else {
      val pre = if (r % 10 == 9) "refetch " else ""
      pre + (0 until 34).map(i => s"t${100000000L + base * 50 + i}").mkString(" ") +
        " the and"
    }
  }

  private[graft] def crawlHtml(r: Long, links: Boolean = false): String = {
    // opt-in (--gen-warc --links): two deterministic outbound anchors —
    // default OFF because the anchor text survives the HTML strip and
    // would shift every planted prepare/strip expectation
    val anchors =
      if (!links) ""
      else s"""<a href="${crawlUrl(r * 31 + 7)}">n</a>""" +
        (if (r % 3 == 0) s"""<a href="${crawlUrl(r * 17 + 1)}">m</a>""" else "")
    "<html><head><title></title><script type=\"x\">var t = \"WARC/1.0\";" +
      "</script></head><body><p>" + crawlText(r) + "</p>" + anchors + "</body></html>"
  }

  private[graft] def crawlRecordBytes(r: Long, links: Boolean = false): Array[Byte] = {
    val payload = crawlHtml(r, links)
    ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Target-URI: ${crawlUrl(r)}\r\n" +
      s"Content-Length: ${payload.length}\r\n" +
      "\r\n" + payload + "\r\n\r\n").getBytes("US-ASCII")
  }

  /** The synthetic crawl as an in-memory RAW `(path, content)` table —
    * the [[readFiles]] pre-inflate shape without disk, for oracle rows:
    * file f holds records [f·perFile, (f+1)·perFile), odd-indexed files
    * are GZIPPED (pipe through [[inflateFiles]], so the inflate path
    * rides inside the oracle check), and zero-padded names keep
    * lexicographic path order = crawl order.
    */
  def syntheticCrawlFileRows(spark: SparkSession, nFiles: Long,
                             perFile: Int): DataFrame = {
    import spark.implicits._
    spark.range(0, nFiles, 1, math.max(1L, math.min(nFiles, 32L)).toInt).as[Long].map { f =>
      val raw = new java.io.ByteArrayOutputStream()
      var r = f * perFile
      while (r < (f + 1) * perFile) { raw.write(crawlRecordBytes(r)); r += 1 }
      val bytes =
        if (f % 2 == 1) {
          val bos = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(bos)
          gz.write(raw.toByteArray); gz.close()
          bos.toByteArray
        } else raw.toByteArray
      (f"part-$f%05d.warc" + (if (f % 2 == 1) ".gz" else ""), bytes)
    }.toDF("path", "content")
  }

  /** Write the synthetic crawl as `nFiles` real WARC files under `outDir`
    * (LOCAL filesystem — a test/proof fixture, not a production sink).
    * Records are contiguous per file and files are zero-padded-name
    * ordered, so lexicographic path order IS crawl order (the first-wins
    * contract the prepare front door asserts on). Odd-indexed files are
    * gzipped to exercise the inflate path.
    */
  def writeSyntheticCrawl(spark: SparkSession, outDir: String, n: Long,
                          nFiles: Int, links: Boolean = false): Unit = {
    require(n > 0 && nFiles > 0, "writeSyntheticCrawl: positive n and nFiles")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val per = (n + nFiles - 1) / nFiles
    import spark.implicits._
    spark.range(0, nFiles, 1, math.min(nFiles, 32)).as[Long].foreach { f =>
      val lo = f * per
      val hi = math.min(n, lo + per)
      val gz = f % 2 == 1
      val name = f"part-$f%05d.warc" + (if (gz) ".gz" else "")
      val fos = new java.io.FileOutputStream(s"$outDir/$name")
      val os: java.io.OutputStream =
        if (gz) new java.util.zip.GZIPOutputStream(fos, 65536) else fos
      try {
        var r = lo
        while (r < hi) { os.write(crawlRecordBytes(r, links)); r += 1 }
      } finally os.close()
    }
  }

  /** Content-Length-honoring record parser over one byte stream. */
  private[graft] def parseRecords(bytes: Array[Byte]): Seq[(String, String, Long, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, String)]
    val s = new String(bytes, "US-ASCII")
    var pos = 0
    while (pos >= 0 && pos < s.length) {
      val magic = s.indexOf("WARC/1.0\r\n", pos)
      if (magic < 0) { pos = -1 }
      else {
        val headerEnd = s.indexOf("\r\n\r\n", magic)
        if (headerEnd < 0) { pos = -1 }
        else {
          val headers = s.substring(magic + 10, headerEnd).split("\r\n")
            .flatMap { line =>
              val c = line.indexOf(':')
              if (c < 0) None else Some(line.take(c).trim.toLowerCase -> line.drop(c + 1).trim)
            }.toMap
          val len = headers.get("content-length").flatMap(v => v.toLongOption)
          val payloadStart = headerEnd + 4
          len match {
            // l >= 0: a negative Content-Length (hostile or corrupt header)
            // would pass the bounds check below and throw in substring —
            // fuzz-pinned in PropertySpec (parse never throws)
            case Some(l) if l >= 0 && payloadStart + l <= s.length =>
              out += ((headers.getOrElse("warc-type", ""),
                headers.getOrElse("warc-target-uri", ""), l,
                s.substring(payloadStart, payloadStart + l.toInt)))
              pos = payloadStart + l.toInt // skip the payload VERBATIM
            case _ => pos = -1 // truncated or malformed tail: drop
          }
        }
      }
    }
    out.toSeq
  }
}
