package graft.sources

import org.apache.spark.sql.DataFrame
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
          val host = url.stripPrefix("http://").stripPrefix("https://")
            .takeWhile(c => c != '/' && c != ':')
          (id, rec.toLong, wtype, url, host, len, payload)
      }}
      .toDF("id", "rec", "warc_type", "url", "host", "content_length", "payload")
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
            case Some(l) if payloadStart + l <= s.length =>
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
