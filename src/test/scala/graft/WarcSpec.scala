package graft

import org.apache.spark.sql.functions._

import graft.sources.Warc

/** WARC parser: Content-Length discipline (no delimiter splitting),
  * header extraction, host derivation, truncation behavior, and the
  * synthetic round trip the oracle rows ride on.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def record(url: String, payload: String,
                     wtype: String = "response"): String =
    s"WARC/1.0\r\nWARC-Type: $wtype\r\nWARC-Target-URI: $url\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n$payload\r\n\r\n"

  test("parseRecords: payload containing the WARC magic does NOT split the record") {
    val trap = "before WARC/1.0\r\nWARC-Type: fake\r\n\r\n after"
    val bytes = (record("http://a.example/1", trap) +
      record("http://b.example/2", "second payload")).getBytes("US-ASCII")
    val recs = Warc.parseRecords(bytes)
    assert(recs.length === 2, "naive splitting on the magic would see 3+")
    assert(recs(0)._4 === trap, "payload must round-trip verbatim")
    assert(recs(1)._2 === "http://b.example/2")
  }

  test("parseRecords: truncated tail drops, preceding records survive") {
    val good = record("http://a.example/1", "hello world")
    val bad = "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://c.example\r\n" +
      "Content-Length: 9999\r\n\r\nshort"
    val recs = Warc.parseRecords((good + bad).getBytes("US-ASCII"))
    assert(recs.length === 1)
    assert(recs(0)._3 === 11L)
  }

  test("records: host extraction and schema; synthetic streams match the closed form") {
    val ids = Seq(0L, 5L, 9L).toDF("id")
    val got = Warc.records(Warc.syntheticWarc(ids)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getString(3), r.getString(4), r.getLong(5), r.getString(6))).toMap
    // id 5: 1 + 5%3 = 3 records; id 0/9: 1 record each (id%3 = 0)
    assert(got.size === 5)
    for (id <- Seq(0L, 5L, 9L); i <- 0 until (1 + id % 3).toInt) {
      val (wtype, url, host, len, payload) = got((id, i.toLong))
      assert(wtype === "response")
      assert(url === Warc.urlFor(id, i))
      assert(host === s"h${(id * 7 + i) % 5}.example")
      assert(payload === Warc.payloadFor(id, i))
      assert(len === payload.length.toLong)
      if (i == 0) assert(payload.endsWith(" WARC/1.0"), "record 0 carries the trap token")
    }
  }

  test("https and port strip from host") {
    val bytes = record("https://secure.example:8443/path", "x").getBytes("US-ASCII")
    val host = Warc.records(Seq((1L, bytes)).toDF("id", "content"))
      .select("host").head().getString(0)
    assert(host === "secure.example")
  }

  test("readFiles + recordsFromFiles: real .warc and .warc.gz files round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("warc-files").toString
    Warc.writeSyntheticCrawl(spark, dir, n = 40L, nFiles = 4)
    val names = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(names.toSeq === Seq("part-00000.warc", "part-00001.warc.gz",
      "part-00002.warc", "part-00003.warc.gz"),
      "odd-indexed files must be gzipped; names zero-padded for path order")
    val recs = Warc.recordsFromFiles(Warc.readFiles(spark, s"$dir/*"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(3), r.getString(6)))
    assert(recs.length === 40, "every record parses, gzipped files included")
    // file f holds records [10f, 10f+10); rec index resets per file
    val byFile = recs.groupBy(_._1).toSeq.sortBy(_._1)
    byFile.zipWithIndex.foreach { case ((path, rows), f) =>
      assert(rows.map(_._2).sorted.toSeq === (0L until 10L),
        s"$path: rec indices must be 0..9")
      rows.foreach { case (_, rec, url, payload) =>
        val r = f * 10L + rec
        assert(url === Warc.crawlUrl(r))
        assert(payload === Warc.crawlHtml(r), s"record $r payload mismatch")
      }
    }
  }

  test("syntheticCrawlFileRows: in-memory fixture is byte-identical to the disk files") {
    val dir = java.nio.file.Files.createTempDirectory("warc-par").toString
    Warc.writeSyntheticCrawl(spark, dir, n = 40L, nFiles = 4) // per = 10
    val disk = Warc.readFiles(spark, s"$dir/*").collect()
      .map(r => (r.getString(0).split('/').last, r.getAs[Array[Byte]](1).toSeq)).toMap
    val mem = Warc.inflateFiles(Warc.syntheticCrawlFileRows(spark, nFiles = 4, perFile = 10))
      .collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    assert(disk.keySet === mem.keySet)
    disk.foreach { case (name, bytes) =>
      assert(bytes === mem(name), s"$name: fixture bytes must match after inflate")
    }
  }

  test("gunzipIfNeeded: multi-member gzip inflates whole; plain bytes pass through") {
    val a = "first member ".getBytes("US-ASCII")
    val b = "second member".getBytes("US-ASCII")
    def gz(x: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(x); g.close(); bos.toByteArray
    }
    val multi = gz(a) ++ gz(b)
    assert(new String(Warc.gunzipIfNeeded(multi), "US-ASCII") === "first member second member")
    assert(Warc.gunzipIfNeeded(a).sameElements(a), "plain bytes untouched")
  }
}
