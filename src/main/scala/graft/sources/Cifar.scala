package graft.sources

import java.io.DataInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CIFAR-10 binary-version file source — the reference's SECOND pipeline's
  * distribution format: `cifar-10-binary.tar.gz` unpacks to
  * `data_batch_{1..5}.bin` + `test_batch.bin`, each 10,000 records of
  * exactly 3073 bytes — 1 label byte (0–9) then 3072 pixel bytes (1024 R,
  * 1024 G, 1024 B, each a row-major 32×32 plane). The reference ingests
  * CIFAR-10 through torchvision
  * (`CIFAR_10_Vector_Search_HSNW.ipynb:612`, cell-3) before embedding;
  * this reader reproduces the ingestion natively on Spark so a user can
  * replay that flow from the public distribution files without Python:
  * `binaryFile` rows (one per .bin file, decoded where the bytes land)
  * flatten to (id, vector[3072], label) — `Hnsw.build` input with the
  * label already joined (SURVEY.md D3).
  *
  * Unlike IDX there is no header: the record count is `bytes/3073`,
  * validated to divide exactly. Gzip per file is detected by magic and
  * inflated in-stream (the tarball itself must be unpacked — a tar is an
  * archive, not a record stream). Ids follow the [[Idx]] scheme:
  * `idOffset + fileIndex·idStride + row`, fileIndex = rank in the
  * path-sorted matched list, so multi-file loads get unique, per-file
  * contiguous ids and the 5 train shards stay in distribution order.
  *
  * Scale: one ~30 MB file per task, embarrassingly parallel across files;
  * a 100 TB corpus in this shape is just more files. Vectors are
  * float32, optionally /255-normalized like the reference's ToTensor.
  */
object Cifar {

  private val RecordBytes = 3073
  private val PixelBytes = 3072

  /** Decode CIFAR-10 binary batch files (or .gz) under `path` to
    * (id: long, vector: array&lt;float&gt;[3072], label: int) rows.
    */
  def read(spark: SparkSession, path: String, normalize: Boolean = true,
           idOffset: Long = 0L, idStride: Long = Idx.DefaultIdStride): DataFrame = {
    import spark.implicits._
    val paths = listFiles(spark, path)
    val bases = paths.zipWithIndex
      .map { case (p, i) => p -> (idOffset + i.toLong * idStride) }.toMap
    spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { files =>
        files.flatMap { case (p, bytes) =>
          val base = bases.getOrElse(p, throw new IllegalStateException(
            s"CIFAR decode saw unlisted file $p — the input set changed mid-read"))
          val in = Inflate.stream(bytes)
          decodeRecords(p, in, base, normalize, idStride)
        }
      }
      .toDF("id", "vector", "label")
  }

  private def decodeRecords(p: String, in: DataInputStream, base: Long,
                            normalize: Boolean, idStride: Long): Iterator[(Long, Array[Float], Int)] = {
    // record count: trust the stream, validate as we go — a gzipped file's
    // decoded length is only known by reading it
    new Iterator[(Long, Array[Float], Int)] {
      private var i = 0L
      private var nextLabel: Int = in.read()
      override def hasNext: Boolean = nextLabel >= 0
      override def next(): (Long, Array[Float], Int) = {
        require(i < idStride,
          s"CIFAR file $p holds >= idStride $idStride rows: ids would collide")
        require(nextLabel <= 9, s"CIFAR file $p: label byte $nextLabel > 9 at record $i — " +
          s"not a cifar-10-binary stream (records are $RecordBytes bytes: label + 32x32x3)")
        val buf = new Array[Byte](PixelBytes)
        try in.readFully(buf) catch {
          case _: java.io.EOFException => throw new IllegalArgumentException(
            s"CIFAR file $p truncated mid-record at record $i: " +
              s"length is not a multiple of $RecordBytes")
        }
        val v = new Array[Float](PixelBytes)
        var j = 0
        while (j < PixelBytes) {
          val u = buf(j) & 0xff
          v(j) = if (normalize) u / 255.0f else u.toFloat
          j += 1
        }
        val out = (base + i, v, nextLabel)
        i += 1
        nextLabel = in.read()
        out
      }
    }
  }

  private def listFiles(spark: SparkSession, path: String): Array[String] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path").as[String].collect().sorted
  }

  /** Synthetic cifar-10-binary file bodies with closed-form bytes, one
    * file per input id (q70's fixture): `2 + id % 3` records; record r
    * has label `(id + r) % 10` and pixel j `(id*31 + r*17 + 3j²) % 256`
    * (quadratic so the byte sums vary per record — a linear stride walks
    * every residue mod 256 and sums to a constant, which would let a
    * misaligned decode pass). Even ids gzip the body — [[decodeStats]]
    * must produce identical rows either way, which proves the
    * magic-detect inflate path alongside the record decoder. Input: a
    * DataFrame with a long `id` column.
    */
  def syntheticBatches(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("id").cast("long")).as[Long].map { id =>
      val recs = (2 + id % 3).toInt
      val bytes = new Array[Byte](recs * RecordBytes)
      var r = 0
      while (r < recs) {
        val off = r * RecordBytes
        bytes(off) = ((id + r) % 10).toByte
        var j = 0L
        while (j < PixelBytes) {
          bytes(off + 1 + j.toInt) = ((id * 31 + r * 17 + 3 * j * j) % 256).toByte
          j += 1
        }
        r += 1
      }
      (id, if (id % 2 == 0) gzipBytes(bytes) else bytes)
    }.toDF("id", "content")
  }

  /** Decode `(id, content)` cifar-10-binary file bodies (raw or gzip) to
    * one row per record — the oracle-checkable face of the decode path:
    * the record's label, the exact sum of its 3072 raw pixel bytes, and a
    * position-weighted checksum `Σ (j % 101)·pixel_j` (catches byte
    * permutations the plain sum would miss). Runs the same
    * [[decodeRecords]] iterator `read` uses, so a green oracle row
    * certifies the production decoder, not a test twin.
    */
  def decodeStats(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("id").cast("long"), col("content")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decodeRecords(s"synthetic:$id", Inflate.stream(bytes), 0L,
          normalize = false, Idx.DefaultIdStride)
          .map { case (rec, v, label) =>
            var s = 0L
            var w = 0L
            var j = 0
            while (j < v.length) {
              val px = v(j).toLong
              s += px
              w += (j % 101) * px
              j += 1
            }
            (id, rec, label, s, w)
          }
      }.toDF("id", "rec", "label", "px_sum", "px_wsum")
  }

  private def gzipBytes(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }
}
