package graft.sources

import java.io.{ByteArrayInputStream, DataInputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IDX (ubyte) file source — the reference pipeline's ACTUAL input format:
  * Fashion-MNIST ships as `train-images-idx3-ubyte.gz` /
  * `train-labels-idx1-ubyte.gz` (FashionMNIST notebook cell-2 downloads
  * them; the loader flattens 28×28 to dim-784 float vectors). This reader
  * reproduces that ingestion natively on Spark: `binaryFile` rows (one per
  * file, automatically split across executors per-file) decode in a
  * `mapPartitions`-shaped projection to (id, vector) / (id, label).
  *
  * Format (public IDX spec, as in the MNIST distribution): big-endian
  * magic `00 00 dtype ndims`, then ndims × int32 dimension sizes, then raw
  * ubyte payload. Gzip detected by its 1f 8b magic and inflated in-stream.
  *
  * Scale notes: IDX is a single-blob format — each FILE is the unit of
  * parallelism (a 60k-image file is one ~47 MB task; a 100 TB corpus
  * arrives as many files, e.g. one per shard, and decodes
  * embarrassingly parallel). Ids are `idOffset + fileIndex * idStride +
  * row index within file`, where fileIndex is the file's rank in the
  * path-sorted list of matched files — so a glob/directory load of many
  * shards yields globally unique ids in one call (no silent collisions),
  * and image and label shard sets that sort consistently (the MNIST
  * `…-images-…`/`…-labels-…` naming does) get ALIGNED ids file-by-file.
  * Each file must hold fewer than `idStride` rows (asserted per file).
  */
/** Gzip-or-raw byte stream: gzip detected by its 1f 8b magic, shared by
  * the binary file sources ([[Idx]], [[Cifar]]).
  */
private[sources] object Inflate {
  def stream(bytes: Array[Byte]): DataInputStream = {
    val raw = new ByteArrayInputStream(bytes)
    val in =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        new GZIPInputStream(raw)
      else raw
    new DataInputStream(in)
  }
}

object Idx {

  /** Default per-file id space: 2^32 rows per shard file. */
  val DefaultIdStride: Long = 1L << 32

  /** One path-sorted listing of the matched files. `binaryFile` prunes to
    * file-status columns when only `path` is selected, so this listing pass
    * reads no file content. Driver-side, but O(#files) — the file listing
    * itself is already driver-held. The DECODE pass is driven off this
    * same concrete list (`load(paths: _*)`), never a second independent
    * listing — a file appearing or vanishing between two listings would
    * otherwise shift every later file's id base (breaking image/label
    * alignment) or throw an unkeyed NoSuchElementException.
    */
  private def listFiles(spark: SparkSession, path: String): Array[String] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path").as[String].collect().sorted
  }

  private def basesFor(paths: Array[String], idOffset: Long, idStride: Long): Map[String, Long] =
    paths.zipWithIndex.map { case (p, i) => p -> (idOffset + i.toLong * idStride) }.toMap

  private def baseOf(bases: Map[String, Long], p: String): Long =
    bases.getOrElse(p, throw new IllegalStateException(
      s"IDX decode saw unlisted file $p — the input set changed mid-read"))

  private def inflate(bytes: Array[Byte]): DataInputStream = Inflate.stream(bytes)

  private def readHeader(in: DataInputStream, expectDims: Int): Array[Int] = {
    val magic = in.readInt()
    val dtype = (magic >> 8) & 0xff
    val ndims = magic & 0xff
    require((magic >>> 16) == 0, f"bad IDX magic 0x$magic%08x")
    require(dtype == 0x08, f"only ubyte IDX supported, dtype 0x$dtype%02x")
    require(ndims == expectDims, s"expected $expectDims-dim IDX, got $ndims")
    Array.fill(ndims)(in.readInt())
  }

  /** Decode an idx3-ubyte image file (or .gz) to (id: long, vector:
    * array&lt;float&gt;) rows — flattened row-major, optionally scaled to
    * [0,1] by /255 like the reference's transform. Output feeds
    * [[graft.hnsw.Hnsw.build]] directly.
    */
  def readImages(spark: SparkSession, path: String, normalize: Boolean = true,
                 idOffset: Long = 0L, idStride: Long = DefaultIdStride): DataFrame = {
    import spark.implicits._
    val paths = listFiles(spark, path)
    val bases = basesFor(paths, idOffset, idStride)
    spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { files =>
        files.flatMap { case (p, bytes) =>
          val base = baseOf(bases, p)
          val in = inflate(bytes)
          val dims = readHeader(in, 3)
          val (n, rows, cols) = (dims(0), dims(1), dims(2))
          require(n < idStride, s"IDX file $p holds $n rows >= idStride $idStride: ids would collide")
          val pix = rows * cols
          Iterator.tabulate(n) { i =>
            val buf = new Array[Byte](pix)
            in.readFully(buf)
            val v = new Array[Float](pix)
            var j = 0
            while (j < pix) {
              val u = buf(j) & 0xff
              v(j) = if (normalize) u / 255.0f else u.toFloat
              j += 1
            }
            (base + i, v)
          }
        }
      }
      .toDF("id", "vector")
  }

  /** Decode an idx1-ubyte label file (or .gz) to (id: long, label: int). */
  def readLabels(spark: SparkSession, path: String, idOffset: Long = 0L,
                 idStride: Long = DefaultIdStride): DataFrame = {
    import spark.implicits._
    val paths = listFiles(spark, path)
    val bases = basesFor(paths, idOffset, idStride)
    spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { files =>
        files.flatMap { case (p, bytes) =>
          val base = baseOf(bases, p)
          val in = inflate(bytes)
          val n = readHeader(in, 1)(0)
          require(n < idStride, s"IDX file $p holds $n rows >= idStride $idStride: ids would collide")
          Iterator.tabulate(n) { i => (base + i, in.readUnsignedByte()) }
        }
      }
      .toDF("id", "label")
  }
}
