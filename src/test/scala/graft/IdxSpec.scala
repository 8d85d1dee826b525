package graft

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import graft.sources.Idx

/** IDX (ubyte) source reader — synthetic fixtures in the exact MNIST
  * distribution layout, plain and gzipped. */
class IdxSpec extends SparkSpec {

  private def writeIdx3(path: String, images: Seq[Array[Int]], rows: Int, cols: Int,
                        gzip: Boolean): Unit = {
    val fos = new FileOutputStream(path)
    val out = new DataOutputStream(if (gzip) new GZIPOutputStream(fos) else fos)
    out.writeInt(0x00000803) // ubyte, 3 dims
    out.writeInt(images.size); out.writeInt(rows); out.writeInt(cols)
    images.foreach(_.foreach(out.write))
    out.close()
  }

  private def writeIdx1(path: String, labels: Seq[Int], gzip: Boolean): Unit = {
    val fos = new FileOutputStream(path)
    val out = new DataOutputStream(if (gzip) new GZIPOutputStream(fos) else fos)
    out.writeInt(0x00000801) // ubyte, 1 dim
    out.writeInt(labels.size)
    labels.foreach(out.write)
    out.close()
  }

  private val imgs = Seq(
    Array(0, 128, 255, 64),  // image 0, 2x2 row-major
    Array(255, 0, 1, 254),   // image 1
  )

  test("idx3 images decode flattened row-major, /255-normalized, ids by position") {
    val dir = Files.createTempDirectory("idx").toString
    writeIdx3(s"$dir/imgs-idx3-ubyte", imgs, rows = 2, cols = 2, gzip = false)
    val got = Idx.readImages(spark, s"$dir/imgs-idx3-ubyte")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(got.keySet === Set(0L, 1L))
    assert(got(0L).toSeq === imgs(0).map(_ / 255.0f).toSeq)
    assert(got(1L).toSeq === imgs(1).map(_ / 255.0f).toSeq)
    // raw mode keeps ubyte values
    val raw = Idx.readImages(spark, s"$dir/imgs-idx3-ubyte", normalize = false)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(raw(1L).toSeq === imgs(1).map(_.toFloat).toSeq)
  }

  test("directory load of many idx shards: per-file id bases, no collisions, labels stay aligned") {
    val imgDir = Files.createTempDirectory("idxm-img").toString
    val labDir = Files.createTempDirectory("idxm-lab").toString
    // two shard files per side; path-sorted order pairs shard-a with shard-a
    writeIdx3(s"$imgDir/shard-a-images-idx3-ubyte", imgs, rows = 2, cols = 2, gzip = false)
    writeIdx3(s"$imgDir/shard-b-images-idx3-ubyte", imgs.reverse, rows = 2, cols = 2, gzip = false)
    writeIdx1(s"$labDir/shard-a-labels-idx1-ubyte", Seq(1, 2), gzip = false)
    writeIdx1(s"$labDir/shard-b-labels-idx1-ubyte", Seq(3, 4), gzip = false)
    val vecs = Idx.readImages(spark, imgDir)
    val ids = vecs.select("id").collect().map(_.getLong(0)).toSet
    // shard-a gets base 0, shard-b gets base idStride — globally unique
    assert(ids === Set(0L, 1L, Idx.DefaultIdStride, Idx.DefaultIdStride + 1),
      "each file must get its own id base (no silent collisions)")
    val labels = Idx.readLabels(spark, labDir)
    val joined = vecs.join(labels, "id").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("label")).toMap
    assert(joined.size === 4, "every image row must find its label")
    assert(joined(0L) === 1 && joined(Idx.DefaultIdStride) === 3)
    // a stride smaller than a file's row count is rejected loudly
    val err = intercept[org.apache.spark.SparkException] {
      Idx.readImages(spark, imgDir, idStride = 1L).collect()
    }
    assert(err.getMessage.contains("ids would collide") ||
      Option(err.getCause).exists(_.getMessage.contains("ids would collide")))
  }

  test("gzipped idx files inflate transparently; labels align with images by id") {
    val dir = Files.createTempDirectory("idxgz").toString
    writeIdx3(s"$dir/imgs-idx3-ubyte.gz", imgs, rows = 2, cols = 2, gzip = true)
    writeIdx1(s"$dir/labels-idx1-ubyte.gz", Seq(9, 3), gzip = true)
    val vecs = Idx.readImages(spark, s"$dir/imgs-idx3-ubyte.gz")
    val labels = Idx.readLabels(spark, s"$dir/labels-idx1-ubyte.gz")
    val joined = vecs.join(labels, "id").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("label")).toMap
    assert(joined === Map(0L -> 9, 1L -> 3))
  }

  test("IDX -> HNSW end-to-end: the reference's Fashion-MNIST flow on the native reader") {
    import graft.hnsw.{Hnsw, HnswParams}
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("idxe2e").toString
    // 60 deterministic 3x3 "images" in two visually distinct families
    val many = (0 until 60).map { i =>
      val base = if (i % 2 == 0) 10 else 200
      Array.tabulate(9)(j => (base + (i * 7 + j * 3) % 40) min 255)
    }
    writeIdx3(s"$dir/train-images-idx3-ubyte.gz", many, rows = 3, cols = 3, gzip = true)
    writeIdx1(s"$dir/train-labels-idx1-ubyte.gz", (0 until 60).map(_ % 2), gzip = true)
    val vecs = Idx.readImages(spark, s"$dir/train-images-idx3-ubyte.gz")
    val labels = Idx.readLabels(spark, s"$dir/train-labels-idx1-ubyte.gz")
    val index = Hnsw.build(vecs, HnswParams(dim = 9, m = 8, efConstruction = 64, numPartitions = 2))
    val queries = vecs.filter(col("id") === 0L).selectExpr("id AS qid", "vector")
    val ann = Hnsw.annQuery(index, queries, k = 5)
    val withLabels = ann.join(labels, "id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("rank"), r.getAs[Int]("label")))
    assert(withLabels.find(_._2 == 1).get._1 === 0L, "self-match at rank 1")
    // neighbors of an even-family image should be even-family (label 0)
    assert(withLabels.count(_._3 == 0) >= 4, s"family purity too low: ${withLabels.toSeq}")
  }

  test("malformed magic / wrong dims / wrong dtype are rejected loudly") {
    val dir = Files.createTempDirectory("idxbad").toString
    writeIdx1(s"$dir/labels-idx1-ubyte", Seq(1, 2), gzip = false)
    // a 1-dim label file read as a 3-dim image file must fail, not misparse
    val ex = intercept[org.apache.spark.SparkException] {
      Idx.readImages(spark, s"$dir/labels-idx1-ubyte").collect()
    }
    assert(ex.getMessage.contains("expected 3-dim") || ex.getCause != null)
  }
}
