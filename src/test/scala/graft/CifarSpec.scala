package graft

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.hnsw.{Hnsw, HnswParams}
import graft.sources.{Cifar, Idx}

/** CIFAR-10 binary source reader — synthetic fixtures in the exact
  * cifar-10-binary distribution layout (3073-byte records: 1 label byte +
  * 1024 R + 1024 G + 1024 B), plain and gzipped, driven end-to-end
  * bytes → index → labeled kNN like the reference's CIFAR pipeline
  * (CIFAR_10_Vector_Search_HSNW.ipynb cell-3).
  */
class CifarSpec extends SparkSpec {

  /** One record: label byte then 3072 deterministic pixel bytes. */
  private def record(label: Int, seed: Int): (Int, Array[Int]) =
    (label, Array.tabulate(3072)(j => (seed * 31 + j * 7) % 256))

  private def writeBin(path: String, records: Seq[(Int, Array[Int])], gzip: Boolean): Unit = {
    val fos = new FileOutputStream(path)
    val out = new DataOutputStream(if (gzip) new GZIPOutputStream(fos) else fos)
    records.foreach { case (label, pix) => out.write(label); pix.foreach(out.write) }
    out.close()
  }

  test("cifar records decode to (id, vector[3072], label), /255-normalized, ids by position") {
    val dir = Files.createTempDirectory("cifar").toString
    val recs = Seq(record(3, 1), record(7, 2), record(0, 3))
    writeBin(s"$dir/data_batch_1.bin", recs, gzip = false)
    val got = Cifar.read(spark, s"$dir/data_batch_1.bin")
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Float](1).toArray, r.getInt(2)))).toMap
    assert(got.keySet === Set(0L, 1L, 2L))
    recs.zipWithIndex.foreach { case ((label, pix), i) =>
      assert(got(i.toLong)._2 === label)
      assert(got(i.toLong)._1.toSeq === pix.map(_ / 255.0f).toSeq)
    }
    // raw mode keeps ubyte values
    val raw = Cifar.read(spark, s"$dir/data_batch_1.bin", normalize = false)
      .filter(col("id") === 1L).head().getSeq[Float](1)
    assert(raw.toSeq === recs(1)._2.map(_.toFloat).toSeq)
  }

  test("multi-file directory load: per-file id bases in path order; gzip inflates transparently") {
    val dir = Files.createTempDirectory("cifarm").toString
    writeBin(s"$dir/data_batch_1.bin", Seq(record(1, 1), record(2, 2)), gzip = false)
    writeBin(s"$dir/data_batch_2.bin.gz", Seq(record(3, 3)), gzip = true)
    val got = Cifar.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got === Map(0L -> 1, 1L -> 2, Idx.DefaultIdStride -> 3),
      "each file must get its own id base; gz must inflate")
  }

  test("corrupt inputs fail loudly: truncated record; non-cifar label byte") {
    val dir = Files.createTempDirectory("cifarbad").toString
    val fos = new DataOutputStream(new FileOutputStream(s"$dir/data_batch_1.bin"))
    fos.write(5); (0 until 100).foreach(fos.write) // 101 bytes: truncated mid-record
    fos.close()
    val err = intercept[org.apache.spark.SparkException] {
      Cifar.read(spark, s"$dir/data_batch_1.bin").collect()
    }
    assert((err.getMessage + Option(err.getCause).map(_.getMessage).getOrElse(""))
      .contains("truncated"))
    val dir2 = Files.createTempDirectory("cifarbad2").toString
    // first byte 200: not a 0-9 label — reject instead of decoding garbage
    writeBin(s"$dir2/data_batch_1.bin", Seq((200, Array.fill(3072)(0))), gzip = false)
    val err2 = intercept[org.apache.spark.SparkException] {
      Cifar.read(spark, s"$dir2/data_batch_1.bin").collect()
    }
    assert((err2.getMessage + Option(err2.getCause).map(_.getMessage).getOrElse(""))
      .contains("label byte"))
  }

  test("q70 fixtures: decodeStats recovers the closed form; gzip and raw files agree") {
    import spark.implicits._
    // id 4 is even → gzipped body; id 7 odd → raw; both 3 records
    val stats = Cifar.decodeStats(Cifar.syntheticBatches(Seq(4L, 7L).toDF("id")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    assert(stats.size === 6)
    for (id <- Seq(4L, 7L); rec <- 0L until (2 + id % 3)) {
      val expLabel = ((id + rec) % 10).toInt
      val pix = (0 until 3072).map(j => (id * 31 + rec * 17 + 3L * j * j) % 256)
      val expSum = pix.sum
      val expWsum = pix.zipWithIndex.map { case (p, j) => (j % 101) * p }.sum
      assert(stats((id, rec)) === ((expLabel, expSum, expWsum)),
        s"closed-form mismatch at id=$id rec=$rec")
    }
  }

  test("e2e: bytes -> index -> labeled kNN, replaying the reference's CIFAR flow") {
    val dir = Files.createTempDirectory("cifare2e").toString
    // 40 records in 4 label groups; pixels cluster by label so kNN of a
    // group member stays in-group
    val recs = (0 until 40).map { i =>
      val label = i % 4
      (label, Array.tabulate(3072)(j => (label * 60 + (j % 16) + (i / 4)) % 256))
    }
    writeBin(s"$dir/data_batch_1.bin", recs, gzip = false)
    val cifar = Cifar.read(spark, s"$dir/data_batch_1.bin").cache()
    val params = HnswParams(dim = 3072, m = 8, efConstruction = 64, numPartitions = 2)
    val index = Hnsw.build(cifar.select("id", "vector"), params)
    val queries = cifar.filter(col("id") === 0L).select(col("id").as("qid"), col("vector"))
    val ann = Hnsw.annQuery(index, queries, k = 5)
    // label join — the reference's ranked report with CIFAR class names
    val labeled = ann.join(cifar.select(col("id"), col("label")), "id")
      .orderBy("rank").collect()
    assert(labeled.length === 5)
    assert(labeled.head.getAs[Long]("id") === 0L, "self-match at rank 1")
    assert(labeled.forall(_.getAs[Int]("label") === 0),
      "nearest neighbors of a label-0 vector must stay label-0 in this clustered fixture")
    cifar.unpersist()
  }
}
