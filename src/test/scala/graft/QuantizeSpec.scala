package graft

import graft.functions.Distances
import graft.operators.{Ivf, Quantize}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("scalar quantize: extremes hit 0/255, midpoint lands mid-range, roundtrip error bounded") {
    val embs = Seq(
      (0L, Array(0.0f, 10f)),
      (1L, Array(1.0f, 20f)),
      (2L, Array(0.5f, 15f)),
    ).toDF("id", "vector")
    val codes = Quantize.scalarQuantize(embs, "id", "vector", bits = 8)
    val m = codes.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(m((0L, 0)) === 0L && m((0L, 1)) === 0L)
    assert(m((1L, 0)) === 255L && m((1L, 1)) === 255L)
    assert(m((2L, 0)) >= 126L && m((2L, 0)) <= 128L)

    val ranges = Quantize.dimensionRanges(embs, "id", "vector")
    val rec = Quantize.dequantize(codes, ranges, "id", bits = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(math.abs(rec(2L)(0) - 0.5) <= 1.0 / 255 + 1e-9)
    assert(math.abs(rec(2L)(1) - 15.0) <= 10.0 / 255 + 1e-9)
    assert(rec.keySet === Set(0L, 1L, 2L))
    // extremes stay inside [lo, hi] (top code clamps, never overshoots)
    assert(rec(1L)(0) <= 1.0 && rec(1L)(1) <= 20.0)
    assert(rec(0L)(0) >= 0.0 && rec(0L)(1) >= 10.0)
  }

  test("product quantization: codes are m cells; reconstruction error well under blob spacing") {
    import graft.operators.Pq
    val rng = new scala.util.Random(9)
    // 2 blobs per sub-block space → 4 distinct (code0, code1) combos
    def point(hi0: Boolean, hi1: Boolean): Array[Float] = {
      val b0 = Array.fill(4)((if (hi0) 10f else 0f) + rng.nextGaussian().toFloat * 0.1f)
      val b1 = Array.fill(4)((if (hi1) 10f else 0f) + rng.nextGaussian().toFloat * 0.1f)
      b0 ++ b1
    }
    val data = (0L until 80L).map(i => (i, point(i % 2 == 0, (i / 2) % 2 == 0)))
    val df = data.toDF("id", "vector")

    val codebooks = Pq.pqFit(df, dim = 8, m = 2, k = 2, iters = 3)
    assert(codebooks.count() === 4) // 2 sub-blocks x 2 cells

    val codes = Pq.pqEncode(df, codebooks, dim = 8, m = 2)
    val codeMap = codes.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codeMap.values.forall(_.length === 2))
    // same blob combo -> same codes; different combo -> different codes
    assert(codeMap(0L) === codeMap(4L)) // both (hi0=true, hi1=true)
    assert(codeMap(0L) !== codeMap(1L))

    val rec = Pq.pqDecode(codes, codebooks, m = 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    data.foreach { case (id, v) =>
      val err = math.sqrt(v.zip(rec(id)).map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(err < 2.0, s"id=$id reconstruction err $err") // blob spacing is 10
    }
  }

  test("ADC top-k over PQ codes retrieves the query's own blob without reading vectors") {
    import graft.operators.Pq
    val rng = new scala.util.Random(21)
    def point(hi0: Boolean, hi1: Boolean): Array[Float] = {
      val b0 = Array.fill(4)((if (hi0) 10f else 0f) + rng.nextGaussian().toFloat * 0.1f)
      val b1 = Array.fill(4)((if (hi1) 10f else 0f) + rng.nextGaussian().toFloat * 0.1f)
      b0 ++ b1
    }
    val data = (0L until 80L).map(i => (i, point(i % 2 == 0, (i / 2) % 2 == 0)))
    val df = data.toDF("id", "vector")
    val codebooks = Pq.pqFit(df, dim = 8, m = 2, k = 2, iters = 3)
    val codes = Pq.pqEncode(df, codebooks, dim = 8, m = 2)

    // query = vector of id 0; its blob combo has 20 members
    val queries = Seq((0L, data.head._2)).toDF("qid", "vector")
    val top = Pq.adcTopK(codes, codebooks, queries, dim = 8, m = 2, k = 5).collect()
    assert(top.length === 5)
    assert(top.forall(_.getAs[Double]("dist") < 1.0)) // same-combo cells: near-zero ADC dist
    val sameCombo = data.filter { case (i, _) => i % 2 == 0 && (i / 2) % 2 == 0 }.map(_._1).toSet
    assert(top.map(_.getAs[Long]("id")).forall(sameCombo.contains))
  }

  test("IVF-PQ: coarse probe + ADC retrieves the query's blob reading only cells and codes") {
    import graft.operators.Pq
    val rng = new scala.util.Random(27)
    def point(hi0: Boolean, hi1: Boolean): Array[Float] = {
      val b0 = Array.fill(4)((if (hi0) 10f else 0f) + rng.nextGaussian().toFloat * 0.1f)
      val b1 = Array.fill(4)((if (hi1) 10f else 0f) + rng.nextGaussian().toFloat * 0.1f)
      b0 ++ b1
    }
    val data = (0L until 80L).map(i => (i, point(i % 2 == 0, (i / 2) % 2 == 0)))
    val df = data.toDF("id", "vector")
    val centroids = Ivf.kmeansFit(df, k = 4, iters = 3)
    val codebooks = Pq.pqFit(df, dim = 8, m = 2, k = 2, iters = 3)
    val assignedCodes = Ivf.assign(df, centroids, Distances.l2).select("id", "cid")
      .join(Pq.pqEncode(df, codebooks, dim = 8, m = 2), "id")

    val queries = Seq((0L, data.head._2)).toDF("qid", "vector")
    val top = Pq.ivfPqTopK(assignedCodes, codebooks, centroids, queries,
      dim = 8, m = 2, k = 5, nprobe = 1).collect()
    assert(top.length === 5)
    val sameCombo = data.filter { case (i, _) => i % 2 == 0 && (i / 2) % 2 == 0 }.map(_._1).toSet
    assert(top.map(_.getAs[Long]("id")).forall(sameCombo.contains))
    assert(top.forall(_.getAs[Double]("dist") < 1.0))

    // exact-rescore refinement recovers the true self-match at dist 0
    // (ADC alone cannot: code distances never hit exactly zero)
    val refined = Pq.ivfPqTopKRefined(assignedCodes, codebooks, centroids, queries, df,
      dim = 8, m = 2, k = 5, nprobe = 1, refine = 10).collect()
    assert(refined.head.getAs[Long]("id") === 0L)
    assert(refined.head.getAs[Double]("dist") === 0.0)
  }

  test("ivfPqTopKLarge (shuffled LUT) is bit-equal to the broadcast-LUT path") {
    import graft.operators.Pq
    val rng = new scala.util.Random(33)
    def point(hi0: Boolean, hi1: Boolean): Array[Float] = {
      val b0 = Array.fill(4)((if (hi0) 10f else 0f) + rng.nextGaussian().toFloat * 0.1f)
      val b1 = Array.fill(4)((if (hi1) 10f else 0f) + rng.nextGaussian().toFloat * 0.1f)
      b0 ++ b1
    }
    val data = (0L until 80L).map(i => (i, point(i % 2 == 0, (i / 2) % 2 == 0)))
    val df = data.toDF("id", "vector")
    val centroids = Ivf.kmeansFit(df, k = 4, iters = 2)
    val codebooks = Pq.pqFit(df, dim = 8, m = 2, k = 2, iters = 2)
    val assignedCodes = Ivf.assign(df, centroids, Distances.l2).select("id", "cid")
      .join(Pq.pqEncode(df, codebooks, dim = 8, m = 2), "id")
    // a query-side as big as the index side — the kNN-join shape
    val queries = data.map { case (i, v) => (i, v) }.toDF("qid", "vector")
    val small = Pq.ivfPqTopK(assignedCodes, codebooks, centroids, queries,
      dim = 8, m = 2, k = 3, nprobe = 2).collect().map(_.toSeq).toSet
    val large = Pq.ivfPqTopKLarge(assignedCodes, codebooks, centroids, queries,
      dim = 8, m = 2, k = 3, nprobe = 2).collect().map(_.toSeq).toSet
    assert(large === small)
    assert(small.nonEmpty)
  }

  test("IVF-PQ save/load round-trip preserves search results exactly") {
    import graft.operators.Pq
    val rng = new scala.util.Random(41)
    val data = (0L until 60L).map(i => (i, Array.fill(8)(rng.nextGaussian().toFloat)))
    val df = data.toDF("id", "vector")
    val centroids = Ivf.kmeansFit(df, k = 4, iters = 2)
    val codebooks = Pq.pqFit(df, dim = 8, m = 2, k = 4, iters = 2)
    val assignedCodes = Ivf.assign(df, centroids, Distances.l2).select("id", "cid")
      .join(Pq.pqEncode(df, codebooks, dim = 8, m = 2), "id")
    val idx = Pq.IvfPqIndex(centroids, codebooks, assignedCodes, dim = 8, m = 2)

    val queries = Seq((0L, data.head._2), (1L, data(7)._2)).toDF("qid", "vector")
    val before = Pq.ivfPqTopK(idx.assignedCodes, idx.codebooks, idx.centroids, queries,
      idx.dim, idx.m, k = 5, nprobe = 2).collect().map(_.toSeq).toSet

    val tmp = java.nio.file.Files.createTempDirectory("ivfpq-io").toString
    Pq.saveIvfPq(idx, tmp)
    val loaded = Pq.loadIvfPq(spark, tmp)
    assert(loaded.dim === 8 && loaded.m === 2)
    val after = Pq.ivfPqTopK(loaded.assignedCodes, loaded.codebooks, loaded.centroids, queries,
      loaded.dim, loaded.m, k = 5, nprobe = 2).collect().map(_.toSeq).toSet
    assert(after === before)
    assert(before.nonEmpty)
  }

  test("kmeans separates two blobs and the trained assignment is clean") {
    val rng = new scala.util.Random(5)
    val blobA = (0L until 50L).map(i => (i, Array.fill(4)(rng.nextGaussian().toFloat * 0.1f)))
    val blobB = (50L until 100L).map(i => (i, Array.fill(4)(10f + rng.nextGaussian().toFloat * 0.1f)))
    val df = (blobA ++ blobB).toDF("id", "vector")

    val centroids = Ivf.kmeansFit(df, k = 2, iters = 3)
    assert(centroids.count() === 2)

    val assigned = Ivf.assign(df, centroids, Distances.l2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aCells = (0L until 50L).map(assigned).toSet
    val bCells = (50L until 100L).map(assigned).toSet
    assert(aCells.size === 1, s"blob A split across cells $aCells")
    assert(bCells.size === 1, s"blob B split across cells $bCells")
    assert(aCells !== bCells)
  }
}
