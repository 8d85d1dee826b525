package graft

import org.apache.spark.sql.functions._

import graft.functions.Distances
import graft.hnsw.Hnsw
import graft.operators.{Ivf, Knn}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("kmeans-trained centroids beat naive lowest-id centroids on IVF recall") {
    val rng = new scala.util.Random(31)
    // 8 well-separated blobs, ids grouped by blob — so the 8 LOWEST ids all
    // sit in blob 0 and naive init gives a degenerate centroid set
    val data = (0L until 200L).map { i =>
      val blob = (i / 25).toInt
      val center = Array.tabulate(8)(d => if (d == blob % 8) 20f else 0f)
      (i, center.map(_ + rng.nextGaussian().toFloat))
    }
    val df = data.toDF("id", "vector")
    val queries = df.filter(col("id") % 10 === 3).select(col("id").as("qid"), col("vector"))
    val exact = Knn.exactTopK(df, queries, 5, Distances.l2)

    def recallWith(centroids: org.apache.spark.sql.DataFrame): Double = {
      val assigned = Ivf.assign(df.select("id", "vector"), centroids, Distances.l2)
        .join(df, "id")
      val ann = Ivf.search(assigned, queries, centroids, k = 5, nprobe = 2, Distances.l2)
      Hnsw.recallAtK(ann, exact, 5).agg(avg("recall")).head().getDouble(0)
    }

    val naive = df.filter(col("id") < 8)
      .select(col("id").as("cid"), col("vector").as("cvector"))
    val trained = Ivf.kmeansFit(df, k = 8, iters = 4)

    val rNaive = recallWith(naive)
    val rTrained = recallWith(trained)
    assert(rTrained >= 0.95, s"trained recall $rTrained")
    assert(rTrained > rNaive, s"trained $rTrained should beat naive $rNaive")
  }

  test("searchLarge matches search exactly when both probe every cell") {
    val rng = new scala.util.Random(17)
    val data = (0L until 120L).map(i => (i, Array.fill(6)(rng.nextGaussian().toFloat)))
    val df = data.toDF("id", "vector")
    val centroids = Ivf.kmeansFit(df, k = 4, iters = 2)
    val assigned = Ivf.assign(df.select("id", "vector"), centroids, Distances.l2).join(df, "id")
    val queries = df.filter(col("id") % 7 === 0).select(col("id").as("qid"), col("vector"))
    // nprobe = k_cells → both variants scan every cell → identical results
    val small = Ivf.search(assigned, queries, centroids, k = 5, nprobe = 4, Distances.l2)
      .collect().map(_.toSeq).toSet
    val large = Ivf.searchLarge(assigned, queries, centroids, k = 5, nprobe = 4, Distances.l2)
      .collect().map(_.toSeq).toSet
    assert(small === large)
    assert(small.nonEmpty)
  }

  test("kmeansExact: recovers separated blobs, partition-independent, zero iters = seed assignment") {
    val rng = new scala.util.Random(47)
    // 4 well-separated blobs of 25 points each in dim 8; ids interleaved
    // across blobs so the 4 lowest ids land in 4 DIFFERENT blobs (seeding
    // each blob) and two Lloyd rounds must pull every point home
    val pts = (0 until 100).map { i =>
      val blob = i % 4
      val center = Array.tabulate(8)(d => if (d == blob * 2) 3.0f else 0.0f)
      (i.toLong, center.map(c => c + (rng.nextFloat() - 0.5f) * 0.2f))
    }
    val df = pts.toDF("id", "vector")
    val out = Ivf.kmeansExact(df, k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size === 100)
    // every member of a blob shares its blob-mate's cluster, and the four
    // blobs get four distinct clusters
    val byBlob = (0 until 4).map(b => (0 until 100).filter(_ % 4 == b).map(i => out(i.toLong)._1).distinct)
    byBlob.foreach(cids => assert(cids.size === 1, s"blob split across clusters: $byBlob"))
    assert(byBlob.flatten.distinct.size === 4)
    // ids 0..3 seeded cid 0..3 in id order
    assert((0 until 4).map(i => out(i.toLong)._1) === (0L until 4L))
    // bit-identical under a different partition layout (the oracle-exact claim)
    val again = Ivf.kmeansExact(df.repartition(7), k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again === out)
    // iters = 0: assignment against the raw seeds; each seed at distance 0
    val seeds = Ivf.kmeansExact(df, k = 4, iters = 0)
      .filter(col("id") < 4).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    seeds.foreach { case (id, cid, dist) => assert(cid === id && dist === 0L) }
  }
}
