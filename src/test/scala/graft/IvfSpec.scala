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
}
