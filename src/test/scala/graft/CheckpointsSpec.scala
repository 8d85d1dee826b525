package graft

import org.apache.spark.sql.functions._

import graft.operators.{Checkpoints, Dedup, Ivf}

/** The eager-checkpoint lifecycle (ADVICE r02): superseded iteration
  * checkpoints must actually release their executor blocks, and iterative
  * operators must not accumulate one pinned RDD per iteration.
  */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def persistentCount: Int = spark.sparkContext.getPersistentRDDs.size

  test("unpersist frees a localCheckpoint's blocks; non-checkpoint frames are a safe no-op") {
    val before = persistentCount
    val cp = (0L until 100L).toDF("id").localCheckpoint()
    assert(persistentCount === before + 1, "eager localCheckpoint should pin one RDD")
    Checkpoints.unpersist(cp)
    // unpersist(blocking = false) is async; poll briefly
    val deadline = System.nanoTime() + 10e9.toLong
    while (persistentCount > before && System.nanoTime() < deadline) Thread.sleep(50)
    assert(persistentCount === before, "blocks not released")
    // derived plan (not a direct checkpoint scan) → no-op, no crash
    Checkpoints.unpersist(cp.select(col("id") + 1))
  }

  test("dupClusters pins O(1) checkpoints, not one per iteration") {
    val before = persistentCount
    // 64-node chain → ~6 pointer-jumping iterations
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val all = (0L until 64L).toDF("doc_id")
    val comp = Dedup.dupClusters(all, chain, "doc_id")
    assert(comp.collect().map(_.getLong(1)).toSet === Set(0L))
    val deadline = System.nanoTime() + 10e9.toLong
    while (persistentCount > before + 2 && System.nanoTime() < deadline) Thread.sleep(50)
    // only the FINAL labels checkpoint may stay pinned (sym and superseded
    // iterations are freed)
    assert(persistentCount <= before + 2,
      s"checkpoints accumulated: $before -> $persistentCount")
  }

  test("kmeansFit pins no checkpoints beyond the returned centroids") {
    val before = persistentCount
    val vecs = (0L until 60L).map(i => (i, Array.fill(4)(((i % 3) * 10).toFloat)))
      .toDF("id", "vector")
    val centroids = Ivf.kmeansFit(vecs, k = 3, iters = 4)
    assert(centroids.count() === 3)
    val deadline = System.nanoTime() + 10e9.toLong
    while (persistentCount > before + 1 && System.nanoTime() < deadline) Thread.sleep(50)
    assert(persistentCount <= before + 1,
      s"per-iteration centroid checkpoints leaked: $before -> $persistentCount")
  }
}
