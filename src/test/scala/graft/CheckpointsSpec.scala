package graft

import org.apache.spark.sql.functions._

import graft.operators.{Checkpoints, Dedup, Ivf}

/** The eager-checkpoint lifecycle (ADVICE r02): superseded iteration
  * checkpoints must actually release their executor blocks, and iterative
  * operators must not accumulate one pinned RDD per iteration.
  *
  * Assertions track the SPECIFIC RDD ids each operation creates (diff of
  * `getPersistentRDDs` key sets, or [[Checkpoints.rddId]]) rather than
  * global persistent counts — a concurrently-running suite sharing the
  * context, or an unrelated operator that legitimately caches, must not
  * flip these tests (ADVICE r03).
  */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def persistentIds: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Poll until none of `ids` is still persistent (unpersist is async). */
  private def awaitReleased(ids: Set[Int]): Set[Int] = {
    val deadline = System.nanoTime() + 10e9.toLong
    var live = persistentIds intersect ids
    while (live.nonEmpty && System.nanoTime() < deadline) { Thread.sleep(50); live = persistentIds intersect ids }
    live
  }

  test("unpersist frees a localCheckpoint's blocks; non-checkpoint frames are a safe no-op") {
    val cp = (0L until 100L).toDF("id").localCheckpoint()
    val id = Checkpoints.rddId(cp)
    assert(id.nonEmpty, "a localCheckpointed frame should be a direct checkpoint scan")
    assert(persistentIds.contains(id.get), "eager localCheckpoint should pin its RDD")
    Checkpoints.unpersist(cp)
    assert(awaitReleased(Set(id.get)).isEmpty, s"blocks of RDD ${id.get} not released")
    // derived plan (not a direct checkpoint scan) → no-op, no crash, no id
    assert(Checkpoints.rddId(cp.select(col("id") + 1)).isEmpty)
    Checkpoints.unpersist(cp.select(col("id") + 1))
  }

  test("dupClusters pins O(1) checkpoints, not one per iteration") {
    val before = persistentIds
    // 64-node chain → ~6 pointer-jumping iterations
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val all = (0L until 64L).toDF("doc_id")
    val comp = Dedup.dupClusters(all, chain, "doc_id")
    assert(comp.collect().map(_.getLong(1)).toSet === Set(0L))
    val created = persistentIds -- before
    // only the FINAL labels checkpoint (plus at most the symmetrized edge
    // set) may stay pinned — superseded iterations are freed
    val survivors = {
      val deadline = System.nanoTime() + 10e9.toLong
      var live = persistentIds intersect created
      while (live.size > 2 && System.nanoTime() < deadline) { Thread.sleep(50); live = persistentIds intersect created }
      live
    }
    assert(survivors.size <= 2, s"checkpoints accumulated: created=$created survivors=$survivors")
  }

  test("kmeansFit pins no checkpoints beyond the returned centroids") {
    val before = persistentIds
    val vecs = (0L until 60L).map(i => (i, Array.fill(4)(((i % 3) * 10).toFloat)))
      .toDF("id", "vector")
    val centroids = Ivf.kmeansFit(vecs, k = 3, iters = 4)
    assert(centroids.count() === 3)
    val created = persistentIds -- before
    val survivors = {
      val deadline = System.nanoTime() + 10e9.toLong
      var live = persistentIds intersect created
      while (live.size > 1 && System.nanoTime() < deadline) { Thread.sleep(50); live = persistentIds intersect created }
      live
    }
    assert(survivors.size <= 1, s"per-iteration centroid checkpoints leaked: created=$created survivors=$survivors")
  }
}
