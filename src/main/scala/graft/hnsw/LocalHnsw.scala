package graft.hnsw

import scala.collection.mutable

import graft.functions.Distances

/** Partition-local HNSW graph — the plain-Scala inner loop of the
  * distributed build (SURVEY.md B1–B6, §7.3 "graph build inner loop").
  *
  * Implements the same algorithm family as the reference engine
  * (`hsnw_trial.py:67-294`): multi-layer navigable small-world graph with
  * greedy descent through sparse upper layers, bounded best-first search
  * (two heaps + visited set + early exit) on the target layer, a diversity
  * neighbor-selection heuristic, bidirectional linking with degree pruning,
  * and entry-point maintenance. Written fresh for Scala: ids are global
  * longs supplied by the caller (the Spark build job assigns them
  * deterministically), and levels are supplied per-id (see
  * [[graft.functions.Levels]]) instead of drawn from a shared sequential
  * RNG — that is what makes the build partition-parallel.
  *
  * This class is used strictly inside `mapPartitions`; it never touches the
  * DataFrame layer.
  */
final class LocalHnsw(
    val dim: Int,
    val m: Int,
    val maxM0: Int,
    val efConstruction: Int,
    val metricName: String,
    val int8Screen: Boolean = false) extends Serializable {

  private val distFn = Distances.metricLocal(metricName)

  val vectors = new mutable.LongMap[Array[Float]]()
  val levels = new mutable.LongMap[Int]()
  /** id → (layer → neighbor ids); array index is the layer. */
  val graph = new mutable.LongMap[Array[LongList]]()
  var entryPoint: Long = -1L
  var maxLayer: Int = -1

  def size: Int = vectors.size

  // ---- cosine norm cache --------------------------------------------
  // cosineLocal recomputes BOTH operands' self-dots on every call — 3×
  // the flops of the dot product that actually varies per pair. The
  // build's inner loop evaluates each stored vector against hundreds of
  // queries, so caching ‖v‖ per stored id (and computing the query's
  // once per search) cuts the dominant build phase's arithmetic ~3× at
  // high dim. BIT-IDENTICAL to cosineLocal: the dot, na and nb
  // accumulators are independent and keep the exact same i-ascending
  // operation order, so 1 − dot/(√na·√nb) is the same IEEE value whether
  // the norms are computed in the same loop or cached (spec-pinned in
  // LocalHnswSpec). l2 keeps the plain per-pair path (its subtraction
  // couples the operands — a na+nb−2·dot rewrite would NOT be
  // bit-identical).
  private val cacheNorms = metricName == "cosine"
  private val norms = new mutable.LongMap[Double]()

  // ---- int8 candidate pre-screen (cosine only) -----------------------
  // The searchLayer eval traffic is the build's DRAM-bandwidth bound
  // (BENCH_SCALE_BUILDPHASES512.json): each eval streams the neighbor's
  // full float vector (dim·4 B at a random address). The screen reads
  // the 4×-smaller int8 copy first and skips the float eval when the
  // quantization-error LOWER BOUND on the true distance already exceeds
  // the kept-heap's worst — a PROVABLY BIT-IDENTICAL skip, not an
  // approximation: per component vᵢ = s·qᵢ + eᵢ with |eᵢ| ≤ s/2
  // (round-to-nearest), so |dot(a,b) − s_a·s_b·dot8| ≤
  // 0.5·(s_a·‖b₈‖₁ + s_b·‖a₈‖₁) + dim·s_a·s_b/4 (the ‖·‖₁ are of the
  // DEQUANTIZED vectors, computed exactly at quantization time), and
  // skip fires only when approxDist − bound/denominator > worst ⟹
  // trueDist > worst ⟹ the unscreened loop would have pushed nothing
  // (strict <). The bound is inflated 1e−6 relative against its own
  // double rounding. Identity is spec-pinned (LocalHnswSpec: same
  // edges, same search results, screen on vs off). Cosine only: its
  // distance decomposes into a cached-norm quotient; l2's subtraction
  // couples the operands per pair.
  private val screenActive = int8Screen && cacheNorms
  /** codes + scale + exact L1 of the dequantized vector. */
  private[hnsw] final class Quant(val codes: Array[Byte], val scale: Double, val l1: Double)
  private val quants = new mutable.LongMap[Quant]()
  /** Screen observability for the micro-bench: evals seen / float reads saved. */
  var screenEvals: Long = 0L
  var screenSkips: Long = 0L

  private def quantize(v: Array[Float]): Quant = {
    var maxAbs = 0.0f
    var i = 0
    while (i < v.length) { val a = math.abs(v(i)); if (a > maxAbs) maxAbs = a; i += 1 }
    val s = maxAbs / 127.0
    val codes = new Array[Byte](v.length)
    var l1i = 0L
    if (s > 0.0) {
      i = 0
      while (i < v.length) {
        val c = math.round(v(i) / s).toInt
        codes(i) = c.toByte
        l1i += math.abs(c)
        i += 1
      }
    }
    new Quant(codes, s, s * l1i.toDouble)
  }

  /** True iff the int8 lower bound on dist(q, id) exceeds `worst` — the
    * certified skip. NaN-safe: a zero-norm operand yields NaN here and
    * falls through to the exact eval (which defines that case as 1.0).
    */
  @inline private def screenedOut(sq: Quant, qNorm: Double, id: Long, worst: Double): Boolean = {
    val nq = quants(id)
    val a = sq.codes
    val b = nq.codes
    var dot = 0
    var i = 0
    while (i < dim) { dot += a(i) * b(i); i += 1 }
    val denom = qNorm * norms(id)
    val e = (0.5 * (sq.scale * nq.l1 + nq.scale * sq.l1) +
      dim * sq.scale * nq.scale * 0.25) * 1.000001
    screenEvals += 1
    // lower bound on the distance = 1 − (upper bound on the dot)/denom
    val out = 1.0 - (sq.scale * nq.scale * dot + e) / denom > worst
    if (out) screenSkips += 1
    out
  }

  // ---- primitive inner-loop structures --------------------------------
  // The insert loop is STRUCTURE-bound, not flop-bound: measured
  // single-threaded (LocalBuildBench, 16k x 512 cosine) the boxed forms —
  // ArrayBuffer[Long] adjacency (an Array[AnyRef] of boxed longs walked on
  // every hop), PriorityQueue[(Double, Long)] heaps (a tuple allocation
  // per candidate) and HashSet[Long] visited (a box per membership test) —
  // cost ~10x the distance arithmetic itself. Neighbor lists, both search
  // heaps and the visited set are therefore plain primitive arrays. Tie
  // ordering is (dist, id) everywhere — deterministic by construction
  // (the boxed heaps broke distance ties by internal heap order, which
  // was deterministic but unspecified).

  /** Query norm for the cached-cosine path; unused (0.0) for l2. */
  @inline private def qNormOf(q: Array[Float]): Double =
    if (cacheNorms) Distances.normLocal(q) else 0.0

  @inline private def dQ(q: Array[Float], qNorm: Double, id: Long): Double =
    if (cacheNorms) Distances.cosineLocalPre(q, qNorm, vectors(id), norms(id))
    else distFn(q, vectors(id))

  @inline private def dIds(a: Long, b: Long): Double =
    if (cacheNorms) Distances.cosineLocalPre(vectors(a), norms(a), vectors(b), norms(b))
    else distFn(vectors(a), vectors(b))

  private[hnsw] def registerVector(id: Long, vector: Array[Float]): Unit = {
    vectors(id) = vector
    if (cacheNorms) norms(id) = Distances.normLocal(vector)
    if (screenActive) quants(id) = quantize(vector)
  }

  /** Bounded best-first search on one layer (reference `_search_layer`,
    * `hsnw_trial.py:156-192`): min-heap frontier, bounded max-heap of the
    * current best `ef`, visited set, early exit when the frontier head is
    * worse than the worst of the kept set. Returns (dist, id) ascending.
    *
    * `skip` (tombstones) excludes ids from the KEPT set but still
    * traverses through them. This DELIBERATELY deviates from the reference,
    * whose `_search_layer` `continue`s on tombstoned neighbors and never
    * routes through them (`hsnw_trial.py:178-179`): pruning deleted nodes
    * from traversal disconnects the graph around deleted hubs and forces ef
    * widening as the delete count grows. Routing through them keeps search
    * cost independent of the total delete count — deleted hubs keep
    * navigating until a rebuild reclaims them — while still never
    * returning them.
    */
  def searchLayer(q: Array[Float], entry: Long, ef: Int, layer: Int,
                  skip: Long => Boolean = _ => false): Array[(Double, Long)] = {
    val qn = qNormOf(q)
    val sq = if (screenActive) quantize(q) else null
    val visited = new LongHashSet(math.max(64, 4 * ef))
    visited.add(entry)
    // frontier: nearest-(dist, id) first; kept: worst-(dist, id) at the
    // root, bounded at ef — primitive parallel-array heaps, no boxing
    val frontier = new PairHeap(64, max = false)
    val kept = new PairHeap(ef + 2, max = true)
    val d0 = dQ(q, qn, entry)
    frontier.push(d0, entry)
    if (!skip(entry)) kept.push(d0, entry)
    var done = false
    while (!done && frontier.nonEmpty) {
      val cd = frontier.topDist
      val c = frontier.topId
      frontier.pop()
      if (kept.size >= ef && cd > kept.topDist) {
        done = true // early exit
      } else {
        val nbrs = neighborsAt(c, layer)
        var i = 0
        while (i < nbrs.length) {
          val nb = nbrs(i)
          if (visited.add(nb)) {
            // certified skip: with the kept heap full, a candidate whose
            // int8 distance lower bound already exceeds the heap's worst
            // provably fails the push test below — the float vector is
            // never read (the bandwidth cut; bit-identical by the bound)
            if (sq != null && kept.size >= ef && screenedOut(sq, qn, nb, kept.topDist)) {
              () // nothing to push, exactly as the unscreened loop
            } else {
              val nd = dQ(q, qn, nb)
              if (kept.size < ef || nd < kept.topDist) {
                frontier.push(nd, nb)
                if (!skip(nb)) {
                  kept.push(nd, nb)
                  if (kept.size > ef) kept.pop()
                }
              }
            }
          }
          i += 1
        }
      }
    }
    kept.drainSortedAsc()
  }

  @inline private def neighborsAt(id: Long, layer: Int): LongList = {
    val layers = graph(id)
    if (layer < layers.length) layers(layer) else LocalHnsw.EmptyList
  }

  /** Diversity heuristic (reference `_select_neighbors`,
    * `hsnw_trial.py:133-151`): scan candidates by ascending distance to the
    * query; keep one unless an already-selected neighbor is closer to it
    * than it is to the query.
    */
  def selectNeighbors(candidates: Array[(Double, Long)], cap: Int): Array[Long] = {
    val selected = new mutable.ArrayBuffer[Long](cap)
    var i = 0
    while (i < candidates.length && selected.size < cap) {
      val (cd, c) = candidates(i)
      var keep = true
      var j = 0
      while (keep && j < selected.size) {
        if (dIds(c, selected(j)) < cd) keep = false
        j += 1
      }
      if (keep) selected += c
      i += 1
    }
    selected.toArray
  }

  /** Greedy hill-climb to the locally nearest node on one layer
    * (reference insert/query phase-1 descent, `hsnw_trial.py:223-233`).
    */
  private def greedyStep(q: Array[Float], start: Long, layer: Int): Long = {
    val qn = qNormOf(q)
    var cur = start
    var curD = dQ(q, qn, cur)
    var improved = true
    while (improved) {
      improved = false
      val nbrs = neighborsAt(cur, layer)
      var i = 0
      while (i < nbrs.length) {
        val nb = nbrs(i)
        val nd = dQ(q, qn, nb)
        if (nd < curD) { cur = nb; curD = nd; improved = true }
        i += 1
      }
    }
    cur
  }

  /** Full insert (reference `add_point`, `hsnw_trial.py:197-265`), with id
    * and level supplied by the caller.
    */
  def add(id: Long, vector: Array[Float], level: Int): Unit = {
    require(vector.length == dim, s"dimension mismatch: ${vector.length} != $dim")
    registerVector(id, vector)
    levels(id) = level
    graph(id) = Array.fill(level + 1)(new LongList(if (level == 0) maxM0 else m))

    if (entryPoint < 0) { entryPoint = id; maxLayer = level; return }

    var cur = entryPoint
    var layer = maxLayer
    while (layer > level) { cur = greedyStep(vector, cur, layer); layer -= 1 }

    layer = math.min(level, maxLayer)
    while (layer >= 0) {
      val cands = searchLayer(vector, cur, efConstruction, layer)
      val cap = if (layer == 0) maxM0 else m
      val selected = selectNeighbors(cands, cap)
      var i = 0
      while (i < selected.length) {
        val nb = selected(i)
        link(id, nb, layer, cap)
        i += 1
      }
      cur = cands(0)._2
      layer -= 1
    }

    if (level > maxLayer) { maxLayer = level; entryPoint = id }
  }

  /** Bidirectional link + degree prune (reference `hsnw_trial.py:246-254`):
    * when a neighbor list exceeds its cap, keep the `cap` closest to that
    * node.
    */
  private def link(a: Long, b: Long, layer: Int, cap: Int): Unit = {
    graph(a)(layer) += b
    val bl = graph(b)(layer)
    bl += a
    if (bl.length > cap) {
      // exactly one over cap: drop the single (dist, id)-largest — the
      // same KEPT SET as sort-by-(dist,id)-take(cap), with no sort and no
      // allocation (the list keeps insertion order; normalizeAdjacency
      // sorts for the persisted/query form). On distance TIES this keeps
      // the smaller id, intentionally differing from the pre-r15 stable
      // sort-by-distance-only (earliest-inserted won) and from the
      // reference's same stable prune (hsnw_trial.py:252) — (dist,id) is
      // the deterministic total order the rest of the engine uses.
      var worst = 0
      var worstD = dIds(b, bl(0))
      var i = 1
      while (i < bl.length) {
        val di = dIds(b, bl(i))
        if (di > worstD || (di == worstD && bl(i) > bl(worst))) {
          worst = i; worstD = di
        }
        i += 1
      }
      bl.remove(worst)
    }
  }

  /** Top-k ANN search (reference `search`, `hsnw_trial.py:267-294`):
    * greedy descent to layer 1, bounded best-first on layer 0 with
    * ef = max(ef, k), rescore + ascending sort + take k. `skip`
    * (tombstones — Q3's "deleted ids never surface" outcome) excludes ids
    * from the kept set during traversal — never from the graph walk (a
    * deliberate deviation from the reference's prune-from-traversal, see
    * [[searchLayer]]) — so cost does not grow with the delete count.
    */
  def search(q: Array[Float], k: Int, ef: Int, skip: Long => Boolean = _ => false): Array[(Long, Double)] = {
    if (entryPoint < 0) return Array.empty
    val width = math.max(ef, k)
    var cur = entryPoint
    var layer = maxLayer
    while (layer >= 1) { cur = greedyStep(q, cur, layer); layer -= 1 }
    searchLayer(q, cur, width, 0, skip)
      .iterator
      .map { case (dist, id) => (id, dist) }
      .take(k)
      .toArray
  }

  /** Sort every neighbor list by (distance to the owning node, id).
    * Persisted edge rows arrive in SHUFFLE order when a sub-graph is
    * rebuilt, and best-first search outcomes depend on neighbor scan order
    * (a candidate pruned from the kept heap is also never enqueued on the
    * frontier) — normalizing makes query results reproducible run-to-run
    * on the same index.
    */
  def normalizeAdjacency(): Unit =
    graph.foreach { case (src, layers) =>
      layers.foreach { nbrs =>
        if (nbrs.length > 1) {
          val pairs = new Array[(Double, Long)](nbrs.length)
          var i = 0
          while (i < nbrs.length) {
            val d = nbrs(i)
            pairs(i) = (if (vectors.contains(d)) dIds(src, d) else Double.MaxValue, d)
            i += 1
          }
          val sorted = pairs.sorted
          i = 0
          while (i < sorted.length) { nbrs.set(i, sorted(i)._2); i += 1 }
        }
      }
    }

  /** Flatten the adjacency to (src, layer, dst) rows. */
  def edges: Iterator[(Long, Int, Long)] =
    graph.iterator.flatMap { case (src, layers) =>
      layers.iterator.zipWithIndex.flatMap { case (nbrs, layer) =>
        nbrs.iterator.map(dst => (src, layer, dst))
      }
    }
}

/** Growable primitive long array — the adjacency-list cell (boxed
  * ArrayBuffer[Long] walked the hot loop through an Array[AnyRef] of
  * boxed longs).
  */
private[hnsw] class LongList(initial: Int) {
  def this() = this(8)
  private var arr = new Array[Long](math.max(1, initial))
  private var len = 0
  @inline def length: Int = len
  @inline def apply(i: Int): Long = arr(i)
  @inline def set(i: Int, v: Long): Unit = arr(i) = v
  def +=(v: Long): Unit = {
    if (len == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(len) = v
    len += 1
  }
  def remove(i: Int): Unit = {
    require(i >= 0 && i < len, s"LongList.remove($i) outside [0, $len)")
    System.arraycopy(arr, i + 1, arr, i, len - i - 1)
    len -= 1
  }
  def iterator: Iterator[Long] = (0 until len).iterator.map(arr(_))
}

/** Open-addressing primitive long set (linear probing, ≤ 0.5 load) — the
  * searchLayer visited set. `add` returns true when the key was new, so
  * membership test and insert are one probe sequence.
  */
private[hnsw] final class LongHashSet(initialCapacity: Int) {
  private var keys = {
    val c = java.lang.Integer.highestOneBit(math.max(16, initialCapacity) - 1) * 2
    val a = new Array[Long](c)
    java.util.Arrays.fill(a, Long.MinValue)
    a
  }
  private var mask = keys.length - 1
  private var n = 0
  private var hasSentinel = false

  @inline private def slot(k: Long): Int = {
    val h = k * 0x9E3779B97F4A7C15L
    ((h ^ (h >>> 32)).toInt) & mask
  }

  def add(k: Long): Boolean = {
    if (k == Long.MinValue) {
      if (hasSentinel) false else { hasSentinel = true; true }
    } else {
      var i = slot(k)
      var cur = keys(i)
      while (cur != Long.MinValue) {
        if (cur == k) return false
        i = (i + 1) & mask
        cur = keys(i)
      }
      keys(i) = k
      n += 1
      if (2 * n > keys.length) rehash()
      true
    }
  }

  private def rehash(): Unit = {
    val old = keys
    keys = new Array[Long](old.length * 2)
    java.util.Arrays.fill(keys, Long.MinValue)
    mask = keys.length - 1
    var i = 0
    while (i < old.length) {
      val k = old(i)
      if (k != Long.MinValue) {
        var j = slot(k)
        while (keys(j) != Long.MinValue) j = (j + 1) & mask
        keys(j) = k
      }
      i += 1
    }
  }
}

/** Binary heap over primitive (dist, id) pairs in parallel arrays —
  * searchLayer's frontier (min) and bounded kept set (max). Ordering is
  * lexicographic (dist, id); `max = true` flips it so the root is the
  * WORST kept pair.
  */
private[hnsw] final class PairHeap(initial: Int, max: Boolean) {
  private var ds = new Array[Double](math.max(2, initial))
  private var ids = new Array[Long](ds.length)
  private var n = 0

  @inline def size: Int = n
  @inline def nonEmpty: Boolean = n > 0
  @inline def topDist: Double = ds(0)
  @inline def topId: Long = ids(0)

  @inline private def before(d1: Double, i1: Long, d2: Double, i2: Long): Boolean =
    if (max) d1 > d2 || (d1 == d2 && i1 > i2)
    else d1 < d2 || (d1 == d2 && i1 < i2)

  def push(d: Double, id: Long): Unit = {
    if (n == ds.length) {
      ds = java.util.Arrays.copyOf(ds, n * 2)
      ids = java.util.Arrays.copyOf(ids, n * 2)
    }
    var i = n
    n += 1
    while (i > 0 && before(d, id, ds((i - 1) / 2), ids((i - 1) / 2))) {
      val p = (i - 1) / 2
      ds(i) = ds(p); ids(i) = ids(p)
      i = p
    }
    ds(i) = d
    ids(i) = id
  }

  def pop(): Unit = {
    n -= 1
    val d = ds(n)
    val id = ids(n)
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1
      if (l >= n) done = true
      else {
        var c = l
        val r = l + 1
        if (r < n && before(ds(r), ids(r), ds(l), ids(l))) c = r
        if (before(ds(c), ids(c), d, id)) {
          ds(i) = ds(c); ids(i) = ids(c)
          i = c
        } else done = true
      }
    }
    if (n > 0) { ds(i) = d; ids(i) = id }
  }

  /** All pairs, (dist, id) ascending — searchLayer's return shape. */
  def drainSortedAsc(): Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](n)
    var i = 0
    while (i < n) { out(i) = (ds(i), ids(i)); i += 1 }
    scala.util.Sorting.quickSort(out)(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
    out
  }
}

object LocalHnsw {
  /** Shared empty adjacency cell for layers a node does not reach —
    * STRUCTURALLY immutable (mutators throw), not just read-only by
    * caller convention: one instance backs every node's missing layers,
    * so a single stray `+=` would corrupt adjacency globally (ADVICE
    * r15). Real adjacency cells are plain LongLists — the mutating call
    * sites never see this subclass, so their dispatch stays monomorphic.
    */
  private[hnsw] val EmptyList: LongList = new LongList(1) {
    override def +=(v: Long): Unit =
      throw new UnsupportedOperationException("shared empty adjacency is immutable")
    override def set(i: Int, v: Long): Unit =
      throw new UnsupportedOperationException("shared empty adjacency is immutable")
    override def remove(i: Int): Unit =
      throw new UnsupportedOperationException("shared empty adjacency is immutable")
  }

  /** Rebuild a LocalHnsw from persisted rows without re-running insertion —
    * used by the distributed query path to reconstruct each partition's
    * sub-graph from the edges table.
    */
  def fromRows(
      dim: Int, m: Int, maxM0: Int, efConstruction: Int, metricName: String,
      nodes: Iterator[(Long, Array[Float], Int)],
      edges: Iterator[(Long, Int, Long)]): LocalHnsw = {
    val idx = new LocalHnsw(dim, m, maxM0, efConstruction, metricName)
    nodes.foreach { case (id, vec, level) =>
      idx.registerVector(id, vec)
      idx.levels(id) = level
      idx.graph(id) = Array.fill(level + 1)(new LongList())
      // entry point = lowest id among the highest-level nodes (deterministic,
      // matches HnswBuild's ORDER BY level DESC, id ASC LIMIT 1 meta rule)
      if (idx.entryPoint < 0 || level > idx.maxLayer ||
          (level == idx.maxLayer && id < idx.entryPoint)) {
        idx.entryPoint = id
        idx.maxLayer = level
      }
    }
    edges.foreach { case (src, layer, dst) =>
      val layers = idx.graph(src)
      if (layer < layers.length) layers(layer) += dst
    }
    idx.normalizeAdjacency()
    idx
  }
}
