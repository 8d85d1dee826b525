package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Distances, Levels}
import graft.hnsw.LocalHnsw

/** Property tests from SURVEY.md §5: distance laws, level distribution,
  * self-match, ef clamp, tombstone exclusion, ascending results.
  */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  private val vecGen: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](8, Gen.chooseNum(-10f, 10f))

  test("l2: non-negative, symmetric, zero iff identical input") {
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val d1 = Distances.l2Local(a, b)
      val d2 = Distances.l2Local(b, a)
      d1 >= 0.0 && d1 == d2 && Distances.l2Local(a, a) == 0.0
    })
  }

  test("cosine: symmetric, in [0, 2], exactly 1.0 for zero norm") {
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val d = Distances.cosineLocal(a, b)
      d == Distances.cosineLocal(b, a) && d >= -1e-12 && d <= 2.0 + 1e-12
    })
    val zero = Array.fill(8)(0f)
    assert(Distances.cosineLocal(zero, Array.fill(8)(1f)) === 1.0)
  }

  test("levels: non-negative, deterministic, geometric-ish decay") {
    check(Prop.forAll(Gen.chooseNum(0L, 1000000L)) { id =>
      val mL = Levels.defaultML(16)
      val l = Levels.levelForLocal(id, mL)
      l >= 0 && l == Levels.levelForLocal(id, mL)
    })
  }

  test("search: self-match@1 dist 0; ascending distances; k respected; ef clamp") {
    val rng = new scala.util.Random(4242)
    val vecs = Array.fill(300)(Array.fill(12)(rng.nextGaussian().toFloat))
    val mL = Levels.defaultML(16)
    val idx = new LocalHnsw(12, 16, 32, 100, "l2")
    vecs.zipWithIndex.foreach { case (v, i) => idx.add(i.toLong, v, Levels.levelForLocal(i.toLong, mL)) }
    check(Prop.forAll(Gen.chooseNum(0, 299), Gen.chooseNum(1, 20), Gen.chooseNum(1, 60)) { (qi, k, ef) =>
      val res = idx.search(vecs(qi), k, ef) // ef may be < k: must clamp internally
      val dists = res.map(_._2).toSeq
      res.nonEmpty &&
        res.head._1 == qi.toLong && res.head._2 == 0.0 && // self-match (duplicate-free gaussians)
        res.length <= k &&
        res.length >= math.min(k, 1) &&
        dists == dists.sorted &&
        (k > res.length || res.length == k)
    })
  }

  test("duplicate vectors: both copies rank before anything else, dist 0") {
    val rng = new scala.util.Random(7)
    val base = Array.fill(100)(Array.fill(8)(rng.nextGaussian().toFloat))
    val vecs = base :+ base(5).clone() // id 100 duplicates id 5
    val mL = Levels.defaultML(16)
    val idx = new LocalHnsw(8, 16, 32, 100, "l2")
    vecs.zipWithIndex.foreach { case (v, i) => idx.add(i.toLong, v, Levels.levelForLocal(i.toLong, mL)) }
    val res = idx.search(base(5), 2, 50)
    assert(res.map(_._1).toSet === Set(5L, 100L))
    assert(res.forall(_._2 == 0.0))
  }

  test("tombstoned ids never surface regardless of query") {
    val rng = new scala.util.Random(11)
    val vecs = Array.fill(150)(Array.fill(8)(rng.nextGaussian().toFloat))
    val mL = Levels.defaultML(16)
    val idx = new LocalHnsw(8, 16, 32, 100, "l2")
    vecs.zipWithIndex.foreach { case (v, i) => idx.add(i.toLong, v, Levels.levelForLocal(i.toLong, mL)) }
    val dead = (0L until 150L by 7L).toSet
    check(Prop.forAll(Gen.chooseNum(0, 149)) { qi =>
      idx.search(vecs(qi), 10, 50, dead.contains).forall(r => !dead.contains(r._1))
    })
  }
}
