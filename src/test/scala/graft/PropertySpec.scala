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
    // fixed seed: the search self-match property is probabilistic at small
    // ef (ANN gives no exactness guarantee), so unseeded runs flake rarely;
    // a pinned seed keeps the suite deterministic without weakening the
    // property at the ef values actually exercised
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)), prop)
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

  private lazy val searchFixture: (Array[Array[Float]], LocalHnsw) = {
    val rng = new scala.util.Random(4242)
    val vecs = Array.fill(300)(Array.fill(12)(rng.nextGaussian().toFloat))
    val mL = Levels.defaultML(16)
    val idx = new LocalHnsw(12, 16, 32, 100, "l2")
    vecs.zipWithIndex.foreach { case (v, i) => idx.add(i.toLong, v, Levels.levelForLocal(i.toLong, mL)) }
    (vecs, idx)
  }

  test("search structure: nonempty, ascending distances, k respected, ef clamp") {
    // structural guarantees that hold at ANY ef — including ef < k (the
    // clamp) and ef too small for good recall. Self-match is deliberately
    // NOT asserted here: ANN makes no exactness promise at tiny ef, and
    // a seeded sweep does hit such counterexamples.
    val (vecs, idx) = searchFixture
    check(Prop.forAll(Gen.chooseNum(0, 299), Gen.chooseNum(1, 20), Gen.chooseNum(1, 60)) { (qi, k, ef) =>
      val res = idx.search(vecs(qi), k, ef)
      val dists = res.map(_._2).toSeq
      res.nonEmpty && res.length <= k && dists == dists.sorted
    })
  }

  test("search recall: self-match@1 dist 0 for every indexed vector at adequate ef") {
    val (vecs, idx) = searchFixture
    (0 until 300).foreach { qi =>
      val res = idx.search(vecs(qi), 5, 64)
      assert(res.head._1 === qi.toLong, s"qi=$qi missed self")
      assert(res.head._2 === 0.0)
    }
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
