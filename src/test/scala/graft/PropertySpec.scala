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

  // ---- WARC parser fuzz (SURVEY §8.2 crawl front door; Warc.parseRecords
  //      is Content-Length-honoring with NO resync past a malformed
  //      record — these properties pin never-throws + prefix-stability
  //      under the hostile inputs a real crawl serves) ----

  /** Payloads that deliberately contain the parser's own sentinels: a
    * planted record magic, header terminators, lone CR/LF — the
    * magic-in-payload trap class.
    */
  private val warcPayloadGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.const("WARC/1.0\r\n"),
    Gen.const("\r\n\r\n"),
    Gen.const("Content-Length: 3"),
    Gen.const("\rX\n"))).map(_.mkString(" "))

  private def warcRecord(i: Int, payload: String): String =
    s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://h$i.example/p$i\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n$payload"

  private def parse(s: String) =
    graft.sources.Warc.parseRecords(s.getBytes("US-ASCII"))

  test("warc fuzz: random truncation never throws; parsed prefix is stable") {
    check(Prop.forAll(Gen.listOfN(4, warcPayloadGen), Gen.chooseNum(0.0, 1.0)) {
      (payloads, frac) =>
        val stream = payloads.zipWithIndex.map { case (p, i) => warcRecord(i, p) }.mkString
        val full = parse(stream)
        val cut = (stream.length * frac).toInt
        val trunc = parse(stream.take(cut))
        // a valid stream parses completely; any truncation parses a PREFIX
        // of the full result (no resync into a cut record's payload, no
        // invented records) — and never throws
        full.size == payloads.size && trunc == full.take(trunc.size) &&
          trunc.forall(r => full.contains(r))
    })
  }

  test("warc fuzz: corrupted Content-Length never throws; prior records unaffected") {
    val lenGen: Gen[String] = Gen.oneOf(
      Gen.const("banana"), Gen.const("-7"), Gen.const("999999999"),
      Gen.const("18446744073709551617"), Gen.chooseNum(0, 40).map(_.toString))
    check(Prop.forAll(Gen.listOfN(4, warcPayloadGen), Gen.chooseNum(0, 3), lenGen) {
      (payloads, j, badLen) =>
        val recs = payloads.zipWithIndex.map { case (p, i) => warcRecord(i, p) }
        val full = parse(recs.mkString)
        val corrupted = recs.updated(j,
          recs(j).replaceFirst("Content-Length: \\d+", s"Content-Length: $badLen"))
        val got = parse(corrupted.mkString)
        // records BEFORE the corrupted one parse bit-identically; from the
        // corrupted record on, anything goes except an exception
        got.take(j) == full.take(j)
    })
  }

  test("warc fuzz: LF-only (non-CRLF) records are skipped, neighbours parse intact") {
    check(Prop.forAll(Gen.listOfN(5, warcPayloadGen),
        Gen.someOf(0, 1, 2, 3, 4)) { (payloads, mutate) =>
      val recs = payloads.zipWithIndex.map { case (p, i) => warcRecord(i, p) }
      val stream = recs.zipWithIndex.map { case (r, i) =>
        if (mutate.contains(i)) r.replace("\r\n", "\n") else r
      }.mkString
      val got = parse(stream)
      val expected = recs.zipWithIndex.filterNot { case (_, i) => mutate.contains(i) }
        .map { case (r, _) => parse(r).head }
      got == expected
    })
  }
}
