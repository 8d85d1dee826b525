package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Levels
import graft.hnsw.LocalHnsw

/** Golden regression (SURVEY.md §5): committed expected outputs for the
  * deterministic seed-42 fixture. The build is a pure function of
  * (input, params) — any algorithm change that alters the graph, the level
  * hash or the distance math shows up here as an exact-value diff.
  */
class GoldenSpec extends AnyFunSuite {

  test("seed-42 fixture: exact committed top-5 and level assignments") {
    val rng = new scala.util.Random(42)
    val vecs = Array.fill(200)(Array.fill(16)(rng.nextGaussian().toFloat))
    val mL = Levels.defaultML(16)
    val idx = new LocalHnsw(16, 16, 32, 200, "l2")
    vecs.zipWithIndex.foreach { case (v, i) => idx.add(i.toLong, v, Levels.levelForLocal(i.toLong, mL)) }
    val q = Array.fill(16)(rng.nextGaussian().toFloat)

    val expected = Seq( // committed golden values (generated 2026-08-12)
      (30L, 3.5111643048668872),
      (78L, 3.673261175437429),
      (49L, 3.784366531410565),
      (45L, 3.85691439403858),
      (77L, 3.8721380179963605))
    assert(idx.search(q, 5, 50).toSeq === expected)

    assert((0L until 10L).map(Levels.levelForLocal(_, mL)) ===
      Seq(7, 0, 0, 0, 0, 0, 0, 0, 0, 0))
  }
}
