package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic HNSW level assignment (SURVEY.md F4).
  *
  * The reference samples `floor(-ln(U) * mL)` from one seeded RNG consumed in
  * insertion order (`hsnw_trial.py:119-125`), which cannot be reproduced under
  * parallel insertion. We instead make the level a pure function of the row
  * id: U = ((id * 2654435761) mod 2³¹ + 1) / 2³¹ (Knuth multiplicative hash,
  * integer arithmetic only, so the same value falls out of any engine),
  * then level = floor(−ln(U)·mL). Id-stable ⇒ reproducible across cluster
  * sizes and partition counts (SURVEY.md §7.4.2).
  */
object Levels {

  val KnuthMul = 2654435761L
  val Mod: Long = 1L << 31

  /** mL default 1/ln(max(2, M)) (reference `hsnw_trial.py:95`). */
  def defaultML(m: Int): Double = 1.0 / math.log(math.max(2, m).toDouble)

  /** Uniform (0, 1] from an id, bit-exact in any integer-correct engine.
    * id is reduced mod 2³¹ (FLOOR mod — signed `%` would go negative for
    * negative ids, making log(U) NaN/NULL) BEFORE the multiply so the
    * product stays below 2⁶² for any int64 id (ANSI mode errors on
    * overflow; values are unchanged for non-negative ids < 2³¹).
    */
  def uniformFromId(id: Column): Column =
    ((pmod(id, lit(Mod)) * lit(KnuthMul)) % lit(Mod) + lit(1L)).cast("double") / lit(Mod.toDouble)

  /** Level column: floor(−ln(U)·mL), as int. */
  def levelFor(id: Column, mL: Double): Column =
    floor(-log(uniformFromId(id)) * lit(mL)).cast("int")

  /** Plain-Scala twin for the partition-local builder. */
  def levelForLocal(id: Long, mL: Double): Int = {
    val u = ((java.lang.Math.floorMod(id, Mod) * KnuthMul) % Mod + 1).toDouble / Mod.toDouble
    math.floor(-math.log(u) * mL).toInt
  }

  /** DuckDB SQL fragment computing the identical level for oracle checks
    * (the inner `% + Mod) %` is floor-mod, matching Spark's pmod).
    */
  def levelSql(idExpr: String, mL: Double): String =
    s"CAST(floor(-ln((((($idExpr % $Mod + $Mod) % $Mod) * $KnuthMul) % $Mod + 1) / $Mod.0) * $mL) AS INT)"
}
