package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{VectorCosineDistance, VectorSqDist}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType}

import graft.hnsw.{Hnsw, HnswIndex}

/** Session-wide registry binding a view name to a built HNSW index.
  *
  * The contract mirrors the reference's `search()` entry point
  * (`hsnw_trial.py:267`): the user keeps querying the vector table through
  * plain SQL, and a registered index makes `ORDER BY vector_l2(vec, q)
  * LIMIT k` run the ANN graph traversal instead of the full scan. The view
  * itself stays queryable with exact semantics — the rewrite only fires on
  * the recognized top-k shape, and only when an index is registered for
  * that exact view name; everything else falls back to the brute-force
  * (still distributed, still correct) plan.
  *
  * LIFECYCLE CONTRACT: the registry binds a NAME to an index snapshot and
  * is JVM-global. If the view is replaced (`createOrReplaceTempView`) or
  * dropped, `register` the new index or `unregister` the name — a stale
  * registration would keep serving the old snapshot for the rewritten
  * shape (the same way a stale external index would after reloading a
  * table in any engine).
  */
object IndexRegistry {
  final case class Entry(index: HnswIndex, idCol: String, vecCol: String)

  private val reg = TrieMap.empty[String, Entry]
  private val fired = new java.util.concurrent.atomic.AtomicLong(0)

  def register(view: String, index: HnswIndex,
               idCol: String = "id", vecCol: String = "vector"): Unit =
    reg(view.toLowerCase) = Entry(index, idCol, vecCol)
  def unregister(view: String): Unit = reg.remove(view.toLowerCase)
  def lookup(view: String): Option[Entry] = reg.get(view.toLowerCase)

  /** Number of times the ANN rewrite has fired (observability + tests). */
  def rewriteCount: Long = fired.get
  private[plans] def markFired(): Unit = fired.incrementAndGet()
}

/** Index-aware top-k rewrite (SURVEY.md §7.3 stretch): turns the analyzed
  * shape
  *
  *   GlobalLimit k / LocalLimit k / Sort [dist ASC] /
  *     Project [id, sqrt(vector_sqdist(vec, <foldable q>)) AS dist] /
  *       SubqueryAlias <registered view>
  *
  * (or `vector_cosine_distance` for a cosine-metric index) into the
  * distributed ANN query path ([[Hnsw.annQuery]]) — per-partition graph
  * traversal + global top-k merge — instead of scanning and scoring every
  * row. Output attribute ids are preserved so the parent plan is untouched.
  *
  * Injected as a post-hoc resolution rule: it needs the view name (gone
  * after the optimizer eliminates subquery aliases) and must run before
  * ConstantFolding rewrites the distance expression shape.
  */
case class AnnTopKRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case gl @ GlobalLimit(IntegerLiteral(k),
                LocalLimit(IntegerLiteral(_), s: Sort)) if s.global =>
      (s.order, s.child) match {
        case (Seq(SortOrder(orderAttr: AttributeReference, Ascending, _, _)), p: Project) =>
          tryRewrite(k, orderAttr, p).getOrElse(gl)
        case _ => gl
      }
  }

  private def viewName(plan: LogicalPlan): Option[String] = plan match {
    case sa: SubqueryAlias => Some(sa.alias)
    case _ => None
  }

  /** (vector attribute, foldable query expression) from either argument
    * order of the distance call.
    */
  private def operands(a: Expression, b: Expression): Option[(AttributeReference, Expression)] =
    (a, b) match {
      case (v: AttributeReference, q) if q.foldable => Some((v, q))
      case (q, v: AttributeReference) if q.foldable => Some((v, q))
      case _ => None
    }

  private def queryVector(q: Expression): Option[Array[Float]] =
    q.dataType match {
      case ArrayType(FloatType, _) =>
        Option(q.eval(null)).map(_.asInstanceOf[ArrayData].toFloatArray())
      case ArrayType(DoubleType, _) =>
        Option(q.eval(null)).map(_.asInstanceOf[ArrayData].toDoubleArray().map(_.toFloat))
      case _ => None
    }

  private def tryRewrite(k: Int, orderAttr: AttributeReference, p: Project): Option[LogicalPlan] =
    for {
      name <- viewName(p.child)
      entry <- IndexRegistry.lookup(name)
      distAlias <- p.projectList.collectFirst {
        case a: Alias if a.exprId == orderAttr.exprId => a
      }
      // distance shape must match the index's metric
      vq <- distAlias.child match {
        case Sqrt(VectorSqDist(a, b)) if entry.index.meta.metric == "l2" => operands(a, b)
        case VectorCosineDistance(a, b) if entry.index.meta.metric == "cosine" => operands(a, b)
        case _ => None
      }
      (vecAttr, qExpr) = vq
      if vecAttr.name == entry.vecCol
      // every other projected column must be the index id (passthrough)
      if p.projectList.forall {
        case a: Alias => a.exprId == distAlias.exprId
        case ar: AttributeReference => ar.name == entry.idCol && ar.dataType == LongType
        case _ => false
      }
      qVec <- queryVector(qExpr)
      if qVec.length == entry.index.meta.dim
    } yield {
      // annQueryBatch builds the plan without submitting a Spark job —
      // a rule that ran jobs would make plain EXPLAIN execute cluster work
      val ann = Hnsw.annQueryBatch(entry.index, Array((0L, qVec)), k)
        .queryExecution.analyzed
      val annId = ann.output.find(_.name == "id").get
      val annDist = ann.output.find(_.name == "dist").get
      val sorted = Sort(Seq(SortOrder(annDist, Ascending)), global = true, ann)
      val out = p.projectList.map {
        case a: Alias => Alias(annDist, a.name)(exprId = a.exprId)
        case ar: AttributeReference => Alias(annId, ar.name)(exprId = ar.exprId)
      }
      IndexRegistry.markFired()
      Project(out, sorted)
    }
}
