package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.{PlanBridge, TopKAggregate, TopKByDist, VectorCosineDistance, VectorSqDist}
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
  /** `dir`: the directory the index was loaded from, when the caller
    * knows it. Carrying it lets the rewrite re-validate the on-disk
    * num_nodes marker at fire time (one file read, no job) — a streaming
    * append to `dir` invalidates the persisted calibration curve, but a
    * LIVE registration keeps its in-memory copy; the marker check stops
    * that copy from mispredicting against the appended vector set.
    */
  final case class Entry(index: HnswIndex, idCol: String, vecCol: String,
                         dir: Option[String] = None)

  private val reg = TrieMap.empty[String, Entry]
  private val fired = new java.util.concurrent.atomic.AtomicLong(0)

  def register(view: String, index: HnswIndex,
               idCol: String = "id", vecCol: String = "vector",
               dir: Option[String] = None): Unit =
    reg(view.toLowerCase) = Entry(index, idCol, vecCol, dir)
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
    // batch-query shape: GROUP BY qid + topk_by_dist over a cross join of
    // a registered view with a query table
    case agg: Aggregate => tryBatchRewrite(agg).getOrElse(agg)
  }

  private def viewName(plan: LogicalPlan): Option[String] = plan match {
    case sa: SubqueryAlias => Some(sa.alias)
    case _ => None
  }

  /** SQL spelling of the recall-target contract:
    * `SET spark.graft.ann.recallTarget=0.95` makes the routed rewrite
    * probe the smallest cell budget whose PERSISTED calibration curve
    * ([[Hnsw.withCalibration]] / `--calibrate`) clears the target, AND
    * routes to the exact-probed form (the second returned flag) — the
    * curve measures ROUTING recall, which is exactly the exact-probed
    * path's recall but only an upper bound for graph traversal, so
    * feeding the pick to the graph path could silently under-deliver the
    * target (ADVICE r13). Without the conf, an attached curve still
    * supplies [[Hnsw.DefaultRecallTarget]]'s probe pick (the same
    * no-flag default [[Hnsw.annQueryAdaptive]] serves) but keeps the
    * non-decayed graph path — a refinement of the C/4 dial, not a
    * contract. Everything here is driver-side and job-free (EXPLAIN
    * contract); an index without a curve for this k keeps the default
    * probe (the conf is a refinement, not a new obligation — failing
    * analysis over a missing curve would break every query on the view).
    * Staleness: when the registration remembers its source dir, the
    * dir's meta.json num_nodes is re-read here (one local file read, no
    * job); a mismatch — streaming appends since registration — ignores
    * the registration's in-memory curve instead of mispredicting against
    * the appended vector set.
    */
  private[plans] def confProbe(entry: IndexRegistry.Entry, k: Int): (Int, Boolean) = {
    val idx = entry.index
    def fresh: Boolean = entry.dir.forall { d =>
      try Hnsw.loadMeta(d).num_nodes == idx.meta.num_nodes
      catch { case scala.util.control.NonFatal(_) => false }
    }
    session.conf.getOption("spark.graft.ann.recallTarget") match {
      case Some(t) =>
        val target =
          try t.toDouble
          catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"spark.graft.ann.recallTarget '$t' is not a number (expected a value in (0, 1])")
          }
        require(target > 0.0 && target <= 1.0,
          s"spark.graft.ann.recallTarget $target outside (0, 1]")
        (if (fresh) Hnsw.cachedProbeFor(idx, k, target).getOrElse(-1) else -1, true)
      case None =>
        if (idx.calibration.nonEmpty && fresh)
          (Hnsw.cachedProbeFor(idx, k, Hnsw.DefaultRecallTarget).getOrElse(-1), false)
        else (-1, false)
    }
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

  private def tryRewrite(k: Int, orderAttr: AttributeReference, p: Project): Option[LogicalPlan] = {
    // optional attribute predicate between the projection and the view:
    //   ... WHERE <pred> ORDER BY dist LIMIT k
    // routes to the filtered path (filter-as-tombstone, Hnsw.withAllowed) —
    // the predicate must be deterministic and subquery-free so evaluating
    // it again for the allowed-id set cannot diverge from the original plan
    val (srcPlan, filterCond) = p.child match {
      case f: Filter if f.condition.deterministic &&
          !f.condition.exists(_.isInstanceOf[PlanExpression[_]]) =>
        (f.child, Some(f.condition))
      case other => (other, None)
    }
    for {
      name <- viewName(srcPlan)
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
      // (withAllowed is a lazy join plan, so the filtered path is too; the
      // routed path reads its cell count from meta, also job-free)
      val idx = filterCond match {
        case Some(cond) =>
          Hnsw.withAllowed(entry.index,
            PlanBridge.ofRows(session, Filter(cond, srcPlan)).select(col(entry.idCol)))
        case None => entry.index
      }
      // a locality-sharded index gets the centroid-routed plan: the one
      // query probes its nearest cells and only those shards ship. In the
      // high-dim traversal-decay regime (Hnsw.traversalDecays — meta-only,
      // so still job-free under EXPLAIN) it takes the exact-PROBED join:
      // the same pick annQueryAdaptive's decay tier makes at q=1 (qCount
      // < ScanMinQueries — the scan's union-dedup shuffle dominates small
      // batches: measured 6.1 s join vs 16.7 s scan at clustered-25q,
      // 5M×512), without its decision jobs. Bit-identical candidates
      // either way (single-query probed union = its own probed shards).
      // A SET recallTarget contract also takes the exact-probed form —
      // the calibration curve predicts exactly that path's recall
      // (confProbe scaladoc; graph traversal would under-deliver).
      val ann = (if (idx.centroids.isDefined) {
        import session.implicits._
        val q1 = Seq((0L, qVec)).toDF("qid", "vector")
        val (pc, contract) = confProbe(entry, k)
        if (contract || Hnsw.traversalDecays(idx.meta, k, -1))
          Hnsw.annQueryRoutedExact(idx, q1, k, probeCells = pc)
        else Hnsw.annQueryRouted(idx, q1, k, probeCells = pc)
      } else {
        Hnsw.annQueryBatch(idx, Array((0L, qVec)), k)
      }).queryExecution.analyzed
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

  // ---- batch-query shape (SURVEY.md Q7 as SQL): GROUP BY qid +
  //      topk_by_dist over a cross join of a registered view with a
  //      query table →
  //
  //   Aggregate [qid], [qid, topk_by_dist(sqrt(vector_sqdist(vec, qvec)), id, k)]
  //     Join Cross
  //       SubqueryAlias <registered view>
  //       <query table plan>               (qid, qvec from this side)
  //
  //      rewritten to the single-shuffle distributed ANN path
  //      ([[Hnsw.annQueryLarge]] — lazy end-to-end, so EXPLAIN still runs
  //      no jobs) re-aggregated through the same topk_by_dist over the
  //      O(q·k·P) candidates instead of scoring every (row × query) pair.

  /** Registered-index entry anywhere in a chain of subquery aliases
    * (`FROM emb_idx e` analyzes to SubqueryAlias e / SubqueryAlias emb_idx).
    */
  private def registeredEntry(plan: LogicalPlan): Option[IndexRegistry.Entry] = plan match {
    case sa: SubqueryAlias =>
      IndexRegistry.lookup(sa.alias).orElse(registeredEntry(sa.child))
    case _ => None
  }

  private def tryBatchRewrite(agg: Aggregate): Option[LogicalPlan] =
    if (!agg.resolved) None
    else agg.groupingExpressions match {
      case Seq(gk: AttributeReference) if gk.dataType == LongType =>
        agg.child match {
          case Join(left, right, jt, None, _) if jt == Cross || jt == Inner =>
            (registeredEntry(left), registeredEntry(right)) match {
              case (Some(e), None) => batchRewrite(agg, gk, e, left, right)
              case (None, Some(e)) => batchRewrite(agg, gk, e, right, left)
              case _               => None
            }
          case _ => None
        }
      case _ => None
    }

  /** (view vector attribute, query vector attribute) from either argument
    * order of the distance call, each anchored to its own join side.
    */
  private def batchOperands(a: Expression, b: Expression,
                            viewPlan: LogicalPlan, queryPlan: LogicalPlan)
      : Option[(AttributeReference, AttributeReference)] =
    (a, b) match {
      case (v: AttributeReference, q: AttributeReference)
          if viewPlan.outputSet.contains(v) && queryPlan.outputSet.contains(q) => Some((v, q))
      case (q: AttributeReference, v: AttributeReference)
          if viewPlan.outputSet.contains(v) && queryPlan.outputSet.contains(q) => Some((v, q))
      case _ => None
    }

  private def batchRewrite(agg: Aggregate, gk: AttributeReference, entry: IndexRegistry.Entry,
                           viewPlan: LogicalPlan, queryPlan: LogicalPlan): Option[LogicalPlan] = {
    val aggExprs = agg.aggregateExpressions
    for {
      _ <- Some(())
      if aggExprs.length == 2 && queryPlan.outputSet.contains(gk)
      qidOut <- aggExprs.collectFirst {
        case ar: AttributeReference if ar.exprId == gk.exprId => ar: NamedExpression
        case a @ Alias(ar: AttributeReference, _) if ar.exprId == gk.exprId => a: NamedExpression
      }
      topOut <- aggExprs.collectFirst {
        case a @ Alias(ae: AggregateExpression, _)
            if !ae.isDistinct && ae.filter.isEmpty &&
              ae.aggregateFunction.isInstanceOf[TopKByDist] =>
          (a, ae.aggregateFunction.asInstanceOf[TopKByDist])
      }
      (topAlias, topk) = topOut
      if (topk.idChild match {
        case ar: AttributeReference =>
          ar.name == entry.idCol && ar.dataType == LongType && viewPlan.outputSet.contains(ar)
        case _ => false
      })
      vq <- topk.distChild match {
        case Sqrt(VectorSqDist(a, b)) if entry.index.meta.metric == "l2" =>
          batchOperands(a, b, viewPlan, queryPlan)
        case VectorCosineDistance(a, b) if entry.index.meta.metric == "cosine" =>
          batchOperands(a, b, viewPlan, queryPlan)
        case _ => None
      }
      (vecAttr, qvecAttr) = vq
      if vecAttr.name == entry.vecCol
      if (qvecAttr.dataType match {
        case ArrayType(FloatType, _) => true
        case _                       => false
      })
    } yield {
      val queries = PlanBridge.ofRows(session, queryPlan)
        .select(PlanBridge.column(gk).as("qid"), PlanBridge.column(qvecAttr).as("vector"))
      // routed plan for locality-sharded indexes (probe-prune the shards),
      // all-shard single-shuffle otherwise — both lazy end-to-end. NOT
      // [[Hnsw.annQueryAdaptive]]: the chooser must RUN the probe phase to
      // count the shard union, and this rule fires during analysis, where
      // running jobs would make EXPLAIN execute cluster work. Dispersed SQL
      // batches that would probe most shards can query the raw tables with
      // annQueryAdaptive directly. The high-dim decay tier IS applied here
      // (Hnsw.traversalDecays reads only the meta — job-free): those
      // batches get the exact-probed equi-join plan, whose recall is flat
      // in n where traversal's ef dial collapses, and which broadcasts
      // nothing (the SQL query table's size is unknown at analysis).
      val ann =
        if (entry.index.centroids.isDefined) {
          val (pc, contract) = confProbe(entry, topk.k)
          if (contract || Hnsw.traversalDecays(entry.index.meta, topk.k, -1))
            Hnsw.annQueryRoutedExactLarge(entry.index, queries, topk.k, probeCells = pc)
          else Hnsw.annQueryRouted(entry.index, queries, topk.k, probeCells = pc)
        } else Hnsw.annQueryLarge(entry.index, queries, topk.k)
      val regrouped = ann.groupBy(col("qid"))
        .agg(TopKAggregate.topKByDist(col("dist"), col("id"), topk.k).as("top"))
      val plan2 = regrouped.queryExecution.analyzed
      val q2 = plan2.output.find(_.name == "qid").get
      val t2 = plan2.output.find(_.name == "top").get
      val out = aggExprs.map { ne =>
        if (ne.exprId == qidOut.exprId) Alias(q2, ne.name)(exprId = ne.exprId)
        else Alias(t2, ne.name)(exprId = topAlias.exprId)
      }
      IndexRegistry.markFired()
      Project(out, plan2)
    }
  }
}
