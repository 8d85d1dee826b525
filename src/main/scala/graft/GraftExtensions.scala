package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Sqrt}
import org.apache.spark.sql.graft.{TopKByDist, VectorCosineDistance, VectorDot, VectorSqDist}

/** SparkSessionExtensions entry point: registers the native vector
  * expressions as SQL functions so `spark.sql` users (and thrift/connect
  * clients) get them without the Scala Column API:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT vector_l2(a.embedding, b.embedding) FROM ...
  *   SELECT qid, topk_by_dist(dist, id, 10) FROM scored GROUP BY qid
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // index-aware ANN rewrite: ORDER BY vector_l2(vec, q) LIMIT k over a
    // view registered in graft.plans.IndexRegistry runs the HNSW graph
    // traversal instead of a full scan (post-hoc resolution: needs the view
    // name, which the optimizer erases)
    ext.injectPostHocResolutionRule(session => graft.plans.AnnTopKRewrite(session))

    ext.injectFunction((FunctionIdentifier("vector_sqdist"),
      info("vector_sqdist", "vector_sqdist(a, b) - squared L2 distance between float/double arrays"),
      (children: Seq[Expression]) => VectorSqDist(children(0), children(1))))

    ext.injectFunction((FunctionIdentifier("vector_l2"),
      info("vector_l2", "vector_l2(a, b) - Euclidean distance between float/double arrays"),
      (children: Seq[Expression]) => Sqrt(VectorSqDist(children(0), children(1)))))

    ext.injectFunction((FunctionIdentifier("vector_dot"),
      info("vector_dot", "vector_dot(a, b) - dot product of float/double arrays"),
      (children: Seq[Expression]) => VectorDot(children(0), children(1))))

    ext.injectFunction((FunctionIdentifier("vector_cosine_distance"),
      info("vector_cosine_distance", "vector_cosine_distance(a, b) - 1 - cos(a,b); 1.0 when either norm is 0"),
      (children: Seq[Expression]) => VectorCosineDistance(children(0), children(1))))

    ext.injectFunction((FunctionIdentifier("topk_by_dist"),
      info("topk_by_dist", "topk_by_dist(dist, id, k) - aggregate: k smallest (dist,id) pairs, sorted"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "topk_by_dist(dist, id, k) takes 3 arguments")
        require(children(2).foldable, "topk_by_dist: k must be a literal")
        val k = children(2).eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(s"k must be an integer literal, got $other")
        }
        require(k > 0, s"topk_by_dist: k must be positive, got $k")
        TopKByDist(children(0), children(1), k).toAggregateExpression()
      }))
  }
}
