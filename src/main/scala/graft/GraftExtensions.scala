package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatVectorDot, FloatVectorNorm, MinHashSignature}

/** SparkSessionExtensions entry point: makes the engine's native functions
  * available to ANY session via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (e.g. for pure-SQL users on a shared cluster). Library code paths
  * register the same functions at call time through
  * [[graft.functions.VectorExpressions.register]], so the extension is a
  * deployment convenience, not a correctness requirement.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
      (children: Seq[Expression]) => FloatVectorDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[FloatVectorNorm].getName, "vec_norm"),
      (children: Seq[Expression]) => FloatVectorNorm(children.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSignature(children.head,
        graft.operators.Dedup.MinhashSeeds.map(_._1).toArray,
        graft.operators.Dedup.MinhashSeeds.map(_._2).toArray,
        graft.operators.Dedup.MinhashPrime)))
    // srp_codes / ivf_scores bind to operator-chosen constant matrices at
    // call time (HashExpressions.registerSrp / registerCentroidScores) and
    // are deliberately not part of the static extension surface.
  }
}
