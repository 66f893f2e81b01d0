package graft

import graft.functions.{HyperplaneSig, JaccardSim, MinhashSignature, OsaDistance, Simhash, SortedJaccard}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/**
 * SparkSessionExtensions hook: registers the engine's native expressions
 * in the SQL function registry, so `spark.sql("... osa_distance(a, b)")`
 * and `minhash_signature(arr, 16)` work for SQL users (and through any
 * JDBC/Thrift front end), and injects the [[graft.plans.OsaJoinBlocking]]
 * optimizer rule so a naive `osa_distance(l, r) <= k` join plans as a
 * length-banded equi-join instead of a BroadcastNestedLoopJoin. Enable
 * with
 *   .config("spark.sql.extensions", "graft.GraftExtensions")
 * or `.withExtensions(new GraftExtensions)`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => new graft.plans.OsaJoinBlocking)
    ext.injectFunction((
      new FunctionIdentifier("osa_distance"),
      new ExpressionInfo(classOf[OsaDistance].getName, "osa_distance"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "osa_distance(left, right)")
        OsaDistance(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("jaccard_sim"),
      new ExpressionInfo(classOf[JaccardSim].getName, "jaccard_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "jaccard_sim(array<string>, array<string>)")
        JaccardSim(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "minhash_signature"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "minhash_signature(array<string>, numHashes literal)")
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"numHashes must be an integer literal, got $other")
        }
        MinhashSignature(children.head, n)
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash"),
      new ExpressionInfo(classOf[Simhash].getName, "simhash"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "simhash(array<string>, bits literal)")
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"bits must be an integer literal, got $other")
        }
        Simhash(children.head, n)
      }))
    ext.injectFunction((
      new FunctionIdentifier("sorted_jaccard"),
      new ExpressionInfo(classOf[SortedJaccard].getName, "sorted_jaccard"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "sorted_jaccard(sorted array<string>, sorted array<string>)")
        SortedJaccard(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "hyperplane_sig"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "hyperplane_sig(array<float|double>, bits literal)")
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"bits must be an integer literal, got $other")
        }
        HyperplaneSig(children.head, n)
      }))
  }
}
