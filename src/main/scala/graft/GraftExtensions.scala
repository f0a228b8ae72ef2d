package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{PearsonAligned, SqlFunctions, TopKPackedAgg}

/** Spark-native extension entry point: add
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * to the session (or cluster) config and every SparkSession — including
  * ones the user builds with no graft code on the call path, e.g. a Thrift
  * server or notebook kernel — gets the engine's Catalyst functions in its
  * registry. This is the deployment-grade registration path; the
  * programmatic [[graft.functions.SqlFunctions.registerAll]] remains for
  * sessions created without the config.
  *
  * (The reference has no SQL surface at all — its kernel is only reachable
  * through the hand-wired pipeline, `ComputeCorrelationsDoFn.java:34-209`;
  * exposing it as a first-class SQL function is part of the re-design.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("pearson_aligned"),
      new ExpressionInfo(classOf[PearsonAligned].getName, "pearson_aligned"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 4) throw new IllegalArgumentException(
          "pearson_aligned(tsA ARRAY<TIMESTAMP>, retA ARRAY<DOUBLE>, " +
            s"tsB ARRAY<TIMESTAMP>, retB ARRAY<DOUBLE>) takes 4 arguments, got ${exprs.length}")
        PearsonAligned(exprs(0), exprs(1), exprs(2), exprs(3))
      }))
    ext.injectFunction((
      new FunctionIdentifier("top_k_packed"),
      new ExpressionInfo(classOf[TopKPackedAgg].getName, "top_k_packed"),
      SqlFunctions.topKPackedBuilder))
  }
}
