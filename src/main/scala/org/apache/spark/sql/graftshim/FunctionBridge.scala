package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` session function registry so graft's
  * custom Catalyst expressions are callable from SQL text, not just the
  * Column API. Lives under `org.apache.spark.sql` purely for access.
  */
object FunctionBridge {
  def registerTemp(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
