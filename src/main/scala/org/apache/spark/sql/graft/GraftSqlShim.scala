package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge into `private[sql]` plan construction: the one sanctioned way for
  * an extension library to hand Catalyst a custom [[LogicalPlan]] node and
  * get a DataFrame back (`Dataset.ofRows` is package-private by design;
  * extension libraries host this shim inside the sql package — same
  * technique the Spark ecosystem uses, no internals are modified). */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Column ↔ Expression bridges (r15): the Spark 4 public Column API no
    * longer exposes expression construction, but a library shipping
    * native codegen'd expressions (the tier-(b) custom-operator path)
    * needs exactly that to offer a Column builder without a session
    * registry round-trip. `ExpressionUtils` is the classic bridge the
    * connect/classic split introduced for this purpose. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
