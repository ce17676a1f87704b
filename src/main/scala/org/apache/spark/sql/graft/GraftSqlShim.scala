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
}
