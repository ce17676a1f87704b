package graft

import org.apache.spark.sql.SparkSession

/** Execution-mode overrides shared by the runnable mains (r13 verdict #1:
  * prove the engine beyond single-JVM `local[N]`).
  *
  * `SPARK_GRAFT_MASTER` replaces the default `local[cpus]` master —
  * the multi-JVM gate runs the full registry under
  * `local-cluster[2,16,4096]` (real driver/executor separation, real
  * closure serialization, real shuffle transport), which single-JVM
  * local mode cannot exercise: a task closure that accidentally
  * captures driver state, or a query that depends on a driver-JVM
  * TrieMap cache being visible to "executors", only fails here.
  *
  * `SPARK_GRAFT_JARS` ships the packaged application jar to the
  * executor JVMs (`spark.jars`) — local-cluster executors get Spark's
  * own classpath from SPARK_HOME but NOT the application classes sbt
  * runs against.
  */
object Sessions {

  def master(cpus: String): String =
    sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")

  /** Apply env-driven execution overrides to a session builder. Beyond
    * master/jars, a `SPARK_GRAFT_CONF_key=value` env var becomes Spark
    * conf `key` (dots are not valid in env names, so underscores after
    * the prefix map to dots) — the spill gate uses this to squeeze
    * `spark.memory.fraction` / executor memory without a code path per
    * knob. */
  def withOverrides(b: SparkSession.Builder, cpus: String): SparkSession.Builder = {
    b.master(master(cpus))
    sys.env.get("SPARK_GRAFT_JARS").foreach(j => b.config("spark.jars", j))
    sys.env.foreach { case (k, v) =>
      if (k.startsWith("SPARK_GRAFT_CONF_"))
        b.config(k.stripPrefix("SPARK_GRAFT_CONF_").replace('_', '.'), v)
    }
    b
  }
}
