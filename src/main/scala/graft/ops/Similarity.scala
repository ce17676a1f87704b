package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QuerySpec, Tables => T}
import graft.functions.CosineSim
import graft.functions.CosineSim.cosine_sim

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (builder-prompt first-class component). Two paths:
  *
  *  - brute-force cosine top-k: the correctness baseline — broadcast the
  *    (small) query set against the full corpus, one shuffle for the
  *    per-query top-k;
  *  - sign-LSH bucketed top-k: the 100 TB path — random-hyperplane-style
  *    bucketing on the signs of the leading dimensions; candidate set is
  *    the query's bucket only, so scoring cost is Σ bucket² instead of q·n.
  *
  * Cosine scoring runs through the native codegen'd [[graft.functions
  * .CosineSim]] expression (single left-to-right pass), bit-identical to
  * the DuckDB oracle's list_reduce fold.
  */
object Similarity {

  private val K = 5        // neighbors per query
  private val NQ = 10      // query vectors: vec_id < 10
  private val LSH_BITS = 8 // sign bits → 256 buckets

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def withNorm(s: SparkSession, d: String): DataFrame =
    T.embeddings(s, d).withColumn("norm", sqrt(dot(col("embedding"), col("embedding"))))

  private val normSqlFrag =
    """sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |    (acc, v) -> acc + v))""".stripMargin

  private val dotSqlFrag =
    """list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(range(1, len(q.embedding) + 1),
      |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))),
      |    (acc, v) -> acc + v)""".stripMargin

  /** Brute-force cosine top-k for the first NQ vectors as queries. */
  private def knnBruteforce(s: SparkSession, d: String): DataFrame = {
    CosineSim.register(s)
    val e = withNorm(s, d)
    val q = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("norm").as("qn"))
    val c = e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"), col("norm").as("cn"))
    val scored = broadcast(q).join(c, col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosine_sim(col("qe"), col("ce")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("cand_id"), round(col("cos"), 4).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val knnBruteforceSql =
    s"""WITH e AS (SELECT vec_id, embedding, $normSqlFrag AS norm FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |    ($dotSqlFrag) / (q.norm * c.norm) AS cos
       |  FROM e q JOIN e c ON q.vec_id < $NQ AND q.vec_id <> c.vec_id)
       |SELECT query_id, CAST(rank AS INT) AS rank, cand_id, round(cos, 4) AS cos FROM (
       |  SELECT query_id, cand_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
       |  FROM scored)
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  /** Sign-LSH bucketed ANN: bucket key = sign bits of the first LSH_BITS
    * dimensions (axis-aligned hyperplanes — deterministic and portable);
    * queries only score candidates in their own bucket. */
  private def knnLsh(s: SparkSession, d: String): DataFrame = {
    CosineSim.register(s)
    val bucketExpr = (1 to LSH_BITS).map(j =>
      when(element_at(col("embedding"), j) > 0f, lit(1L << (j - 1))).otherwise(0L))
      .reduce(_ + _)
    val e = withNorm(s, d).withColumn("bucket", bucketExpr)
    val q = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("query_id"), col("bucket"),
        col("embedding").as("qe"), col("norm").as("qn"))
    val c = e.select(col("vec_id").as("cand_id"), col("bucket"),
      col("embedding").as("ce"), col("norm").as("cn"))
    val scored = broadcast(q).join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosine_sim(col("qe"), col("ce")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("cand_id"), col("bucket"),
        round(col("cos"), 4).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val knnLshSql = {
    val bucket = (1 to LSH_BITS).map(j =>
      s"CASE WHEN embedding[$j] > 0 THEN ${1L << (j - 1)} ELSE 0 END").mkString(" + ")
    s"""WITH e AS (
       |  SELECT vec_id, embedding, $normSqlFrag AS norm,
       |    CAST($bucket AS BIGINT) AS bucket
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.bucket,
       |    ($dotSqlFrag) / (q.norm * c.norm) AS cos
       |  FROM e q JOIN e c ON q.bucket = c.bucket
       |    AND q.vec_id < $NQ AND q.vec_id <> c.vec_id)
       |SELECT query_id, CAST(rank AS INT) AS rank, cand_id, bucket, round(cos, 4) AS cos FROM (
       |  SELECT query_id, cand_id, bucket, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
       |  FROM scored)
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin
  }

  /** IVF-style ANN: a coarse quantizer (seeded MLlib KMeans over the
    * corpus) assigns every vector to a cell; queries search only their own
    * cell — the inverted-file layout ANN indexes use at scale (cells ≈
    * partitions; a cluster deployment would partition the corpus by cell id
    * so each probe touches one partition). Centroids are model-derived, so
    * no DuckDB oracle (rows-only); recall is asserted against brute force
    * in SimilaritySpec. */
  private def knnIvf(s: SparkSession, d: String): DataFrame = {
    CosineSim.register(s)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = T.embeddings(s, d)
      .withColumn("features", array_to_vector(col("embedding")))
    // KMeans.fit rejects an empty dataset; the IVF of an empty corpus is
    // the empty result, not an error (incremental runs start there)
    if (e.isEmpty)
      return e.sparkSession.createDataFrame(
        e.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("query_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("cand_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cell", org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("cos", org.apache.spark.sql.types.DoubleType))))
    val km = new KMeans().setK(16).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(e)
    val cells = km.transform(e).select(col("vec_id"), col("embedding"), col("cell")).persist()
    val q = cells.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("cell"))
    val c = cells.select(col("vec_id").as("cand_id"), col("embedding").as("ce"), col("cell"))
    val scored = broadcast(q).join(c, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosine_sim(col("qe"), col("ce")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("cand_id"), col("cell"),
        round(col("cos"), 4).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Per-vector feature stats — exercises array higher-order functions
    * (norm/mean via fold, min/max via array builtins). */
  private def vectorStats(s: SparkSession, d: String): DataFrame =
    withNorm(s, d)
      .select(
        col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        round(col("norm"), 4).as("norm"),
        round(aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x.cast("double"))
          / size(col("embedding")), 4).as("mean"),
        round(array_min(col("embedding")).cast("double"), 4).as("mn"),
        round(array_max(col("embedding")).cast("double"), 4).as("mx"))
      .orderBy(col("vec_id"))

  private val vectorStatsSql =
    s"""SELECT vec_id, label, CAST(len(embedding) AS INT) AS dim,
       |  round($normSqlFrag, 4) AS norm,
       |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(embedding, x -> CAST(x AS DOUBLE))),
       |      (acc, v) -> acc + v) / len(embedding), 4) AS mean,
       |  round(CAST(list_aggregate(embedding, 'min') AS DOUBLE), 4) AS mn,
       |  round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 4) AS mx
       |FROM embeddings ORDER BY vec_id""".stripMargin

  /** ANN quality metric: recall@K of the IVF path against the exact
    * brute-force top-K, per query and overall — the evaluation loop an ANN
    * deployment runs before trading accuracy for speed. No oracle (kmeans
    * cells are MLlib-internal); SimilaritySpec bounds the recall floor and
    * pins determinism. */
  private def ivfRecall(s: SparkSession, d: String): DataFrame = {
    val exact = knnBruteforce(s, d).select(col("query_id"), col("cand_id"))
    val approx = knnIvf(s, d).select(col("query_id").as("q2"), col("cand_id").as("c2"))
    val hits = exact.join(approx,
        exact("query_id") === col("q2") && exact("cand_id") === col("c2"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"),
        sum(when(col("q2").isNotNull, 1L).otherwise(0L)).as("found"))
      .withColumn("recall", round(col("found") / col("k"), 4))
    hits.agg(
      count(lit(1)).as("n_queries"),
      round(avg(col("recall")), 4).as("avg_recall"),
      round(min(col("recall")), 4).as("min_recall"),
      round(max(col("recall")), 4).as("max_recall"))
  }

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("sim_knn_bruteforce", knnBruteforce, Some(knnBruteforceSql)),
    QuerySpec("sim_knn_lsh", knnLsh, Some(knnLshSql)),
    QuerySpec("sim_knn_ivf", knnIvf, None),
    QuerySpec("sim_vector_stats", vectorStats, Some(vectorStatsSql)),
    QuerySpec("sim_ivf_recall", ivfRecall, None))
}
