package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (`embedding: array<float>`,
  * dim 64).
  *
  * All vector math is `zip_with` + `aggregate` column expressions in DOUBLE
  * (floats widen exactly, so Spark and the DuckDB oracle compute from
  * identical inputs) — codegen'd, no UDFs.
  *
  * Scale paths:
  *  - brute force = broadcast the (small) query set against the full table:
  *    one scan, no shuffle, linear in corpus size — the right baseline even
  *    at 100 TB when the query set is small.
  *  - LSH = 16 random-hyperplane sign bits → bucket join: candidate set
  *    shrinks ~2^16× for high-recall-at-top-k workloads; buckets shuffle
  *    only (id, bucket, vector).
  */
object Similarity {

  /** embedding column cast to array<double>. */
  def vecd(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2(a) * l2(b))

  private def withVec(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(col("vec_id"), vecd(col("embedding")).as("v"))

  /** Brute-force cosine top-5 for query vec_id = 0: broadcast the single
    * query row, scan the corpus once, TakeOrderedAndProject the top-k
    * (per-partition heap + driver merge — no global sort). */
  def qAnnBrute(s: SparkSession, d: String): DataFrame = {
    val e = withVec(s, d)
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(q))
      .select(col("vec_id").as("nn_id"), round(cosine(col("v"), col("qv")), 4).as("cos"))
      .orderBy(col("cos").desc, col("nn_id").asc)
      .limit(5)
  }

  /** Top-1 neighbor for each of the first 100 vectors (the batched form of
    * [[qAnnBrute]]): broadcast the query block, rank per query with a
    * window. Ground truth for the LSH variant. */
  def qNearestNeighbor(s: SparkSession, d: String): DataFrame = {
    val e = withVec(s, d)
    val q = e.filter(col("vec_id") < 100)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nn_id").asc)
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("nn_id"),
        round(cosine(col("v"), col("qv")), 4).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("nn_id"), col("cos"))
  }

  val LshPlanes = 16

  /** Deterministic pseudo-random hyperplane weights: plane p, dim k →
    * uniform in [-1, 1] derived from xxhash64 — no RNG state, reproducible
    * on any cluster. `v` must be the double vector column name. */
  val lshBucketExpr: Column = expr(
    s"""aggregate(
       |  sequence(0, ${LshPlanes - 1}), 0L,
       |  (acc, p) -> acc | if(
       |    aggregate(sequence(1, 64), cast(0.0 as double),
       |      (s, k) -> s + v[k - 1] *
       |        ((pmod(xxhash64('plane', p, k), 2001) - 1000) / 1000.0)) > 0,
       |    shiftleft(1L, p), 0L))""".stripMargin)

  /** LSH-bucketed ANN: assign every vector a 16-bit hyperplane-sign bucket,
    * then for each of the first 100 queries rank only same-bucket
    * candidates. Approximate (recall measured vs [[qNearestNeighbor]] in
    * tests); the scan-side work drops from |corpus| to |bucket|. */
  def qAnnLsh(s: SparkSession, d: String): DataFrame = {
    val e = withVec(s, d).withColumn("bucket", lshBucketExpr)
    val q = e.filter(col("vec_id") < 100)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nn_id").asc)
    e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("nn_id"),
        round(cosine(col("v"), col("qv")), 4).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("nn_id"), col("cos"), col("rn"))
  }
}
