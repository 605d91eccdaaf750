package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over an embedding column (array<float>).
  *
  * Brute-force cosine top-k is the exactness baseline: the query set is
  * broadcast, so the corpus scan is embarrassingly parallel with no
  * shuffle except the final per-query top-k. The scale path (LSH / IVF
  * bucketing) turns the cross product into a bucket equijoin.
  */
object Ann {

  /** Cosine similarity between two float-array columns, accumulated in
    * double via codegen'd higher-order functions (no UDF).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val nb = aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot / sqrt(na * nb)
  }

  /** s1: brute-force cosine top-k for a bounded query set (vec_id < 10)
    * against the corpus. Query side is broadcast; ranking is deterministic
    * (score desc, then neighbor id).
    */
  def s1CosineTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val queries = t.embeddings.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val corpus = t.embeddings
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    corpus
      .crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** d5: embedding-cosine near-duplicate pairs above a threshold. Pair
    * generation is the exact baseline; at scale the same predicate runs
    * inside LSH buckets.
    */
  def d5EmbeddingDedup(spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val a = e.select(col("vec_id").as("vec_id1"), col("embedding").as("e1"))
    val b = e.select(col("vec_id").as("vec_id2"), col("embedding").as("e2"))
    a.crossJoin(b)
      .filter(col("vec_id1") < col("vec_id2"))
      .filter(cosine(col("e1"), col("e2")) >= threshold)
      .select("vec_id1", "vec_id2")
      .orderBy("vec_id1", "vec_id2")
  }
}
