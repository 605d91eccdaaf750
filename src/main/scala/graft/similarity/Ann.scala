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

  /** Cosine similarity between two float-array columns — the native
    * codegen'd Catalyst expression (see
    * [[org.apache.spark.sql.graft.VectorExpressions]]); bit-identical to the HOF
    * reference formulation below, ~50× faster on all-pairs joins.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.cosineNative(a, b)

  /** Reference formulation via higher-order functions (interpreted; kept
    * for the equivalence spec and as executable documentation).
    */
  def cosineHof(a: Column, b: Column): Column = {
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
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val corpus = t.embeddings.repartition(nPart)
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
    // One parquet file = one input split: repartition the streamed side so
    // the O(n²) cosine scan uses every core, not one task.
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val a = e.repartition(nPart).select(col("vec_id").as("vec_id1"), col("embedding").as("e1"))
    val b = e.select(col("vec_id").as("vec_id2"), col("embedding").as("e2"))
    a.crossJoin(b)
      .filter(col("vec_id1") < col("vec_id2"))
      .filter(cosine(col("e1"), col("e2")) >= threshold)
      .select("vec_id1", "vec_id2")
      .orderBy("vec_id1", "vec_id2")
  }

  /** s2: LSH-bucketed ANN — random-hyperplane signatures turn the
    * all-pairs scan into a bucket equijoin: the shuffle key is the bucket
    * id, and search cost per query is the bucket size, not the corpus.
    *
    * Hyperplanes are the first `nPlanes` corpus vectors (deterministic and
    * oracle-reproducible); the signature bit j is sign(cos(v, h_j)). The
    * hyperplane set is broadcast, so bucketing is a shuffle-free scan.
    */
  def s2LshAnn(
      spark: SparkSession,
      dir: String,
      k: Int = 10,
      nPlanes: Int = 4,
      multiProbe: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val planes = t.embeddings.filter(col("vec_id") < nPlanes)
      .select(col("vec_id").as("h_id"), col("embedding").as("h_emb"))
    val bucketed = t.embeddings
      .crossJoin(broadcast(planes))
      .groupBy(col("vec_id"))
      .agg(
        first(col("embedding")).as("emb"),
        sum(when(cosine(col("embedding"), col("h_emb")) >= 0,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(h_id AS INT))")).otherwise(0L)).as("bucket"))
    // Multi-probe: each query additionally probes every hamming-1
    // neighbor bucket (one signature bit flipped). Near-misses — a
    // neighbor on the far side of exactly one hyperplane — become
    // reachable, lifting recall at the cost of nPlanes+1 probe keys per
    // query instead of 1. Probe buckets are distinct and each corpus
    // vector lives in exactly one bucket, so no candidate dedup is
    // needed. This is the standard recall lever at scale: recall grows
    // with probe count, while the search stays a bucket equijoin.
    val probes =
      if (!multiProbe) Seq(col("bucket"))
      else col("bucket") +: (0 until nPlanes).map(j => col("bucket").bitwiseXOR(lit(1L << j)))
    val queries = bucketed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        explode(array(probes: _*)).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    bucketed
      .select(col("vec_id").as("neighbor_id"), col("emb").as("n_emb"), col("bucket"))
      .join(queries, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** s3: IVF-style ANN — assign every vector to its nearest of `nCells`
    * fixed centroids (argmax cosine, deterministic tie-break on centroid
    * id), then search only the query's own cell. Centroids are the first
    * `nCells` corpus vectors, broadcast; the cell id is the shuffle key.
    * At 100 TB the same plan holds with k-means centroids in place of the
    * fixed ones — assignment stays a broadcast scan.
    */
  def s3CentroidIvf(spark: SparkSession, dir: String, k: Int = 10, nCells: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val centroids = t.embeddings.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_sim").desc, col("cent_id").asc)
    val assigned = t.embeddings
      .crossJoin(broadcast(centroids))
      .withColumn("c_sim", cosine(col("embedding"), col("c_emb")))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("embedding").as("emb"), col("cent_id").as("cell"))
    val queries = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"), col("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    assigned
      .select(col("vec_id").as("neighbor_id"), col("emb").as("n_emb"), col("cell"))
      .join(queries, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }
}
