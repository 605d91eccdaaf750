package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Lexical retrieval over the documents corpus — the BM25 complement of
  * the s-family's vector search (a curation pipeline needs BOTH: ANN for
  * semantic neighbors, term scoring for exact-phrase recall, and hybrid
  * fusion downstream).
  *
  * The plan is the distributed inverted-index scoring shape: one explode
  * over the corpus (linear), two hash aggregates build the postings
  * (term, doc → tf) and the doc-length table, the query-term table
  * broadcasts (queries are always tiny next to the corpus), and the
  * scoring equijoin touches ONLY the postings of query terms — at 100 TB
  * the postings table is the persisted artifact (bucketed by term, the
  * SignatureIndex posture) and the corpus scan disappears from the query
  * path entirely; here the index build rides the same job so the driver
  * gate covers end-to-end. Top-k per query plans as WindowGroupLimit
  * (map-side partial top-k), so a query term that matches every document
  * never materializes a full sorted partition.
  *
  * Scoring is EXACT fixed-point integer BM25 (Robertson et al.'s Okapi
  * formula with the standard k1=1.2, b=0.75 as the rationals 6/5 and
  * 3/4): with r = dl/avgdl, the term score is
  *   idf · (k1+1)·tf / (tf + k1·(1−b+b·r)) = idf · 22·tf / (10·tf+3+9·r)
  * carried in millis/micros via floor division only — no float anywhere,
  * so the ranking is bit-reproducible on any engine (the DuckDB oracle
  * re-derives every score) and ties break on doc_id deterministically.
  * The idf is the raw Robertson–Spärck Jones form ((N−df+½)/(df+½) as
  * exact ×2 integers) without the log: monotone in df, so rankings for
  * single-term matches are identical to the log form, and the oracle
  * needs no transcendental (whose libm rounding differs across engines).
  *
  * Queries are synthesized deterministically from the corpus itself (the
  * top 2·Q most frequent ≥5-char tokens, paired in frequency order) so
  * the gate needs no side input.
  */
object Retrieval {

  /** s8: top-k BM25 documents per synthesized 2-term query.
    * Output: (qid, doc_id, score_micro, n_terms, rnk).
    */
  def s8Bm25TopK(
      spark: SparkSession,
      dir: String,
      nQueries: Int = 4,
      k: Int = 5): DataFrame = {
    val docs = Tables(spark, dir).documents.select(col("doc_id"), col("text"))
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) >= 5)
    val tf = tok.groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val dfs = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cnt"))

    // Corpus scalars: two bounded driver values (the q13/k-means pattern).
    val nDocs = docs.count()
    val totalTokens = dl.agg(coalesce(sum(col("dl")), lit(0L))).head().getLong(0)
    val avgdlMilli = totalTokens * 1000L / math.max(nDocs, 1L)

    // Deterministic query synthesis: the 2·Q most frequent terms in
    // (cnt DESC, token) order, paired adjacently → Q two-term queries.
    // The global sort runs on the tiny dfs aggregate, then limit(2Q)
    // rows get their rank on a single row_number over one partition —
    // 8 rows, not a corpus sort.
    val ranked = dfs.orderBy(col("cnt").desc, col("token")).limit(2 * nQueries)
      .withColumn("rn",
        row_number().over(Window.orderBy(col("cnt").desc, col("token"))))
    val qt = ranked.select(expr("CAST((rn - 1) DIV 2 AS BIGINT)").as("qid"),
      col("token"), col("df"))

    val scored = tf
      .join(broadcast(qt), Seq("token"))
      .join(dl, Seq("doc_id"))
      .withColumn("idf_milli",
        expr(s"(2 * (${nDocs}L - df) + 1) * 1000 DIV (2 * df + 1)"))
      .withColumn("r_milli", expr(s"dl * 1000000 DIV ${avgdlMilli}L"))
      .withColumn("tfpart_milli",
        expr("22000000 * tf DIV (10000 * tf + 3000 + 9 * r_milli)"))
      .withColumn("term_score", expr("idf_milli * tfpart_milli DIV 1000"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("term_score")).as("score_micro"),
        count(lit(1)).as("n_terms"))

    scored
      .withColumn("rnk",
        row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("score_micro").desc, col("doc_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy("qid", "rnk")
  }
}
