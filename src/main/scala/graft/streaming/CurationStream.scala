package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Input row of the streaming sampler: content hash precomputed as a
  * codegen'd column BEFORE the typed boundary, so the state op never
  * hashes inside the JVM loop.
  */
final case class DocSig(doc_id: Long, lang: String, h: String)

/** Per-lang reservoir carried between micro-batches: the `cap` smallest
  * (md5, doc_id) keys seen so far — O(cap) state per stratum forever,
  * which is what makes the streaming form runnable against an unbounded
  * crawl feed.
  */
final case class SampleState(hs: Seq[String], ids: Seq[Long], version: Long)

/** Emitted sample row; `version` identifies the emitting micro-batch
  * (monotone per lang) so a consumer — and the agreement spec — can take
  * each stratum's latest snapshot.
  */
final case class SampleRow(doc_id: Long, lang: String, sample_rank: Long, version: Long)

/** Structured Streaming forms of the curation-path projections (t21 hash
  * split, t13 stratified sample) — the batch/stream parity story for the
  * split/sample stage: a corpus split computed on an unbounded crawl feed
  * must equal the batch split of the accumulated corpus, or
  * dedup-then-split and split-then-dedup diverge between the two modes.
  */
object CurationStream {

  /** Streaming t21: the content-keyed split is a stateless deterministic
    * projection (md5 prefix → permille → split label), so the streaming
    * form IS the batch expression applied to an unbounded frame — no
    * state, no watermark, append mode. Rows land in the same split
    * whenever and wherever they arrive.
    */
  def hashSplitStream(docs: DataFrame): DataFrame =
    graft.functions.TextFuncs.hashSplitCore(docs)

  /** Streaming t22: the composite curation verdict is a pure per-row
    * projection (every signal — quality bounds, repetition fold,
    * language argmax — is row-local), so the streaming form IS the batch
    * core on an unbounded frame: classify-in-flight for a streaming
    * ingest, append mode, no state, no watermark. A record's verdict is
    * identical whenever it arrives — which is what makes the batch
    * backfill and the live path produce one consistent corpus.
    */
  def curationVerdictStream(docs: DataFrame): DataFrame =
    graft.functions.TextFuncs.curationVerdictCore(docs)

  /** Streaming t13: bounded per-stratum reservoir via
    * `flatMapGroupsWithState` — each micro-batch merges the stratum's new
    * (md5, doc_id) keys into the `cap` smallest seen so far and emits the
    * stratum's CURRENT sample (rank-stamped, version-stamped). Converges
    * to exactly the batch t13 sample of the accumulated input, because
    * "cap smallest content-hash keys" is a commutative/associative fold
    * over any arrival order — the same reason the batch form is
    * re-crawl-stable. State is O(cap) per lang with no timeout: strata
    * are few and long-lived (this is the `mapGroupsWithState` analog of a
    * streaming top-k, not a sessionization).
    */
  def stratifiedSampleStream(docs: DataFrame, cap: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("lang"), md5(col("text")).as("h"))
      .as[DocSig]
      .groupByKey(_.lang)
      .flatMapGroupsWithState[SampleState, SampleRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (lang, rows, state) =>
        val prev = state.getOption.getOrElse(SampleState(Nil, Nil, 0L))
        // distinct before take: replayed rows (at-least-once upstream)
        // must not occupy two reservoir slots.
        val merged = (prev.hs.zip(prev.ids) ++ rows.map(r => (r.h, r.doc_id)))
          .distinct.sortBy(identity)
          .take(cap)
        val next = SampleState(merged.map(_._1), merged.map(_._2), prev.version + 1)
        state.update(next)
        merged.iterator.zipWithIndex.map { case ((_, id), i) =>
          SampleRow(id, lang, i + 1L, next.version)
        }
      }
      .toDF()
  }

  /** Streaming half of the t24 drift monitor: the live feed's per-term
    * token counts as a streaming aggregate (update mode — each
    * micro-batch emits the strata it touched; state is vocab-bounded,
    * never corpus-bounded). The drift report against the reference
    * crawl's static count table closes per micro-batch in the sink via
    * [[graft.functions.TextFuncs.driftFromCounts]] — counts are the
    * mergeable state, drift the cheap projection, so the in-flight
    * monitor and the batch backfill read the SAME numbers (agreement
    * spec: accumulated stream counts ≡ batch `termCountsOf`, hence
    * identical drift rows).
    */
  def termCountsStream(docs: DataFrame): DataFrame =
    graft.functions.TextFuncs.termCountsOf(docs)

  /** Streaming s6 assignment: centroids are FROZEN state trained
    * batch-side ([[graft.similarity.Cluster.trainExact]]); assignment is
    * the same zero-shuffle integer-exact projection, so the streaming
    * form IS the batch expression on an unbounded embedding feed —
    * append mode, no state, no watermark. Because the arithmetic is
    * exact, a vector gets the SAME cluster whether it arrives in the
    * training corpus, a later batch backfill, or the live stream — the
    * property that keeps cluster-balanced sampling consistent between
    * modes.
    */
  def clusterAssignStream(emb: DataFrame, cents: Seq[(Long, Seq[Long], Long)]): DataFrame =
    graft.similarity.Cluster.assignFrozen(emb, cents)
}
