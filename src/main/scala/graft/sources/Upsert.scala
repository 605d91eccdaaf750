package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch upsert-by-key: MERGE semantics for dimension maintenance.
  *
  * The reference's graph loader is MERGE-heavy — every node import is an
  * idempotent upsert (`MERGE (o:Organization {uuid: $uuid}) ON CREATE SET
  * ...`, mysql2neo4j.py:573; `MERGE (p:Person {uuid: $uuid})`, :631) and
  * workplace orgs are auto-created on first sight (`MERGE (o:Organization
  * {org_name: $place})`, :740). Re-expressed relationally that is
  * "dedupe-and-union write": union the incoming batch with the stored
  * dimension, keep exactly one row per key (newest version wins; at equal
  * version the incoming row wins, which is what makes a replayed batch a
  * no-op), and rewrite. Applying the same batch twice is bit-identical to
  * applying it once — the property the reference gets from MERGE.
  *
  * Scale shape: one shuffle on the key; the keep-one window filters
  * `row_number = 1`, which Spark 4 plans as WindowGroupLimit (per-map-task
  * top-1, no per-key sort materialization) — and keys are high-cardinality
  * by construction (they identify dimension rows), so there is no
  * low-cardinality stratum hazard. The rewrite cost is the dimension
  * table, not the fact corpus; at very large dimensions store the table
  * bucketed by key ([[Bucketing]]) so the merge window rides the bucket
  * layout without an exchange, and rewrite only the buckets an incoming
  * key touches.
  */
object Upsert {

  /** Pure merge: one row per `keys`, ordered by `versionCol` descending
    * with incoming beating existing on ties. Columns are aligned by name;
    * both sides must share the schema. Two same-side rows tied on
    * (key, version) fall back to a content-hash order so the pick is
    * deterministic across runs and cluster sizes (for byte-identical
    * duplicates the pick is immaterial; for conflicting same-version
    * writes it is at least stable — a real pipeline should version
    * writes uniquely).
    */
  def upsertByKey(
      existing: DataFrame,
      incoming: DataFrame,
      keys: Seq[String],
      versionCol: String): DataFrame = {
    val cols = existing.columns.toSeq
    require(incoming.columns.toSeq.sorted == cols.sorted,
      s"schema mismatch: ${cols.sorted} vs ${incoming.columns.toSeq.sorted}")
    val tagged = existing.withColumn("_src", lit(0))
      .unionByName(incoming.withColumn("_src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc,
        hash(struct(cols.map(col): _*)).asc)
    tagged
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(cols.map(col): _*)
  }

  /** Apply a batch to a stored parquet dimension at `path`: read-if-there
    * (first batch auto-creates the table — the :740 MERGE-on-first-sight
    * behavior), merge, and atomically swap the directory so readers never
    * observe a half-written table. Idempotent under replay.
    */
  def applyBatch(
      spark: SparkSession,
      path: String,
      incoming: DataFrame,
      keys: Seq[String],
      versionCol: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val merged =
      if (fs.exists(target)) upsertByKey(spark.read.parquet(path), incoming, keys, versionCol)
      else incoming.transform(df =>
        // First sight: still dedupe the batch itself so a key appearing
        // twice in one batch resolves exactly like it would across batches.
        upsertByKey(df.limit(0), df, keys, versionCol))
    val tmp = new Path(path + ".tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(target)) fs.delete(target, true)
    require(fs.rename(tmp, target), s"atomic swap failed for $path")
  }

  /** SCD Type-2 view of a version history: every version of a key is
    * kept as its own row, annotated with the interval it was current for
    * — `valid_to` = the NEXT version's start (null while current) via one
    * `lead` window, `is_current` on the open row. This is the
    * history-keeping sibling of [[upsertByKey]] (which keeps only the
    * winner): the reference's loader overwrites node properties on
    * re-import (MERGE ... SET), losing the old value; a warehouse
    * dimension usually needs the old value queryable as of any version —
    * "which org level did this person's workplace have when the career
    * event was recorded" is an as-of join against exactly this view.
    *
    * The window partitions by the dimension key — high-cardinality by
    * construction, a handful of versions per key — so the per-key sort
    * is bounded and there is no low-cardinality stratum hazard.
    */
  def scd2(history: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol).asc)
    history
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
  }

  /** h1: the MERGE itself as a driver-keyed query — refresh the customer
    * dimension from order activity. Existing = the stored customer rows
    * (version 0); incoming = one updated row per customer WITH orders,
    * account balance bumped by their total spend (version 1). The merge
    * keeps the updated row where one exists and the original otherwise —
    * exactly the loader's "MERGE ... ON MATCH SET" shape
    * (mysql2neo4j.py:573,631) expressed as [[upsertByKey]], with an ANSI
    * union + QUALIFY oracle cross-checking the resolution.
    */
  def h1UpsertDim(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.Tables(spark, dir)
    val existing = t.customer.select(
      col("c_custkey").as("custkey"), col("c_name").as("name"),
      col("c_acctbal").as("acctbal"), lit(0L).as("version"))
    // Money math through DECIMAL(18,2) so the refreshed balance is
    // bit-identical across engines (double sums are order-dependent).
    val spend = t.orders.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
    val incoming = t.customer
      .join(spend, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
        (col("c_acctbal").cast("decimal(18,2)") + col("spend"))
          .cast("double").as("acctbal"),
        lit(1L).as("version"))
    upsertByKey(existing, incoming, Seq("custkey"), "version")
  }

  /** AS-OF dimension join — the query surface of [[scd2]]: every fact
    * row picks the dimension version that was current AT ITS TIME (the
    * latest version with `version ≤ fact time`), the lookup every
    * warehouse query against a versioned dimension needs ("which tier
    * was this customer in when the order was placed").
    *
    * Scale shape: the union-window trick (same construction as the e5
    * event as-of join) — dimension versions and fact rows union into one
    * stream tagged so a version sorts before the facts of its own time,
    * ONE window partitioned by the dimension key carries the latest
    * version's attribute forward (`last_value` ignoreNulls), and facts
    * are filtered back out. One shuffle on the key, no time-range join
    * and no per-fact version explosion; the per-key sort is bounded by
    * (versions + facts) per key — dimension keys are high-cardinality by
    * construction, so there is no low-cardinality stratum hazard.
    * Facts older than their key's first version keep a NULL attribute
    * (unattributed, not dropped).
    */
  def scdAsofJoin(
      dims: DataFrame,     // (key, t, attr)
      facts: DataFrame,    // (id, key, t)
      keyCol: String,
      timeCol: String,
      attrCol: String): DataFrame = {
    val tagged = dims.select(
      col(keyCol), col(timeCol), lit(0L).as("_tag"), col(attrCol).as("_attr"),
      lit(null).cast("long").as("id"))
      .unionByName(facts.select(
        col(keyCol), col(timeCol), lit(1L).as("_tag"),
        lit(null).cast(dims.schema(attrCol).dataType).as("_attr"), col("id")))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("_tag").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn(attrCol, last(col("_attr"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(col("id"), col(keyCol), col(timeCol), col(attrCol))
  }

  /** h4: [[scdAsofJoin]] driver-keyed — a spend-tier dimension versioned
    * only in EVEN years (1996/1998/2000: annual DECIMAL spend bucketed to
    * tiers 1–4), joined as-of onto every order: odd-year orders carry the
    * previous even year's tier forward, orders before a customer's first
    * version stay NULL-tier. The sparse version years are what make the
    * as-of nontrivial (a version for every year would degenerate to an
    * equijoin).
    */
  def h4ScdAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.Tables(spark, dir)
    val withYear = t.orders.withColumn("yr", year(col("o_orderdate")).cast("long"))
    val dims = withYear
      .filter(col("yr") % 2 === 0)
      .groupBy(col("o_custkey").as("custkey"), col("yr"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
      .withColumn("tier",
        when(col("spend") < 100000, 1L)
          .when(col("spend") < 300000, 2L)
          .when(col("spend") < 500000, 3L)
          .otherwise(4L))
    val facts = withYear.select(
      col("o_orderkey").as("id"), col("o_custkey").as("custkey"), col("yr"))
    scdAsofJoin(dims, facts, "custkey", "yr", "tier")
      .select(col("id").as("orderkey"), col("custkey"), col("yr").as("year"), col("tier"))
  }

  /** Snapshot diff — CDC between two keyed snapshots of a dimension.
    * The reference maintains its graph by re-importing whole MySQL tables
    * and letting MERGE sort out what changed (mysql2neo4j.py:573,631);
    * the relational way to see *what the re-import actually did* is a
    * keyed diff of consecutive snapshots: `insert` (key only in B),
    * `delete` (key only in A), `update` (key in both, any tracked column
    * differs). Unchanged keys are dropped — the output is the change
    * feed a downstream incremental consumer (or an audit log) wants,
    * sized by the churn, not the dimension.
    *
    * Scale shape: ONE full outer join on the key — co-partitioned, a
    * single shuffle of each snapshot; the change classification is a
    * projection over the joined row (null-side tests + column compares),
    * no second pass. Store both snapshots bucketed by key
    * ([[Bucketing]]) and the join rides the layout exchange-free. The
    * compare uses null-safe equality (`<=>`) so a null-vs-value change
    * is an update, not a silently-equal row.
    */
  def snapshotDiff(
      snapA: DataFrame,
      snapB: DataFrame,
      keys: Seq[String]): DataFrame = {
    val cols = snapA.columns.toSeq
    require(snapB.columns.toSeq.sorted == cols.sorted,
      s"schema mismatch: ${cols.sorted} vs ${snapB.columns.toSeq.sorted}")
    val vals = cols.filterNot(keys.contains)
    val a = snapA.select(cols.map(c => col(c).as(s"a_$c")): _*)
    val b = snapB.select(cols.map(c => col(c).as(s"b_$c")): _*)
    val joinCond = keys.map(k => col(s"a_$k") === col(s"b_$k")).reduce(_ && _)
    val inA = col(s"a_${keys.head}").isNotNull
    val inB = col(s"b_${keys.head}").isNotNull
    val changed = vals.map(c => !(col(s"a_$c") <=> col(s"b_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    a.join(b, joinCond, "full_outer")
      .withColumn("change",
        when(!inA, lit("insert"))
          .when(!inB, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change").isNotNull)
      .select(
        keys.map(k => coalesce(col(s"a_$k"), col(s"b_$k")).as(k)) ++
          Seq(col("change")) ++
          vals.flatMap(c => Seq(col(s"a_$c").as(s"old_$c"), col(s"b_$c").as(s"new_$c"))): _*)
  }

  /** h3: [[snapshotDiff]] driver-keyed — the "active customer" dimension
    * (per-customer order count + DECIMAL spend over a sliding 3-year
    * window) evaluated at two dates one year apart, diffed by custkey.
    * Customers whose orders all predate the new window drop out
    * (`delete`), first-time orderers appear (`insert`), the rest with
    * any order churn re-aggregate differently (`update`); identical
    * rows vanish from the feed. Spend stays DECIMAL(18,2) end to end so
    * the update predicate is bit-exact across engines.
    */
  def h3SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.Tables(spark, dir)
    def activeDim(lo: String, hi: String): DataFrame = t.orders
      .filter(col("o_orderdate") >= lit(lo) && col("o_orderdate") < lit(hi))
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
    // Diff and change-compare run on exact DECIMAL; doubles only at the
    // output boundary (the q1/h1 convention).
    snapshotDiff(
      activeDim("1995-01-01", "1998-01-01"),
      activeDim("1996-01-01", "1999-01-01"),
      Seq("custkey"))
      .select(col("custkey"), col("change"),
        col("old_n_orders"), col("new_n_orders"),
        col("old_spend").cast("double").as("old_spend"),
        col("new_spend").cast("double").as("new_spend"))
  }

  /** h2: the same refresh as [[h1UpsertDim]] kept as SCD2 HISTORY —
    * customers with orders carry both the superseded v0 row (closed
    * interval) and the current v1 row; customers without orders stay on
    * their open v0 row. The as-of query surface of the dimension.
    */
  def h2Scd2Dim(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.Tables(spark, dir)
    val existing = t.customer.select(
      col("c_custkey").as("custkey"), col("c_name").as("name"),
      col("c_acctbal").as("acctbal"), lit(0L).as("version"))
    val spend = t.orders.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
    val incoming = t.customer
      .join(spend, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
        (col("c_acctbal").cast("decimal(18,2)") + col("spend"))
          .cast("double").as("acctbal"),
        lit(1L).as("version"))
    scd2(existing.unionByName(incoming), Seq("custkey"), "version")
  }

  /** h6: referential-integrity AUDIT across the star schema — per FK
    * relationship, how many child rows point at a parent that isn't
    * there (and how many distinct such keys). This is the ingest gate
    * between an upsert-maintained dimension store and a continuously
    * landing fact stream: facts can reference dimension keys whose
    * upsert batch hasn't arrived yet (the reference auto-creates such
    * parents on first sight — MERGE on org_name, mysql2neo4j.py:740 —
    * precisely because its fact feed outruns its dimension feed), and
    * the audit is what tells an operator whether that's a trickle or a
    * broken upstream. The in-flight condition is simulated
    * deterministically: customers with `c_custkey % 50 == 0` haven't
    * landed yet, so orders→customer shows real orphans while the other
    * relationships audit clean (both branches non-vacuous).
    *
    * Shape per relationship: project both sides to the key, ONE left
    * join (parent side distinct + broadcast-eligible; the fact side is
    * the only big scan), and a fully partial-aggregable count/
    * conditional-count — no row wider than a key ever moves. At 100 TB
    * run the parent probe through [[graft.dedup.Dedup.d16BloomPrefilter]]'s
    * filter expression first so only maybe-orphans reach the join.
    */
  def h6FkAudit(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.Tables(spark, dir)
    val arrived = t.customer.filter(pmod(col("c_custkey"), lit(50)) =!= 0)
    def audit(name: String, child: DataFrame, key: String,
              parent: DataFrame, pkey: String): DataFrame =
      child.select(col(key).as("k"))
        .join(parent.select(col(pkey).as("k")).distinct().withColumn("present", lit(1)),
          Seq("k"), "left")
        .agg(
          count(lit(1)).as("n_child"),
          sum(when(col("present").isNull, 1L).otherwise(0L)).as("n_orphans"),
          countDistinct(when(col("present").isNull, col("k"))).as("n_orphan_keys"))
        .select(lit(name).as("relationship"),
          col("n_child"), col("n_orphans"), col("n_orphan_keys"))
    audit("lineitem->orders", t.lineitem, "l_orderkey", t.orders, "o_orderkey")
      .unionByName(audit("lineitem->part", t.lineitem, "l_partkey", t.part, "p_partkey"))
      .unionByName(audit("lineitem->supplier", t.lineitem, "l_suppkey", t.supplier, "s_suppkey"))
      .unionByName(audit("orders->customer", t.orders, "o_custkey", arrived, "c_custkey"))
      .unionByName(audit("customer->nation", t.customer, "c_nationkey", t.nation, "n_nationkey"))
      .orderBy("relationship")
  }
}
