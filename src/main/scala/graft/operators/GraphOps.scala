package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph edge derivation — the Neo4j side of the reference re-expressed as
  * relational plans.
  *
  * The reference materializes relationship edges with Cypher self-joins:
  * SAME_HOMETOWN (mysql2neo4j.py:229-253), SCHOOLMATES (255-371) and
  * COLLEAGUES (373-489) are all "group people by an attribute, emit one
  * directed pair per unordered combination, annotate with interval
  * overlap". On Spark that is a group-bounded self-equijoin: the shuffle
  * key is the grouping attribute, pair explosion is bounded by group size,
  * and the interval arithmetic is a codegen'd column expression.
  */
object GraphOps {

  /** g1: all-pairs within a group with id1 < id2 dedup — SAME_HOMETOWN
    * (birth_place → nation as the grouping attribute).
    * Scale note: group-keyed self-equijoin; the shuffle key is the group
    * attribute and output is bounded by sum(|group|^2); pathological groups
    * would be capped/salted upstream.
    */
  def g1SameGroupPairs(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // Self-join on the compact int key; the group's display name is
    // broadcast-joined onto the (much larger) pair set afterwards, so the
    // pair shuffle carries three ints instead of strings.
    val c = t.customer.select(col("c_nationkey").as("grp"), col("c_custkey"))
    val left  = c.select(col("grp"), col("c_custkey").as("custkey1"))
    val right = c.select(col("grp"), col("c_custkey").as("custkey2"))
    left
      .join(right, Seq("grp"))
      .filter(col("custkey1") < col("custkey2"))
      .join(broadcast(t.nation.select(col("n_nationkey").as("grp"), col("n_name"))), Seq("grp"))
      .select(col("n_name").as("nation_name"), col("custkey1"), col("custkey2"))
      .orderBy("nation_name", "custkey1", "custkey2")
  }

  /** Skew-safe variant of within-group pair generation: block each group
    * into `nBlocks` salt buckets by id hash and enumerate the
    * (blockA ≤ blockB) block pairs, so one pathological group (a mega-city
    * birth_place, a giant employer) spreads over nBlocks·(nBlocks+1)/2
    * tasks instead of landing on a single reducer. Emits exactly the same
    * (grp, id1 < id2) pair set as the direct self-join — the equivalence
    * spec checks it against [[g1SameGroupPairs]]'s plain formulation.
    *
    * `df` must have columns (grp, id).
    */
  def blockedSameGroupPairs(df: DataFrame, nBlocks: Int): DataFrame = {
    val withBlock = df.select(col("grp"), col("id"), pmod(hash(col("id")), lit(nBlocks)).as("blk"))
    // Enumerate ordered block pairs (bA, bB) with bA <= bB; within equal
    // blocks the id1 < id2 filter dedups, across blocks the (bA, bB)
    // assignment is already unordered-unique.
    val blockPairs = (0 until nBlocks).flatMap(a => (a until nBlocks).map(b => (a, b)))
    val bp = df.sparkSession.createDataFrame(blockPairs).toDF("blkA", "blkB")
    val left = withBlock.select(col("grp"), col("id").as("id1"), col("blk").as("blkA"))
    val right = withBlock.select(col("grp"), col("id").as("id2"), col("blk").as("blkB"))
    left
      .join(broadcast(bp), Seq("blkA"))
      .join(right, Seq("grp", "blkB"))
      .filter(
        (col("blkA") < col("blkB") && col("id1") =!= col("id2")) ||
          (col("blkA") === col("blkB") && col("id1") < col("id2")))
      .select(col("grp"),
        least(col("id1"), col("id2")).as("id1"),
        greatest(col("id1"), col("id2")).as("id2"))
  }

  /** g2: interval-overlap pairs — COLLEAGUES/SCHOOLMATES semantics
    * (mysql2neo4j.py:399-466): same workplace, overlapping stints, overlap
    * period = [max(start1,start2), min(end1,end2)].
    *
    * Stints are derived per supplier from lineitem ship dates; workplace is
    * the supplier's nation. A map-side partial aggregate shrinks the fact
    * table to one row per supplier before the pair join.
    */
  def g2OverlapPairs(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val stints = t.lineitem
      .groupBy(col("l_suppkey"))
      .agg(min(col("l_shipdate")).as("start_d"), max(col("l_shipdate")).as("end_d"))
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"), col("start_d"), col("end_d"))
    val a = stints.select(col("n_name").as("grp"), col("s_suppkey").as("suppkey1"),
      col("start_d").as("s1"), col("end_d").as("e1"))
    val b = stints.select(col("n_name").as("grp"), col("s_suppkey").as("suppkey2"),
      col("start_d").as("s2"), col("end_d").as("e2"))
    a.join(b, Seq("grp"))
      .filter(col("suppkey1") < col("suppkey2"))
      .filter(col("s1") <= col("e2") && col("s2") <= col("e1"))
      .select(
        col("grp").as("nation_name"),
        col("suppkey1"), col("suppkey2"),
        greatest(col("s1"), col("s2")).as("overlap_start"),
        least(col("e1"), col("e2")).as("overlap_end"))
      .orderBy("nation_name", "suppkey1", "suppkey2")
  }

  /** g3: degree centrality on the customer–supplier bipartite graph
    * (Person–Org degree). Distinct-edge projection happens before the
    * count so the aggregate is over the edge set, not the fact table.
    */
  def g3Degree(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("custkey"), col("l_suppkey").as("suppkey"))
      .distinct()
      .groupBy(col("custkey"))
      .agg(count(lit(1)).as("degree"))
      .orderBy("custkey")
  }

  /** g4: 2-hop neighborhood size — customers reachable through a shared
    * supplier (schoolmates-of-schoolmates analog). The edge set is
    * deduplicated first; the hop is an equijoin on the shared endpoint.
    */
  def g4TwoHop(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val edges = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("custkey"), col("l_suppkey").as("suppkey"))
      .distinct()
    val e2 = edges.select(col("suppkey"), col("custkey").as("other"))
    edges
      .join(e2, Seq("suppkey"))
      .filter(col("custkey") =!= col("other"))
      // countDistinct (2-phase distinct aggregate keyed by custkey) instead
      // of a global pair distinct + count: one fewer full shuffle of the
      // pair explosion, which dominates on dense hubs. At 100 TB the hub
      // suppliers are the skew risk — AQE skew-join plus capping/salting
      // the middle vertex is the posture (see SURVEY §4).
      .groupBy("custkey")
      .agg(countDistinct(col("other")).as("n_two_hop"))
      .orderBy("custkey")
  }

  /** g8: iterative parent-pointer expansion over a generic child→parent
    * edge table (org BELONGS_TO chains, mysql2neo4j.py:204-227).
    * The loop shuffles once per level; depth is the tree height (not the
    * node count), so it scales to wide shallow hierarchies — exactly the
    * org-tree shape.
    */
  def expandHierarchy(edges: DataFrame): DataFrame = {
    // edges: (child: string, parent: string)
    //
    // Each level is eagerly localCheckpoint'ed: lineage is truncated every
    // iteration (no O(depth) plan growth) and each level's partitions are
    // materialized exactly once. The union of levels is checkpointed ONCE
    // at the end and every per-level block is then released — the result
    // holds one block set, not one per tree level (levels can't be
    // unpersisted lazily: a localCheckpoint has no lineage to recompute
    // from). The empty terminal frontier is dropped.
    val parentOf = edges.select(col("child").as("ancestor"), col("parent").as("next_parent"))
    var frontier = edges
      .select(col("child").as("node"), col("parent").as("ancestor"), lit(1).as("depth"),
        concat_ws("/", col("parent"), col("child")).as("path"))
      .localCheckpoint(true)
    val levels = scala.collection.mutable.ArrayBuffer(frontier)
    var continue = !frontier.isEmpty
    while (continue) {
      val next = frontier
        .join(parentOf, Seq("ancestor"))
        .select(col("node"), col("next_parent").as("ancestor"),
          (col("depth") + 1).as("depth"),
          concat_ws("/", col("next_parent"), col("path")).as("path"))
        .localCheckpoint(true)
      if (next.isEmpty) {
        continue = false
        next.unpersist()
      } else {
        levels += next
        frontier = next
      }
    }
    val out = levels.reduce(_.unionByName(_)).localCheckpoint(true)
    levels.foreach(_.unpersist())
    out
  }

  /** g8 driver-contract wrapper: customer→nation→region hierarchy, full
    * ancestor closure with depth and path.
    */
  def g8HierarchyPaths(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val custEdges = t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .select(concat(lit("c_"), col("c_custkey")).as("child"), col("n_name").as("parent"))
    val nationEdges = t.nation
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name").as("child"), col("r_name").as("parent"))
    expandHierarchy(custEdges.unionByName(nationEdges))
      .select("node", "ancestor", "depth", "path")
      .orderBy("node", "depth", "ancestor")
  }
}
