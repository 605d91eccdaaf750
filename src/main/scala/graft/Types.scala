package graft

import java.sql.Timestamp

/** Case classes for the star schema — the typed (`Dataset[T]`) face of
  * [[Tables]]. Field names and types mirror the parquet schemas exactly so
  * `.as[T]` is a metadata-only cast (no extra projection), and downstream
  * typed transformations (`groupByKey`, `mapGroups`, `mapPartitions`) get
  * compile-time row shapes.
  */
object Types {
  final case class Region(r_regionkey: Int, r_name: String)
  final case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
  final case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
    c_acctbal: Double, c_mktsegment: String)
  final case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int, s_acctbal: Double)
  final case class Part(p_partkey: Long, p_name: String, p_brand: String, p_type: String,
    p_size: Int, p_retailprice: Double)
  final case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)
  final case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
    l_linenumber: Int, l_quantity: Double, l_extendedprice: Double, l_discount: Double,
    l_tax: Double, l_returnflag: String, l_linestatus: String, l_shipdate: Timestamp)
  final case class Document(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
  final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)
  /** `ts` is the raw nanosecond epoch (see [[Tables.events]]). */
  final case class Event(event_id: Long, ts: Long, user_id: Long, event_type: String,
    value: Double, props: String)
}
