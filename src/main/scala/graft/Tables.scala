package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central loaders for the driver-generated star schema.
  *
  * One place for reads means one place for column pruning and (on a real
  * cluster) for switching the scan to a bucketed / partitioned layout
  * without touching operators.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def load(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = load("region")
  def nation: DataFrame     = load("nation")
  def customer: DataFrame   = load("customer")
  def supplier: DataFrame   = load("supplier")
  def part: DataFrame       = load("part")
  def orders: DataFrame     = load("orders")
  def lineitem: DataFrame   = load("lineitem")
  /** `ts` arrives as parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to its microsecond TimestampType; reading it as a raw nanosecond long
    * keeps full precision and exact integer arithmetic downstream. The conf
    * is runtime-settable, so this works under any caller's session.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load("events") // ts: bigint (nanoseconds since epoch, UTC)
  }
  def documents: DataFrame  = load("documents")
  def embeddings: DataFrame = load("embeddings")
}
