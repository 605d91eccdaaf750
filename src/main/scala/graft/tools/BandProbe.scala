package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Diagnostic main for the hamming band tier: prints the EXACT pre-join
  * quantities the candidate-volume router reasons about (frame count,
  * band-bucket count, Σ C(gsz,2) candidate mass, the biggest buckets,
  * and the router's trigger/threshold values) for m12's frame
  * fingerprints at a given SF dir — the measure half of
  * measure-then-route, runnable standalone when a decade sweep flags a
  * key. Usage: `runMain graft.tools.BandProbe <sfDir> [strideBytes]`.
  */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val stride = if (args.length > 1) args(1).toInt else 256
    val frameBytes = 64
    val spark = GraftSession.create("graft-band-probe")
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val media = Tables(spark, dir).documents
      .repartition(nPart)
      .select(col("doc_id"), graft.multimodal.Media.payload(col("doc_id"), col("text")).as("payload"))
    val sizes = media.agg(
      count(lit(1)), coalesce(sum(length(col("payload"))), lit(0L))).head()
    println(s"docs=${sizes.getLong(0)} payloadBytes=${sizes.getLong(1)}")
    val frames = media
      .select(
        col("doc_id"), col("payload"),
        posexplode(sequence(
          lit(0L),
          greatest(length(col("payload")).cast("long") - frameBytes, lit(0L)),
          lit(stride.toLong))))
      .select(
        (col("doc_id") * 1048576L + col("pos")).as("doc_id"),
        org.apache.spark.sql.graft.VectorExpressions
          .blockAvgHash60(expr(s"substring(payload, col + 1, $frameBytes)"))
          .as("phash"))
    val keyed = frames
      .select(col("doc_id"), col("phash"), posexplode(graft.dedup.Dedup.bands15(col("phash"))))
      .toDF("doc_id", "fp", "band_id", "band")
      .select((col("band_id").cast("long") * 32768L + col("band")).as("grp"))
    val g = keyed.groupBy("grp").agg(count(lit(1)).as("gsz")).cache()
    val pr = g.agg(
      coalesce(sum(expr("gsz * (gsz - 1) DIV 2")), lit(0L)),
      coalesce(sum(col("gsz")), lit(0L)),
      coalesce(max(col("gsz")), lit(0L)),
      count(lit(1))).head()
    val (mass, rows, maxSz, nGroups) =
      (pr.getLong(0), pr.getLong(1), pr.getLong(2), pr.getLong(3))
    val nItems = math.max(rows / 4, 1L)
    val candFactor = 20L
    val gszCut = math.max(2L, math.ceil(math.sqrt(2.0 * candFactor * nItems)).toLong)
    println(s"frames=$nItems bandRows=$rows groups=$nGroups mass=$mass maxGsz=$maxSz")
    println(s"budget=${candFactor * nItems} trigger=${mass > candFactor * nItems} " +
      s"gszCut=$gszCut overCut=${if (mass > candFactor * nItems) "?" else "n/a"}")
    val top = g.orderBy(col("gsz").desc).limit(12).collect()
      .map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
    println(s"topBuckets=$top")
    val over = g.filter(col("gsz") >= gszCut)
      .agg(count(lit(1)), coalesce(sum(expr("gsz * (gsz - 1) DIV 2")), lit(0L))).head()
    println(s"overGroups=${over.getLong(0)} overMass=${over.getLong(1)}")
    // What the router actually does: run the measured sub-split route and
    // re-probe the post-route mass (the row count the salted join WILL emit).
    val keyedFull = frames
      .select(col("doc_id"), col("phash"), posexplode(graft.dedup.Dedup.bands15(col("phash"))))
      .toDF("doc_id", "fp", "band_id", "band")
      .select(
        (col("band_id").cast("long") * 32768L + col("band")).as("grp"),
        struct(col("doc_id"), col("fp")).as("id"))
    val routed = graft.dedup.Dedup.subSplitKeys(keyedFull, 6, candFactor)
    val rp = routed.groupBy("grp").agg(count(lit(1)).as("gsz"))
      .agg(
        coalesce(sum(expr("gsz * (gsz - 1) DIV 2")), lit(0L)),
        coalesce(max(col("gsz")), lit(0L)),
        coalesce(max(expr("CAST(grp >= 131072 AS INT)")), lit(0))).head()
    println(s"routedMass=${rp.getLong(0)} routedMaxGsz=${rp.getLong(1)} splitAdopted=${rp.getInt(2) == 1}")
    spark.stop()
  }
}
