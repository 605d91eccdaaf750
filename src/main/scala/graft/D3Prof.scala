package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions
object D3Prof {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.create("d3prof")
    val t = Tables(spark, dir)
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"D3PROF $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // warm
    t.documents.count()
    time("sig_only") {
      t.documents.filter(length(col("text")) >= 5)
        .select(col("doc_id"), VectorExpressions.minhashSignature(col("text"), 5, 128).as("sig"))
        .write.format("noop").mode("overwrite").save()
    }
    time("banded") {
      t.documents.filter(length(col("text")) >= 5)
        .select(col("doc_id"), VectorExpressions.minhashSignature(col("text"), 5, 128).as("sig"))
        .select(col("doc_id"), explode(sequence(lit(0), lit(31))).as("band_id"), col("sig"))
        .select(col("doc_id"), col("band_id"), hash(slice(col("sig"), col("band_id") * 4 + 1, lit(4))).as("band_hash"))
        .write.format("noop").mode("overwrite").save()
    }
    val shingles = (c: org.apache.spark.sql.Column) =>
      array_distinct(transform(sequence(lit(1), length(c) - 4), i => substring(c, 1, 0).substr(i, lit(5))))
    time("grams_build") {
      t.documents.filter(length(col("text")) >= 5)
        .select(col("doc_id"), sort_array(array_distinct(
          transform(sequence(lit(1), length(col("text")) - 4), i => col("text").substr(i, lit(5))))).as("grams"))
        .write.format("noop").mode("overwrite").save()
    }
    time("full_d3") {
      dedup.Dedup.d3MinHashLsh(spark, dir).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
