package graft.tools
import graft.GraftSession
object M12Count {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("m12-count")
    val n = graft.multimodal.Media.m12FrameNearDup(spark, args(0)).count()
    println(s"M12_PAIRS=$n")
    spark.stop()
  }
}
