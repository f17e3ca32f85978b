package graft

import org.apache.spark.sql.functions._

/** The multimodal-tier execution-shape profile (the r9–r11 review
  * item's measurement): the SAME planted GIF corpus decoded two ways —
  *  (a) the shipped `mapPartitions` extractor
  *      ([[graft.operators.Multimodal.extractGifFeatures]]), and
  *  (b) the native-expression alternative
  *      ([[graft.functions.GifStatsExpr]], the `BpeEncodeExpr` recipe
  *      applied to a stateful binary decode)
  * — interleaved min-of-N wall-clock per path, printed as one JSON
  * line. Both shapes are map-only scan projections with no shuffle;
  * the question the number answers is whether the `mapPartitions`
  * row-conversion boundary costs anything material next to the decode
  * work itself. The decision and the measured figures live in
  * `Multimodal.scala`'s header.
  */
object MultimodalProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "5").toInt
    val spark = GraftSession.create(s"local[$cpus]", cores = cpus)
    spark.range(1L << 20).selectExpr("sum(id)").collect()

    val media = Queries.plantedGifMedia(spark, sfDir)
    def viaMapPartitions(): Long =
      graft.operators.Multimodal.extractGifFeatures(media)
        .queryExecution.toRdd.count()
    def viaExpression(): Long = {
      val stats = org.apache.spark.sql.GraftBridge.column(
        graft.functions.GifStatsExpr(
          org.apache.spark.sql.GraftBridge.expression(col("payload"))))
      media.select(col("media_id"), stats.as("s"))
        .select(col("media_id"), col("s.width"), col("s.height"),
          col("s.channels"), col("s.px_sum"), col("s.px_chk"))
        .queryExecution.toRdd.count()
    }

    // one untimed warm-up of each path (codegen + JIT), then
    // interleaved timed passes
    viaMapPartitions(); viaExpression()
    val mp = collection.mutable.ArrayBuffer.empty[Double]
    val ex = collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to runs) {
      var t0 = System.nanoTime(); viaMapPartitions()
      mp += (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); viaExpression()
      ex += (System.nanoTime() - t0) / 1e9
    }
    def fmt(xs: Seq[Double]) =
      xs.map(x => (math.round(x * 1000) / 1000.0).toString)
        .mkString("[", ",", "]")
    println(s"""{"metric":"multimodal_shape","sf":"$sfDir","runs":$runs,""" +
      s""""map_partitions_sec":${fmt(mp.toSeq)},""" +
      s""""expression_sec":${fmt(ex.toSeq)},""" +
      s""""map_partitions_min":${mp.min},"expression_min":${ex.min}}""")
    spark.stop()
  }
}
