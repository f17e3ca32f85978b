package graft

/** Plan-audit main: prints the executed (physical) plan of the named
  * queries (default: all) against a small SF dir — the tool behind the
  * "explain, then iterate" loop: check PushedFilters reach the scans,
  * small join sides broadcast, and no stray exchange appears.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.create("local[4]", cores = 4)
    val names = if (args.nonEmpty) args.toSeq else Queries.all.keys.toSeq.sorted
    names.foreach { name =>
      println(s"===== $name =====")
      try println(Queries.all(name)(spark, sfDir)
        .queryExecution.executedPlan.toString.take(4000))
      catch { case e: Throwable => println(s"ERR ${e.getMessage}") }
    }
    spark.stop()
  }
}
