package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Z-order key semantics and the layout property it exists for: file-level
  * min-max pruning on EVERY dimension of a z-ordered write, vs a
  * single-column sort that prunes only its leading column.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("key interleaves bits: z(x,y) bit 2i = x_i, bit 2i+1 = y_i") {
    def ref(x: Long, y: Long): Long = {
      var out = 0L
      for (i <- 0 until 21) {
        if (((x >> i) & 1) == 1) out |= 1L << (2 * i)
        if (((y >> i) & 1) == 1) out |= 1L << (2 * i + 1)
      }
      out
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (12345L, 54321L),
      ((1L << 21) - 1, (1L << 21) - 1))
    val got = cases.toDF("x", "y")
      .select(ZOrder.key(21, col("x"), col("y"))).as[Long].collect().toSeq
    assert(got == cases.map { case (x, y) => ref(x, y) })
    // locality: adjacent cells in either dimension stay within a small
    // key distance at matching scales (bit i costs at most 2^(2i+2))
    assert(ref(5, 5) < ref(64, 64) && ref(64, 64) < ref(1000, 1000))
  }

  test("null in any dimension nulls the key") {
    val got = Seq((Some(1L), None: Option[Long]), (Some(1L), Some(1L)))
      .toDF("x", "y")
      .select(ZOrder.key(21, col("x"), col("y")).as("z"))
      .collect().map(r => r.isNullAt(0)).toSeq
    assert(got == Seq(true, false))
  }

  /** Files a min-max pruning reader must touch for a predicate, given the
    * per-file (min, max) of the filtered column.
    */
  private def filesTouched(dir: String, colName: String,
                           lo: Long, hi: Long): Int =
    spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min(col(colName)).as("mn"), max(col(colName)).as("mx"))
      .filter(col("mn") <= hi && col("mx") >= lo)
      .count().toInt

  test("z-ordered layout prunes files on BOTH dimensions; linear only on one") {
    val n = 40000
    val df = spark.range(n).select(
      (col("id") * 2654435761L % 1024).as("x"), // uniform, uncorrelated
      (col("id") * 40503L % 1024).as("y"))
    val files = 16

    val zDir = Files.createTempDirectory("graft_z").toString
    graft.operators.IndexStore.writeZOrdered(df, zDir, Seq("x", "y"),
      numFiles = files, bitsPer = 10)

    val linDir = Files.createTempDirectory("graft_lin").toString
    df.repartitionByRange(files, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)

    // one narrow band per dimension (1/8 of the value space)
    val zX = filesTouched(zDir, "x", 0, 127)
    val zY = filesTouched(zDir, "y", 0, 127)
    val linX = filesTouched(linDir, "x", 0, 127)
    val linY = filesTouched(linDir, "y", 0, 127)

    assert(linX <= 3, s"linear prunes its sort column (got $linX)")
    assert(linY == files, s"linear cannot prune the other dimension (got $linY)")
    // z-order prunes BOTH dimensions: an x- or y-band touches only the
    // files whose z-range intersects it (~files/4 + boundary files here)
    assert(zX <= files / 2, s"z-order x-band touched $zX of $files")
    assert(zY <= files / 2, s"z-order y-band touched $zY of $files")
  }

  test("non-BIGINT dimension fails at analysis time, not per row") {
    import org.apache.spark.sql.functions.col
    val df = spark.range(4).select(col("id").cast("int").as("x"))
    val raw = org.apache.spark.sql.GraftBridge.column(
      graft.functions.ZOrderExpr(
        Seq(org.apache.spark.sql.GraftBridge.expression(col("x"))), 8))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(raw).collect()
    }
    assert(err.getMessage.toLowerCase.contains("bigint"))
  }
}
