package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.Similarity

/** Vector primitives: dot/cosine exactness, int8 quantization round-trip
  * error bound and retrieval quality after quantization.
  */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dot and cosine: exact on known vectors, float/double mixes") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)))
      .toDF("f", "d")
    val row = df.select(
      VectorOps.dot(col("f"), col("d")).as("fd"),
      VectorOps.dot(col("d"), col("d")).as("dd"),
      VectorOps.cosine(col("f"), col("f")).as("cff")).head()
    assert(row.getDouble(0) == 32.0)
    assert(row.getDouble(1) == 77.0)
    assert(math.abs(row.getDouble(2) - 1.0) < 1e-12)
  }

  test("int8 quantization: round-trip error bounded by scale/2") {
    val emb = Tables.embeddings(spark, sf())
    val checked = emb.select(
      col("embedding").cast("array<double>").as("v"),
      VectorOps.quantizeInt8(col("embedding")).as("qs"))
      .select(col("v"), col("qs.scale").as("scale"),
        VectorOps.dequantizeInt8(col("qs")).as("r"))
      .select(
        aggregate(zip_with(col("v"), col("r"), (a, b) => abs(a - b)),
          lit(0.0d), (acc, x) => greatest(acc, x)).as("maxErr"),
        col("scale"))
    val bad = checked.filter(col("maxErr") > col("scale") * 0.5 + 1e-12).count()
    assert(bad == 0)
  }

  test("quantized top-k retrieval matches exact top-k closely") {
    val emb = Tables.embeddings(spark, sf())
    val deq = emb.select(col("vec_id"),
      VectorOps.dequantizeInt8(VectorOps.quantizeInt8(col("embedding")))
        .as("embedding"))
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, k = 5))
    val quant = pairs(Similarity.bruteForceTopK(deq, queries, k = 5))
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"quantized recall $recall")
  }
}
