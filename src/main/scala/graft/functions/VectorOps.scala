package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `ArrayType` embedding columns, built from
  * `functions.zip_with`/`aggregate` higher-order functions: evaluated
  * per-row inside codegen, no UDF serialization, no shuffle.
  *
  * All math is done in Double (inputs cast up from float) with strict
  * left-to-right accumulation — deterministic and engine-comparable.
  */
object VectorOps {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Signature bits for random-hyperplane LSH: bit i = sign(v · plane_i),
    * packed into a Long. `planes` are literal arrays broadcast into the plan
    * (tiny: H × dim doubles), so bucketing is a pure map — the shuffle-free
    * path to ANN at corpus scale.
    */
  def hyperplaneBits(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, lit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
}
