package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DotProductExpr, JsonCollateKey, ShinglesExpr, SimHashExpr}

/** SQL-facing registration of the engine's native expressions, via the
  * supported `SparkSessionExtensions` seam:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions()(_))
  * or `spark.sql.extensions=graft.GraftExtensions`, or post-hoc on an
  * existing session with [[GraftExtensions.register]].
  *
  * Registered functions:
  *  - `vec_dot(a, b)`          — dense dot product over array<float|double>
  *  - `simhash64(tokens)`      — 64-bit SimHash of an array<string>
  *  - `word_shingles(text, n)` — distinct word n-gram shingles (n literal)
  *  - `json_collate_key(v)`    — order-preserving heterogeneous key encoding
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, (info, builder)) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def literalInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val builders: Map[String, (ExpressionInfo, Seq[Expression] => Expression)] = Map(
    "vec_dot" -> (info("vec_dot", "vec_dot(a, b) - dense vector dot product"),
      (es: Seq[Expression]) => DotProductExpr(es(0), es(1))),
    "simhash64" -> (info("simhash64", "simhash64(tokens) - 64-bit SimHash"),
      (es: Seq[Expression]) => SimHashExpr(es(0))),
    "word_shingles" -> (info("word_shingles",
      "word_shingles(text, n) - distinct word n-gram shingles"),
      (es: Seq[Expression]) =>
        ShinglesExpr(es(0), literalInt(es(1), "shingle size"))),
    "json_collate_key" -> (info("json_collate_key",
      "json_collate_key(v) - sortable binary collation key"),
      (es: Seq[Expression]) => JsonCollateKey(es(0))))

  /** Register on an already-built session (e.g. one the harness owns). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, (i, builder)) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), i, builder)
    }
}
