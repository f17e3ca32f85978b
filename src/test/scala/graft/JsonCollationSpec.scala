package graft

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.JsonCollation

/** O7 — order-preserving heterogeneous-key encoding (SURVEY §2.1 O7, §5.3b).
  * The byte order of `encode` must equal JSON collation order:
  * missing < false < true < number < string < array < object,
  * ints and floats in ONE numeric order (reference
  * `Projector/JSEvaluate.go:56-130`).
  */
class JsonCollationSpec extends SparkSpec {

  private def lt(a: Any, b: Any): Boolean =
    JsonCollation.compareBytes(JsonCollation.encode(a), JsonCollation.encode(b)) < 0

  test("type rank order: null < false < true < number < string < array < struct < map") {
    val ladder: Seq[Any] = Seq(
      null, false, true, -1e9, "", Seq(1), Row(1), Map("a" -> 1))
    ladder.sliding(2).foreach { case Seq(a, b) =>
      assert(lt(a, b), s"$a should collate before $b")
    }
  }

  test("ints and floats collate in one numeric order") {
    assert(lt(1L, 1.5d))
    assert(lt(1.5d, 2L))
    assert(lt(-3.5d, -3L))
    assert(lt(2L, 10L)) // byte order is numeric, not lexicographic ("10" < "2")
    assert(lt(9.99d, 10L))
  }

  test("string order is byte/code-point order, NUL-safe") {
    assert(lt("a", "b"))
    assert(lt("a", "ab")) // prefix first
    assert(lt("a\u0000b", "a\u0001")) // escaped NUL still sorts below 0x01
    assert(lt("", " ")) // empty string first
  }

  test("nested arrays: element-wise, prefix-array first") {
    assert(lt(Seq(1, 2), Seq(1, 2, 0)))
    assert(lt(Seq(1, 2), Seq(1, 3)))
    assert(lt(Seq(Seq(1)), Seq(Seq(1), 0)))
    assert(lt(Seq(9), Seq("a"))) // number < string inside containers too
  }

  // --- property: encode() byte order == reference value comparator order ---

  private def randScalar(r: Random): Any = r.nextInt(5) match {
    case 0 => null
    case 1 => r.nextBoolean()
    case 2 => r.nextLong() / 1024 // keep away from 2^53 precision edge
    case 3 => (r.nextDouble() - 0.5) * 1e9
    case 4 => r.alphanumeric.take(r.nextInt(8)).mkString
  }

  private def randValue(r: Random): Any =
    if (r.nextInt(5) == 0) Seq.fill(r.nextInt(4))(randScalar(r)) else randScalar(r)

  test("property: encode() byte order == reference comparator order (2000 samples)") {
    val r = new Random(20260812L)
    (1 to 2000).foreach { i =>
      val x = randValue(r); val y = randValue(r)
      val byBytes = Integer.signum(
        JsonCollation.compareBytes(JsonCollation.encode(x), JsonCollation.encode(y)))
      val byValues = Integer.signum(JsonCollation.compareValues(x, y))
      assert(byBytes == byValues, s"order mismatch (case $i) for $x vs $y")
    }
  }

  test("catalyst expression collates keys in collation order") {
    import spark.implicits._
    val df = Seq((1L, "b", 10L), (2L, "a", 99L), (3L, "a", 7L)).toDF("id", "s", "n")
    val out = df.select(col("id"),
      JsonCollation.collateKey(struct(col("s"), col("n"))).as("k"))
      .orderBy("k").select("id").as[Long].collect()
    assert(out.toSeq == Seq(3L, 2L, 1L)) // ("a",7) < ("a",99) < ("b",10)
  }

  // --- per-column desc direction (reference Desc []bool) ---

  /** Per-column reference comparator: desc reverses the value order and
    * sends nulls LAST (Spark's desc_nulls_last default).
    */
  private def refCmp(x: Any, y: Any, desc: Boolean): Int =
    if (x == null && y == null) 0
    else if (x == null) { if (desc) 1 else -1 }
    else if (y == null) { if (desc) -1 else 1 }
    else {
      val c = JsonCollation.compareValues(x, y)
      if (desc) -c else c
    }

  test("property: encodeKey byte order == column comparator with desc mix (2000 samples)") {
    val r = new Random(20260812L)
    val patterns = Seq(Seq(false, false), Seq(false, true),
      Seq(true, false), Seq(true, true))
    (1 to 2000).foreach { i =>
      val desc = patterns(r.nextInt(patterns.size))
      val x = Seq(randValue(r), randValue(r))
      val y = Seq(randValue(r), randValue(r))
      val byBytes = Integer.signum(JsonCollation.compareBytes(
        JsonCollation.encodeKey(x, desc), JsonCollation.encodeKey(y, desc)))
      val byCols = Integer.signum(
        x.lazyZip(y).lazyZip(desc).iterator
          .map { case (a, b, d) => refCmp(a, b, d) }
          .find(_ != 0).getOrElse(0))
      assert(byBytes == byCols, s"case $i desc=$desc: $x vs $y")
    }
  }

  test("collateKeys order == Spark orderBy with the same asc/desc mix") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val r = new Random(99L)
    val rows = (1 to 300).map { i =>
      Row(i.toLong,
        if (r.nextInt(6) == 0) null else java.lang.Double.valueOf(r.nextInt(20).toDouble),
        if (r.nextInt(6) == 0) null else r.alphanumeric.take(r.nextInt(4)).mkString)
    }
    val schema = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("d", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true)))
    val df = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
    val bySpark = df.orderBy(col("d").asc, col("s").desc, col("id").asc)
      .select("id").as[Long].collect().toSeq
    val byKey = df.select(col("id"),
        JsonCollation.collateKeys(Seq(col("d"), col("s"), col("id")),
          Seq(false, true, false)).as("k"))
      .orderBy("k").select("id").as[Long].collect().toSeq
    assert(byKey == bySpark)
  }
}
