package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of normalized text, as one native pass:
  * lower/trim/whitespace-split, then n-token windows joined by a space,
  * first-occurrence order (matches `array_distinct` + the declarative
  * formulation). The `transform(sequence, slice+concat_ws)` HOF pipeline
  * evaluates an interpreted expression tree per shingle POSITION and
  * dominated the dedup profile; this is a StringBuilder loop per row.
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    // EXACT token stream of split(lower(trim(text)), "\\s+"): SQL trim
    // strips spaces only (not tabs — String.trim would) and SQL lower is
    // locale-independent (String.toLowerCase is not: Turkish dotless-i)
    val text = input.asInstanceOf[UTF8String].trim().toLowerCase.toString
    val toks = text.split("\\s+", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

/** Distinct character n-grams of a string, first-occurrence order — the
  * char-level sibling of [[ShinglesExpr]], feeding the n-gram language-ID
  * heuristic. One pass, no per-position interpreted expressions.
  */
case class CharNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](s.length * 2)
    var i = 0
    while (i <= s.length - n) { seen.add(s.substring(i, i + n)); i += 1 }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgramsExpr =
    copy(child = newChild)
}

/** The cross-engine MinHash family: 30-bit md5-derived shingle hash mixed
  * through 64 affine maps `(a_k·h + b_k) mod M` with M = 2^61−1 (prime)
  * and deterministic 30-bit coefficients. Products stay ≤ 2^60, so the
  * arithmetic is exact in any 64-bit-integer engine — DuckDB recomputes
  * the identical signatures from
  * `CAST('0x' || substring(md5(s), 1, 8) AS BIGINT) & 1073741823`.
  * One object so the Spark expression and the SQL oracle share the
  * constants.
  */
object MinHashFamily {
  val Mod: Long = (1L << 61) - 1
  private val rnd = new scala.util.Random(20260812L)
  val A: Array[Long] = Array.fill(64)(1L + rnd.nextInt((1 << 30) - 1))
  val B: Array[Long] = Array.fill(64)(rnd.nextInt(1 << 30).toLong)
}

/** All MinHash signature values of a shingle array in ONE pass — replaces
  * the explode(docs × shingles) + numHashes-min-aggregate formulation,
  * removing the row blowup and the signature shuffle entirely (the same
  * lesson as [[SimHashExpr]]).
  *
  * Hash family bit-for-bit matches the declarative form it replaced:
  * per shingle `h = xxhash64(s)` (XXH64 over UTF-8 bytes, seed 42), per
  * function k the value is `xxhash64(k, h)` = XXH64 chaining an int then a
  * long from seed 42 — so `m_k = min over shingles` reproduces
  * `min(xxhash64(lit(k), xxhash64(shingle)))` exactly, and banding/bucket
  * behavior is unchanged. Empty shingle arrays yield Long.MaxValue
  * sentinels, which [[graft.operators.Dedup.minhashSignatures]] filters
  * out (a shingle-less doc has no signature row).
  */
case class MinHashExpr(child: Expression, numHashes: Int,
                       hashKind: String = "xx")
    extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1, "numHashes must be >= 1")
  require(hashKind == "xx" || hashKind == "md5", s"unknown hash kind $hashKind")
  require(hashKind != "md5" || numHashes <= MinHashFamily.A.length,
    s"md5 family provides ${MinHashFamily.A.length} hash functions")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val seedBases: Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    Array.tabulate(numHashes)(k => XXH64.hashInt(k, 42L))
  }
  @transient private lazy val digest =
    java.security.MessageDigest.getInstance("MD5")

  /** First 4 md5 bytes big-endian, masked to 30 bits — identical to the
    * oracle's `CAST('0x' || substring(md5(s),1,8) AS BIGINT) & 1073741823`.
    */
  private def md5Hash30(s: UTF8String): Long = {
    digest.reset()
    val d = digest.digest(s.getBytes)
    (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) & 0x3fffffffL
  }

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val useMd5 = hashKind == "md5"
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        if (useMd5) {
          val h = md5Hash30(s)
          var k = 0
          while (k < numHashes) {
            val v = (MinHashFamily.A(k) * h + MinHashFamily.B(k)) % MinHashFamily.Mod
            if (v < mins(k)) mins(k) = v
            k += 1
          }
        } else {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
          var k = 0
          while (k < numHashes) {
            val v = XXH64.hashLong(h, seedBases(k))
            if (v < mins(k)) mins(k) = v
            k += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashExpr =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array in one pass, no shuffle: per distinct
  * token (deduped by hash), vote ±1 on each bit of its hash; bit set
  * where the vote sum is positive.
  *
  * Token hash is pluggable:
  *  - `"xx"` (default): Spark's `xxhash64(col)` (XXH64, seed 42, UTF-8
  *    bytes) — fastest, engine-internal.
  *  - `"md5"`: first 8 bytes of MD5 of the token, big-endian — slower, but
  *    cross-engine reproducible (DuckDB:
  *    `CAST('0x' || substring(md5(tok), 1, 16) AS UBIGINT)`), which is
  *    what lets `dedup_simhash` be oracle-checked end-to-end.
  */
case class SimHashExpr(child: Expression, hashKind: String = "xx")
    extends UnaryExpression with CodegenFallback {

  require(hashKind == "xx" || hashKind == "md5", s"unknown hash kind $hashKind")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  // one digest per deserialized expression instance (= per task) — safe,
  // and avoids a MessageDigest allocation per token
  @transient private lazy val digest =
    java.security.MessageDigest.getInstance("MD5")

  private def md5Long(s: UTF8String): Long = {
    digest.reset()
    val d = digest.digest(s.getBytes)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val seen = new java.util.HashSet[java.lang.Long](64)
    val votes = new Array[Int](64)
    val useMd5 = hashKind == "md5"
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h =
          if (useMd5) md5Long(s)
          else org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        if (seen.add(h)) {
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}
