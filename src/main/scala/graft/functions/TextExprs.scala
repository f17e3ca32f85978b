package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared analysis-time input validation for the native text expressions
  * (several are SQL-registered — a wrong-typed argument must fail
  * analysis with the function's name, not throw a ClassCastException
  * from a task).
  */
private[functions] object TextExprTypes {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  def expect(name: String, want: String,
             checks: (String, Boolean)*): TypeCheckResult =
    checks.collectFirst { case (got, false) =>
      TypeCheckResult.TypeCheckFailure(s"$name expects $want, got $got")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  def isString(dt: DataType): Boolean = dt == StringType

  def isArrayOf(dt: DataType, elem: DataType): Boolean = dt match {
    case ArrayType(e, _) => e == elem
    case _ => false
  }

  /** The vector expressions' common child shape. */
  def isVecArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
}

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

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName, "a string child",
      (child.dataType.catalogString, TextExprTypes.isString(child.dataType)))

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

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName, "a string child",
      (child.dataType.catalogString, TextExprTypes.isString(child.dataType)))

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // CODE-POINT n-grams, not UTF-16 units: DuckDB's substring(s,i,n)
    // oracle counts code points, and slicing a surrogate pair in half
    // would both desynchronize the cross-engine gram sets and emit
    // lone-surrogate strings
    val cpCount = s.codePointCount(0, s.length)
    if (cpCount < n) return new GenericArrayData(Array.empty[Any])
    // offsets(i) = UTF-16 index of code point i (cpCount + 1 entries)
    val offsets = new Array[Int](cpCount + 1)
    var ci = 0
    var off = 0
    while (ci < cpCount) {
      offsets(ci) = off
      off += Character.charCount(s.codePointAt(off))
      ci += 1
    }
    offsets(cpCount) = s.length
    val seen = new java.util.LinkedHashSet[String](cpCount * 2)
    var i = 0
    while (i <= cpCount - n) {
      seen.add(s.substring(offsets(i), offsets(i + n)))
      i += 1
    }
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

/** Distinct HASHED word n-gram shingles of normalized text in one pass:
  * tokenize (exact `split(lower(trim(text)), "\\s+")` stream), build each
  * n-token window, hash it, and dedup by hash value, first-occurrence
  * order. Fuses [[ShinglesExpr]] + `transform(_, hash)` + `array_distinct`:
  * no intermediate string array is materialized, each shingle is hashed
  * exactly ONCE, and the output longs feed both the MinHash signature
  * ([[MinHashFromHashesExpr]]) and the exact-Jaccard verify join.
  *
  * Hash kinds:
  *  - `"xx"`: `xxhash64(shingle)` (XXH64 over UTF-8 bytes, seed 42) —
  *    bit-identical to hashing the [[ShinglesExpr]] output with Spark's
  *    `xxhash64`.
  *  - `"md5"`: first 4 MD5 bytes big-endian masked to 30 bits — identical
  *    to the oracle's `CAST('0x' || substring(md5(s),1,8) AS BIGINT) &
  *    1073741823`, so DuckDB reproduces the exact hash set.
  */
case class HashedShinglesExpr(child: Expression, n: Int,
                              hashKind: String = "xx")
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")
  require(hashKind == "xx" || hashKind == "md5", s"unknown hash kind $hashKind")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName, "a string child",
      (child.dataType.catalogString, TextExprTypes.isString(child.dataType)))

  @transient private lazy val digest =
    java.security.MessageDigest.getInstance("MD5")

  private def md5Hash30(bytes: Array[Byte]): Long = {
    digest.reset()
    val d = digest.digest(bytes)
    (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) & 0x3fffffffL
  }

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val text = input.asInstanceOf[UTF8String].trim().toLowerCase.toString
    val toks = text.split("\\s+", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val useMd5 = hashKind == "md5"
    val seen = new java.util.HashSet[java.lang.Long](toks.length * 2)
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
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h =
        if (useMd5) md5Hash30(bytes)
        else XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      seen.add(h)
      i += 1
    }
    // SORTED ascending: downstream set ops (the Jaccard verify) become
    // linear merge-walks ([[JaccardSortedExpr]]); MinHash mins and the
    // oracle's set-cardinality arithmetic are order-insensitive
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HashedShinglesExpr =
    copy(child = newChild)
}

/** All MinHash signature values from an ALREADY-HASHED shingle array in
  * one pass — the signature step decoupled from shingle hashing so the
  * hash pass ([[HashedShinglesExpr]]) runs once and its output is shared
  * with the exact-Jaccard verify join.
  *
  * Families (per shingle hash `h`, function index `k`):
  *  - `"xx"`: `XXH64.hashLong(h, xxhash64(k))` — chains the pre-hashed
  *    long through a per-function seed; same family the one-shot
  *    string-input formulation used.
  *  - `"md5"`: the cross-engine affine family `(a_k·h + b_k) mod 2^61−1`
  *    over 30-bit md5 hashes ([[MinHashFamily]]) — exact in any 64-bit
  *    engine, recomputed verbatim by the DuckDB oracle.
  * Empty hash arrays yield Long.MaxValue sentinels, which
  * [[graft.operators.Dedup.minhashSignatures]] filters out (a
  * shingle-less doc has no signature row).
  */
case class MinHashFromHashesExpr(child: Expression, numHashes: Int,
                                 hashKind: String = "xx")
    extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1, "numHashes must be >= 1")
  require(hashKind == "xx" || hashKind == "md5", s"unknown hash kind $hashKind")
  require(hashKind != "md5" || numHashes <= MinHashFamily.A.length,
    s"md5 family provides ${MinHashFamily.A.length} hash functions")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_from_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName, "an array<bigint> child",
      (child.dataType.catalogString,
        TextExprTypes.isArrayOf(child.dataType, LongType)))

  @transient private lazy val seedBases: Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    Array.tabulate(numHashes)(k => XXH64.hashInt(k, 42L))
  }

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val useMd5 = hashKind == "md5"
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = arr.getLong(i)
      // the md5 affine family is exact ONLY for 30-bit inputs (products
      // must stay under 2^61): a full-width hash (e.g. an 'xx' shingle
      // table fed to the 'md5' family through the independently-
      // parameterized SQL functions) would overflow into NEGATIVE
      // garbage signatures with no error — reject the mismatch by name
      if (useMd5 && (h < 0L || h >= (1L << 30)))
        throw new IllegalArgumentException(
          s"minhash 'md5' family requires 30-bit inputs, got $h — " +
            "pair it with hashed_shingles(..., 'md5'), not 'xx'")
      var k = 0
      while (k < numHashes) {
        val v =
          if (useMd5) (MinHashFamily.A(k) * h + MinHashFamily.B(k)) % MinHashFamily.Mod
          else XXH64.hashLong(h, seedBases(k))
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashFromHashesExpr =
    copy(child = newChild)
}

/** Exact Jaccard similarity of two SORTED long arrays (the
  * [[HashedShinglesExpr]] output contract) as one linear merge-walk —
  * replaces `array_intersect` + `array_union` per candidate pair (two
  * generic hash-set passes and two materialized result arrays) with zero
  * allocation. Value = |A∩B| / (|A|+|B|−|A∩B|), the same exact
  * integer-ratio double the declarative form produced — including NULL for
  * the both-empty case (0/0), so the expression stays a drop-in
  * replacement for `size(array_intersect)/size(array_union)`.
  */
case class JaccardSortedExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"
  override def nullable: Boolean = true // both-empty yields null (0/0)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName, "two array<bigint> children",
      (left.dataType.catalogString,
        TextExprTypes.isArrayOf(left.dataType, LongType)),
      (right.dataType.catalogString,
        TextExprTypes.isArrayOf(right.dataType, LongType)))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    if (nx == 0 && ny == 0) return null
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    inter.toDouble / (nx + ny - inter)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSortedExpr =
    copy(left = newLeft, right = newRight)
}

/** All token-level statistics of a document in ONE pass — token count,
  * summed token length, stop-word hits, distinct tokens, top-token count,
  * distinct bigram count, and per-language marker-token hits. Replaces a
  * dozen interpreted higher-order-function passes (`filter(toks, isin)`
  * per language profile, `aggregate` for lengths, `transform+filter` for
  * the top token) with one tokenize + one hash-map sweep per row; every
  * downstream feature (quality score, language id, repetition signals) is
  * arithmetic over this struct.
  *
  * Token stream is the exact `split(lower(trim(text)), "\\s+")` stream
  * (SQL trim = spaces only; SQL lower = locale-independent), matching the
  * declarative formulation and the DuckDB oracles verbatim. Token length
  * counts code points (Spark `length`/DuckDB `length` semantics).
  */
case class TokenStatsExpr(child: Expression, stopwords: Seq[String],
                          langProfiles: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("distinct_bigrams", LongType, nullable = false),
    StructField("lang_scores", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "token_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName, "a string child",
      (child.dataType.catalogString, TextExprTypes.isString(child.dataType)))

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add)
    s
  }
  // token -> indices of the language profiles listing it as a marker (a
  // token can mark several languages, e.g. "de" in both es and fr)
  @transient private lazy val markerOf: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    langProfiles.zipWithIndex.foreach { case (profile, i) =>
      profile.foreach { tok =>
        val prev = m.get(tok)
        m.put(tok, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  // Deliberately CodegenFallback, and MEASURED (r18): a doGenCode
  // variant (instance-method call from generated code, the
  // ScriptCountsExpr pattern) pulled the quality projections into
  // WholeStageCodegen but cost +50% on `sample_topquality` warm
  // (0.94 s → 1.41 s at sf0.1/local[32]) — the quality ladder derives
  // MANY columns from one tokenStats instance, and the out-of-codegen
  // UnsafeProjection's subexpression elimination beats the WSC path for
  // this shape. ScriptCountsExpr keeps its doGenCode (measured win on
  // the script-gate scans, whose ladders are narrower).
  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String)
      : org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val text = input.trim().toLowerCase.toString
    val toks = text.split("\\s+", -1)
    var sumLen = 0L
    var nStop = 0L
    val counts = new java.util.HashMap[String, Int](toks.length * 2)
    val langScores = new Array[Long](langProfiles.size)
    val bigrams =
      if (toks.length >= 2) new java.util.HashSet[String](toks.length * 2) else null
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      sumLen += t.codePointCount(0, t.length)
      if (stopSet.contains(t)) nStop += 1
      val marks = markerOf.get(t)
      if (marks != null) {
        var k = 0
        while (k < marks.length) { langScores(marks(k)) += 1; k += 1 }
      }
      counts.merge(t, 1, Integer.sum)
      if (bigrams != null && i > 0) bigrams.add(toks(i - 1) + " " + t)
      i += 1
    }
    var top = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > top) top = c.toLong }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      toks.length.toLong, sumLen, nStop, counts.size.toLong, top,
      if (bigrams == null) 0L else bigrams.size.toLong,
      new GenericArrayData(langScores)))
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStatsExpr =
    copy(child = newChild)
}

/** All per-script character counts of a document in ONE pass — the
  * [[TokenStatsExpr]] discipline applied to the script-gate ladder
  * (`text_langid_script` / `text_script_profile` / the detect funnel).
  * The declarative formulation computed each count as its own
  * `regexp_replace` length delta, so the ingest-gate text was scanned
  * once PER SCRIPT (8–9 full regex passes per row); this is one code
  * point sweep emitting every count.
  *
  * Semantics are EXACTLY the regexp deltas they replace:
  *  - counts are code points (Spark `length` == `UTF8String.numChars`
  *    counts code points; Java regex char classes match per code point,
  *    and every range here is BMP so supplementary points never match);
  *  - `n_nonws` complements Java's non-unicode `\\s` = the six ASCII
  *    whitespace chars `[ \t\n\x0B\f\r]` — NBSP and friends count as
  *    non-whitespace, exactly as `regexp_replace(c, "\\s+", "")` left
  *    them;
  *  - ranges: latin A–Z + a–z, han U+4E00–9FFF, kana U+3040–30FF,
  *    hangul U+AC00–D7A3, thai U+0E00–0E7F, devanagari U+0900–097F,
  *    cyrillic U+0400–04FF, arabic U+0600–06FF — the exact class
  *    bounds of the queries' `inRange` literals.
  *
  * `stopSets` folds the gate ladder's stop-CHARACTER counts into the
  * same sweep: each set contributes an `n_stop_<i>` field counting the
  * code points of the input that are members of the set — exactly the
  * `length(c) - length(translate(c, set, ""))` delta it replaces
  * (`translate` maps per code point, membership only), without the
  * extra full-string pass and the translated-copy allocation.
  * Membership is independent of the script classification (a kana stop
  * char counts in BOTH `n_kana` and its stop field, as the two separate
  * passes did).
  *
  * Equal instances inside one projection evaluate ONCE per row
  * (subexpression elimination; instances must carry the same
  * `stopSets`), so stacking all the count columns plus the verdict
  * ladder costs a single sweep. Proper `doGenCode` (a static call on
  * the child's generated value) rather than `CodegenFallback`, so the
  * ingest-gate scan projection stays inside one WholeStageCodegen span.
  */
case class ScriptCountsExpr(child: Expression,
                            stopSets: Seq[String] = Nil)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_latin", LongType, nullable = false),
    StructField("n_han", LongType, nullable = false),
    StructField("n_kana", LongType, nullable = false),
    StructField("n_hangul", LongType, nullable = false),
    StructField("n_thai", LongType, nullable = false),
    StructField("n_devanagari", LongType, nullable = false),
    StructField("n_cyrillic", LongType, nullable = false),
    StructField("n_arabic", LongType, nullable = false),
    StructField("n_nonws", LongType, nullable = false)) ++
    stopSets.indices.map(i =>
      StructField(s"n_stop_$i", LongType, nullable = false)))
  override def prettyName: String = "script_counts"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName, "a string child",
      (child.dataType.catalogString, TextExprTypes.isString(child.dataType)))

  // per-set sorted code-point tables (binary search in the sweep);
  // duplicates in the matching string collapse, as translate's dict does
  @transient private lazy val stopTables: Array[Array[Int]] =
    stopSets.map(s => s.codePoints().toArray.distinct.sorted).toArray

  override def nullSafeEval(input: Any): Any =
    ScriptCountsExpr.compute(input.asInstanceOf[UTF8String], stopTables)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val stops = ctx.addReferenceObj("stopTables", stopTables, "int[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ScriptCountsExpr.compute($c, $stops)")
  }

  override protected def withNewChildInternal(newChild: Expression): ScriptCountsExpr =
    copy(child = newChild)
}

object ScriptCountsExpr {

  /** The one-pass sweep, shared verbatim by the interpreted and
    * generated paths (the generated code calls this method on the
    * child's value — no row boxing, no fallback `eval`).
    */
  def compute(input: UTF8String,
              stops: Array[Array[Int]])
      : org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val s = input.toString
    val n = s.length
    var chars = 0L; var ws = 0L
    var latin = 0L; var han = 0L; var kana = 0L; var hangul = 0L
    var thai = 0L; var deva = 0L; var cyr = 0L; var arab = 0L
    val nStops = stops.length
    val stopCounts = new Array[Long](nStops)
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      chars += 1
      if (cp < 0x80) {
        // ASCII: Java non-unicode \s is exactly { \t \n \x0B \f \r ' ' }
        if ((cp >= 0x09 && cp <= 0x0D) || cp == 0x20) ws += 1
        else if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z'))
          latin += 1
      } else if (cp >= 0x4E00 && cp <= 0x9FFF) han += 1
      else if (cp >= 0x3040 && cp <= 0x30FF) kana += 1
      else if (cp >= 0xAC00 && cp <= 0xD7A3) hangul += 1
      else if (cp >= 0x0E00 && cp <= 0x0E7F) thai += 1
      else if (cp >= 0x0900 && cp <= 0x097F) deva += 1
      else if (cp >= 0x0400 && cp <= 0x04FF) cyr += 1
      else if (cp >= 0x0600 && cp <= 0x06FF) arab += 1
      var k = 0
      while (k < nStops) {
        val t = stops(k)
        if (t.length > 0 && cp >= t(0) && cp <= t(t.length - 1) &&
          java.util.Arrays.binarySearch(t, cp) >= 0) stopCounts(k) += 1
        k += 1
      }
      i += Character.charCount(cp)
    }
    val out = new Array[Any](10 + nStops)
    out(0) = chars; out(1) = latin; out(2) = han; out(3) = kana
    out(4) = hangul; out(5) = thai; out(6) = deva; out(7) = cyr
    out(8) = arab; out(9) = chars - ws
    var k = 0
    while (k < nStops) { out(10 + k) = stopCounts(k); k += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }
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

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName, "an array<string> child",
      (child.dataType.catalogString,
        TextExprTypes.isArrayOf(child.dataType, StringType)))

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

/** All k-token rolling-window md5 fingerprints of a token array in one
  * native pass, position order — bit-identical to
  * `transform(sequence(1, n-k+1), i -> md5(concat_ws(' ', slice(toks, i, k))))`
  * (and therefore to the DuckDB oracle's md5 of the space-joined window),
  * but without the interpreted higher-order-function dispatch, per-window
  * `slice` allocation, and per-window string join that made the HOF form
  * the hottest path in span-level dedup ([[graft.operators.Dedup
  * .duplicatedSpans]] / [[graft.operators.Dedup.removeDuplicatedSpans]],
  * which consume this; bit-identity to the HOF form is asserted in
  * `TextExprsSpec`). Token UTF-8 bytes are extracted once; each window
  * streams `tok SP tok ... tok` through one reused MessageDigest. Arrays
  * shorter than k yield an empty array (the HOF form needed an explicit
  * guard because `sequence(1, stop)` descends for stop < 1).
  */
case class SpanDigestsExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "window size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "span_digests"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName, "an array<string> child",
      (child.dataType.catalogString,
        TextExprTypes.isArrayOf(child.dataType, StringType)))

  @transient private lazy val digest =
    java.security.MessageDigest.getInstance("MD5")

  private[this] val hex = "0123456789abcdef".getBytes

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val tokBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // null stays null: concat_ws SKIPS null elements entirely (no
      // separator either) while an empty string keeps its separators —
      // the declarative twin this expression claims bit-identity to
      tokBytes(i) = if (s == null) null else s.getBytes
      i += 1
    }
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) {
      digest.reset()
      var j = 0
      var wrote = false
      while (j < k) {
        val tb = tokBytes(i + j)
        if (tb != null) {
          if (wrote) digest.update(' '.toByte)
          digest.update(tb)
          wrote = true
        }
        j += 1
      }
      val d = digest.digest()
      val chars = new Array[Byte](32)
      var b = 0
      while (b < 16) {
        chars(2 * b) = hex((d(b) >> 4) & 0xf)
        chars(2 * b + 1) = hex(d(b) & 0xf)
        b += 1
      }
      out(i) = UTF8String.fromBytes(chars)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SpanDigestsExpr =
    copy(child = newChild)
}

/** All k-token rolling-window fingerprints as 8-byte xxhash64 longs — the
  * scale twin of [[SpanDigestsExpr]]: same windows (`tok SP tok ... tok`
  * UTF-8 byte stream), but the fingerprint that flows into the
  * occurrence-count shuffle is a fixed-width long instead of a 32-hex-char
  * string (measured: the span-dedup shuffle, not the projection, is the
  * warm bottleneck). Window equality is what span dedup consumes, and
  * equality is hash-independent, so coverage/rewrite outputs are identical
  * to the md5 form modulo 2^-64-scale collisions — the operators default
  * to this and keep the md5 kind for cross-engine fingerprint exports.
  */
case class SpanHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "window size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName, "an array<string> child",
      (child.dataType.catalogString,
        TextExprTypes.isArrayOf(child.dataType, StringType)))

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.Platform
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val tokBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // null stays null — concat_ws skips null elements AND their
      // separators ([[SpanDigestsExpr]]'s contract)
      tokBytes(i) = if (s == null) null else s.getBytes
      i += 1
    }
    // one reusable buffer sized for the largest window
    var maxWin = 0
    i = 0
    while (i <= n - k) {
      var len = k - 1
      var j = 0
      while (j < k) {
        val tb = tokBytes(i + j)
        if (tb != null) len += tb.length
        j += 1
      }
      if (len > maxWin) maxWin = len
      i += 1
    }
    val buf = new Array[Byte](math.max(maxWin, 0))
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) {
      var pos = 0
      var j = 0
      var wrote = false
      while (j < k) {
        val tb = tokBytes(i + j)
        if (tb != null) {
          if (wrote) { buf(pos) = ' '.toByte; pos += 1 }
          System.arraycopy(tb, 0, buf, pos, tb.length)
          pos += tb.length
          wrote = true
        }
        j += 1
      }
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SpanHashesExpr =
    copy(child = newChild)
}

/** Rewrite a document with every duplicated k-token window cut out, in one
  * native pass: given the token array and the (1-based, any-order) start
  * positions of its duplicated windows, mark the covered token range per
  * start and stream the SURVIVING tokens space-joined through one MD5 —
  * byte-identical to `md5(array_join(kept, ' '))` over the anti-join
  * formulation, but the tokens never explode into rows, never shuffle
  * through the (doc, position) anti-join, and never reassemble through a
  * collect_list sort. O(n + |starts|) per doc. Returns
  * struct(n_kept, clean_md5); zero survivors yield md5("") — the same
  * convention as the declarative form.
  */
case class SpanRewriteExpr(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  require(k >= 1, "window size must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", LongType, nullable = false),
    StructField("clean_md5", StringType, nullable = false)))
  override def prettyName: String = "span_rewrite"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName,
      "(array<string> tokens, array<int> window starts)",
      (left.dataType.catalogString,
        TextExprTypes.isArrayOf(left.dataType, StringType)),
      (right.dataType.catalogString,
        TextExprTypes.isArrayOf(right.dataType, IntegerType)))

  @transient private lazy val digest =
    java.security.MessageDigest.getInstance("MD5")

  private[this] val hex = "0123456789abcdef".getBytes

  override def nullSafeEval(toksRaw: Any, startsRaw: Any): Any = {
    val toks = toksRaw.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val starts = startsRaw.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = toks.numElements()
    val covered = new Array[Boolean](n)
    var i = 0
    while (i < starts.numElements()) {
      val p = starts.getInt(i) - 1 // 1-based start → 0-based token index
      var j = math.max(p, 0)
      val end = math.min(p + k, n)
      while (j < end) { covered(j) = true; j += 1 }
      i += 1
    }
    digest.reset()
    var kept = 0L
    i = 0
    while (i < n) {
      if (!covered(i)) {
        val s = toks.getUTF8String(i)
        // null tokens are skipped entirely — separator included —
        // matching the concat_ws replay the oracle runs
        if (s != null) {
          if (kept > 0) digest.update(' '.toByte)
          digest.update(s.getBytes)
          kept += 1
        }
      }
      i += 1
    }
    val d = digest.digest()
    val chars = new Array[Byte](32)
    var b = 0
    while (b < 16) {
      chars(2 * b) = hex((d(b) >> 4) & 0xf)
      chars(2 * b + 1) = hex(d(b) & 0xf)
      b += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](kept, UTF8String.fromBytes(chars)))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanRewriteExpr =
    copy(left = newLeft, right = newRight)
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) of a string column — the
  * text-cleaning front door of a pretraining pipeline (composing combining
  * sequences so dedup fingerprints and tokenizers see one byte form).
  * Spark has no built-in for this; `java.text.Normalizer` implements the
  * standard forms, so the output is engine-comparable (DuckDB's
  * `nfc_normalize` produces the same NFC bytes). Fast path: Normalizer's
  * own quick-check skips already-normalized text (ASCII corpora pay one
  * scan, no allocation).
  */
case class NormalizeExpr(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val nf = java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType &&
        Set("NFC", "NFD", "NFKC", "NFKD").contains(form))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects (string, NFC|NFD|NFKC|NFKD), got " +
        s"(${child.dataType.catalogString}, $form)")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, nf)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, nf))
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeExpr =
    copy(child = newChild)
}

/** The BPE merge primitives shared by the encoder ([[BpeEncodeExpr]]) and
  * the driver-local trainer (`TextOps.bpeTrainMergesLocal`) — one
  * implementation so "the rule the trainer scored" and "the rule the
  * encoder applies" can never drift.
  */
object Bpe {

  /** A word's initial symbol sequence: code points (never cutting a
    * surrogate pair — same boundaries as the declarative form's
    * lookbehind split and DuckDB's `string_split(word, '')`) plus the
    * `</w>` terminal marker.
    */
  def wordSymbols(word: String): java.util.ArrayList[String] = {
    val syms = new java.util.ArrayList[String](word.length + 1)
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      syms.add(word.substring(i, i + n))
      i += n
    }
    syms.add("</w>")
    syms
  }

  // the U+0001/U+0002 boundary markers, spelled without escape literals
  private final val M1 = 1.toChar
  private final val M2 = 2.toChar

  /** The encoders' shared input contract, in ONE spelling: merge rule
    * symbols are non-empty and carry neither boundary marker (trainer
    * output is marker-free by construction — the trainers strip
    * markers from corpus words).
    */
  private[functions] def requireMarkerFree(
      merges: Seq[(String, String)]): Unit =
    require(merges.forall { case (l, r) =>
      l.nonEmpty && r.nonEmpty && !(l + r).exists(c => c == M1 || c == M2)
    }, "merge symbols must be non-empty and marker-free (trainer output)")

  /** Input text containing the markers themselves would corrupt the
    * boundary-wrapped encoding (tokens mis-split, ids silently wrong), so
    * the encoders strip them up front — the guarantee holds
    * unconditionally instead of depending on `cleanText` (which removes
    * all C0 controls) having run first. Marker-free text (every real
    * corpus) passes through untouched, same instance.
    */
  def stripMarkers(s: String): String = {
    var i = 0
    while (i < s.length && s.charAt(i) != M1 && s.charAt(i) != M2) i += 1
    if (i == s.length) return s
    val sb = new java.lang.StringBuilder(s.length - 1)
    sb.append(s, 0, i)
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != M1 && c != M2) sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** One rule applied left-to-right non-overlapping; the merged symbol
    * does not re-match the same rule in the same pass — exactly
    * Java/Spark/DuckDB literal-`replace` semantics on the
    * boundary-wrapped string. Returns the INPUT list unchanged (same
    * instance) when the rule doesn't match — copy-on-first-match, since
    * most rules touch few words.
    */
  def applyRule(syms: java.util.ArrayList[String], lhs: String,
                rhs: String): java.util.ArrayList[String] = {
    var out: java.util.ArrayList[String] = null
    var j = 0
    while (j < syms.size) {
      if (j < syms.size - 1 && syms.get(j) == lhs && syms.get(j + 1) == rhs) {
        if (out == null) {
          out = new java.util.ArrayList[String](syms.size)
          var k = 0
          while (k < j) { out.add(syms.get(k)); k += 1 }
        }
        out.add(lhs + rhs)
        j += 2
      } else {
        if (out != null) out.add(syms.get(j))
        j += 1
      }
    }
    if (out != null) out else syms
  }
}

/** Learned-BPE encoding of a document as one native pass — the hot path
  * behind `TextOps.bpeEncode`. The declarative form (10 chained literal
  * `replace`s over the boundary-wrapped full text) rewrites the whole
  * ~3×-inflated document string once PER RULE; this expression applies
  * the rules per word over a small symbol array instead, so the text is
  * scanned once and rule application touches only each word's ≤(chars+1)
  * symbols. Output is the identical boundary-wrapped byte string
  * (property-tested bit-identical to the declarative chain; the DuckDB
  * oracle md5-verifies it end-to-end).
  *
  * Per rule, matches merge left-to-right non-overlapping and the merged
  * symbol does not re-match the same rule in the same pass — exactly
  * Java/Spark/DuckDB literal-`replace` semantics on the wrapped string.
  * Per-word ≡ whole-string holds for trainer-produced rules (a learned
  * lhs is never a terminal symbol, so no whole-string match can span a
  * word boundary).
  *
  * NULL text yields NULL (the declarative chain's `concat_ws` artifact
  * turns NULL into "" instead; the `documents` corpus is non-null text).
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  Bpe.requireMarkerFree(merges)

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_encode"

  @transient private lazy val lhsArr: Array[String] = merges.map(_._1).toArray
  @transient private lazy val rhsArr: Array[String] = merges.map(_._2).toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects a string child, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    // EXACT normalization of the declarative form: SQL trim (spaces only)
    // + locale-independent lower — see ShinglesExpr. Then strip any
    // marker characters from the INPUT ([[stripMarkers]]; the declarative
    // twin is only defined on marker-free text, which the property suite
    // generates).
    val text = Bpe.stripMarkers(
      input.asInstanceOf[UTF8String].trim().toLowerCase.toString)
    val words = text.split("\\s+", -1)
    val sb = new java.lang.StringBuilder(text.length * 3 + 8)
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) {
        var syms = Bpe.wordSymbols(word)
        var r = 0
        while (r < lhsArr.length) {
          syms = Bpe.applyRule(syms, lhsArr(r), rhsArr(r))
          r += 1
        }
        var k = 0
        while (k < syms.size) {
          sb.append('\u0001').append(syms.get(k)).append('\u0002')
          k += 1
        }
      }
      w += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

/** Learned-BPE tokenization straight to TOKEN IDS in one native pass —
  * the trainer-input form of [[BpeEncodeExpr]]. Where the encode-then-id
  * pipeline explodes each doc into per-token SYMBOL STRING rows and
  * broadcast-joins them to ids, this expression resolves each symbol
  * against the (control-plane) vocabulary inside the scan projection and
  * emits `array<bigint>` — at corpus scale the token stream that leaves
  * the row carries only longs; symbol strings never enter an explode or
  * a shuffle. Property-tested row-equal to the explode+join formulation
  * (the DuckDB oracle continues to replay THAT form independently).
  *
  * A symbol absent from the vocabulary yields -1 (cannot happen when the
  * vocabulary was induced from the same corpus/merges via
  * `TextOps.bpeVocab`; an inner id join would silently DROP such tokens,
  * so the sentinel is the safer contract — filter `>= 0` to mirror the
  * join).
  */
case class BpeEncodeIdsExpr(child: Expression, merges: Seq[(String, String)],
                            vocab: Seq[(String, Long)])
    extends UnaryExpression with CodegenFallback {

  Bpe.requireMarkerFree(merges)
  require(vocab.map(_._1).distinct.length == vocab.length,
    "vocabulary symbols must be unique (bpeVocab dedups them)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bpe_encode_ids"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName, "a string child",
      (child.dataType.catalogString, TextExprTypes.isString(child.dataType)))

  @transient private lazy val lhsArr: Array[String] = merges.map(_._1).toArray
  @transient private lazy val rhsArr: Array[String] = merges.map(_._2).toArray
  @transient private lazy val ids: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (s, id) => m.put(s, id) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    // same normalization contract as BpeEncodeExpr: SQL trim + lower,
    // then the marker strip (Bpe.stripMarkers)
    val text = Bpe.stripMarkers(
      input.asInstanceOf[UTF8String].trim().toLowerCase.toString)
    val words = text.split("\\s+", -1)
    val out = new scala.collection.mutable.ArrayBuffer[Any](text.length / 2 + 4)
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) {
        var syms = Bpe.wordSymbols(word)
        var r = 0
        while (r < lhsArr.length) {
          syms = Bpe.applyRule(syms, lhsArr(r), rhsArr(r))
          r += 1
        }
        var k = 0
        while (k < syms.size) {
          val id = ids.get(syms.get(k))
          out += (if (id == null) -1L else id.longValue)
          k += 1
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIdsExpr =
    copy(child = newChild)
}
