package graft.functions

import java.nio.file.{Files, Path, Paths}

import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** Versioned store for legacy multi-byte ENCODING INDEX artifacts —
  * the load path [[CharsetDecode]]'s header names as debt: the
  * embedded decoder honors only the utf family + windows-1252, and
  * every Shift_JIS/EUC-JP/GBK/Big5/EUC-KR-labeled page NULLs as an
  * honest `unsupported-label` rejection. That is the single largest
  * dark-data population in a real crawl (most of the legacy-encoded
  * CJK web). The fix is NOT to bake five ~10-25k-entry mapping tables
  * into source — it is the same artifact discipline as the
  * public-suffix list ([[PslStore]]) and the language profiles
  * ([[LangProfileStore]]): one immutable JSON per version
  * ([[VersionedSlots.claimFile]] slots), loaded and PINNED at
  * expression construction, shipped inside the plan, so a table
  * upgrade can never silently re-key history.
  *
  * The artifact carries WHATWG-Encoding-Standard-shaped INDEXES
  * (https://encoding.spec.whatwg.org §5: an index is a list of
  * pointer → code point entries) plus the gb18030-ranges index:
  *  - `jis0208` — shared by shift_jis, euc-jp and iso-2022-jp,
  *    pointers in
  *    shift_jis pointer space (the EUDC band 8836–10715 is a decoder
  *    FORMULA, never stored);
  *  - `jis0212` — euc-jp's 0x8F plane;
  *  - `gb18030` — the two-byte plane, shared by the gbk and gb18030
  *    labels (the standard: "gbk's decoder is gb18030's decoder");
  *  - `big5` — pointer space (lead−0x81)×157+trail−offset;
  *  - `euc-kr` — the full windows-949 plane.
  * An encoding is SUPPORTED under a pin iff its primary index is
  * present — a v1 artifact carrying only the Japanese indexes decodes
  * shift_jis/euc-jp and still NAMES gbk/big5/euc-kr rejections, which
  * is exactly the version-pinned rollout path.
  *
  * The WHATWG index FILES cannot be fetched in this offline build, so
  * [[jdkIndexes]] generates a snapshot by probing the JDK's own
  * decoders (windows-31j, EUC-JP, GBK, Big5, x-windows-949, GB18030 —
  * all public, all shipped in `jdk.charsets`): for every pointer in
  * an index's pointer space, the probe decodes the corresponding byte
  * sequence and records the single code point it produces. The
  * deployment story is unchanged — a production rollout saves the
  * real WHATWG index files through the same [[save]]; the snapshot is
  * the offline-verifiable stand-in, and [[graft.CharsetLegacySpec]]
  * cross-validates the planted fixtures three ways (our state machine
  * + table, the JDK decoder, and the hand-written expected code
  * points).
  *
  * The DECODERS themselves ([[LegacyTables.decode]]) are the WHATWG
  * Encoding Standard state machines (§12–§13), total and
  * deterministic: every malformed sequence is one U+FFFD with the
  * spec's exact byte-restore ("prepend to stream") behavior, so the
  * same bytes decode to the same text on every executor and in every
  * replay.
  */
object EncodingStore {

  /** One immutable artifact version: `indexes` maps index name →
    * (pointer → code point, pointers as decimal strings for JSON);
    * `ranges` is the gb18030-ranges index as [pointer, codePoint]
    * pairs ascending (empty when the artifact does not carry the
    * four-byte plane).
    */
  final case class Artifact(version: Int,
      indexes: Map[String, Map[String, Int]],
      ranges: Seq[Seq[Int]])

  private implicit val formats: Formats = DefaultFormats

  private val FilePattern = "enc_v([0-9]+)\\.json".r

  private def file(dir: String, version: Int): Path =
    Paths.get(dir, s"enc_v$version.json")

  def versions(dir: String): Seq[Int] =
    VersionedSlots.versions(dir, {
      case FilePattern(v) => Some(v.toInt)
      case _ => None
    })

  /** Persist an index set as the NEXT version (atomic, immutable). */
  def save(dir: String, indexes: Map[String, Map[Int, Int]],
           ranges: Seq[(Int, Int)] = Seq.empty): Int =
    VersionedSlots.claimFile(dir, v => s"enc_v$v.json",
      versions(dir).lastOption.getOrElse(0) + 1,
      v => Serialization.write(Artifact(v,
        indexes.map { case (n, m) =>
          n -> m.map { case (p, c) => p.toString -> c }
        },
        ranges.map(r => Seq(r._1, r._2)))))

  def get(dir: String, version: Int): Option[Artifact] =
    try Some(Serialization.read[Artifact](
      Files.readString(file(dir, version))))
    catch { case _: java.nio.file.NoSuchFileException => None }

  def latest(dir: String): Option[Artifact] =
    versions(dir).lastOption.flatMap(get(dir, _))

  // ------------------------------------------------------------------
  // label table — the WHATWG Encoding label table rows for the five
  // legacy multi-byte encodings (the utf/windows-1252 families stay in
  // CharsetDecode.normalizeLabel; gbk and gb18030 are DISTINCT
  // encodings sharing one decoder, so the normalized name preserves
  // which label family the page carried)
  // ------------------------------------------------------------------

  /** Normalized legacy encoding name for a label, or None. */
  def normalizeLegacyLabel(raw: String): Option[String] = {
    val l = raw.trim.toLowerCase(java.util.Locale.ROOT)
    l match {
      case "shift_jis" | "shift-jis" | "sjis" | "x-sjis" | "ms_kanji" |
          "ms932" | "csshiftjis" | "windows-31j" => Some("shift_jis")
      case "euc-jp" | "x-euc-jp" | "cseucpkdfmtjapanese" => Some("euc-jp")
      case "gbk" | "gb2312" | "gb_2312" | "gb_2312-80" | "chinese" |
          "csgb2312" | "csiso58gb231280" | "iso-ir-58" | "x-gbk" =>
        Some("gbk")
      case "gb18030" => Some("gb18030")
      case "big5" | "big5-hkscs" | "cn-big5" | "csbig5" | "x-x-big5" =>
        Some("big5")
      case "euc-kr" | "windows-949" | "korean" | "cseuckr" |
          "csksc56011987" | "iso-ir-149" | "ks_c_5601-1987" |
          "ks_c_5601-1989" | "ksc_5601" | "ksc5601" => Some("euc-kr")
      case "iso-2022-jp" | "csiso2022jp" => Some("iso-2022-jp")
      // the single-byte long tail (WHATWG label table rows) — each
      // decodes through a 128-entry `single:<name>` artifact index
      case "koi8-r" | "koi8" | "koi" | "cskoi8r" => Some("koi8-r")
      case "koi8-u" | "koi8-ru" => Some("koi8-u")
      case "windows-1251" | "cp1251" | "x-cp1251" => Some("windows-1251")
      case "windows-1250" | "cp1250" | "x-cp1250" => Some("windows-1250")
      case "iso-8859-2" | "iso8859-2" | "iso88592" | "iso_8859-2" |
          "iso_8859-2:1987" | "iso-ir-101" | "l2" | "latin2" |
          "csisolatin2" => Some("iso-8859-2")
      case "iso-8859-5" | "iso8859-5" | "iso88595" | "iso_8859-5" |
          "iso_8859-5:1988" | "iso-ir-144" | "cyrillic" |
          "csisolatincyrillic" => Some("iso-8859-5")
      case "iso-8859-7" | "iso8859-7" | "iso88597" | "iso_8859-7" |
          "iso_8859-7:1987" | "iso-ir-126" | "greek" | "greek8" |
          "ecma-118" | "elot_928" | "sun_eu_greek" |
          "csisolatingreek" => Some("iso-8859-7")
      case "windows-874" | "dos-874" | "iso-8859-11" | "iso8859-11" |
          "iso885911" | "tis-620" => Some("windows-874")
      case _ => None
    }
  }

  /** Artifact index name for a single-byte encoding. */
  private def singleKey(enc: String): String = s"single:$enc"

  // ------------------------------------------------------------------
  // baked decode tables — arrays built once at expression construction
  // ------------------------------------------------------------------

  /** Pointer-space sizes (max pointer + 1) per index. */
  private val Jis0208Size = (0xFC - 0xC1) * 188 + 188 // lead ≤ 0xFC
  private val Jis0212Size = 94 * 94
  private val GbSize = (0xFE - 0x81) * 190 + 190
  private val Big5Size = (0xFE - 0x81) * 157 + 157
  private val EucKrSize = (0xFE - 0x81) * 190 + 190

  /** Match-ready decode tables for one pinned artifact version.
    * A null array = that index is absent from the pin, and every
    * label needing it stays a named `unsupported-label` rejection.
    */
  final class LegacyTables private[EncodingStore] (
      val jis0208: Array[Int], val jis0212: Array[Int],
      val gb: Array[Int], val big5: Array[Int], val euckr: Array[Int],
      val rangePointers: Array[Int], val rangeCodepoints: Array[Int],
      // single-byte family: encoding name → 128-entry table for bytes
      // 0x80..0xFF (−1 = unmapped → U+FFFD per the WHATWG run)
      val singles: Map[String, Array[Int]] = Map.empty)
      extends Serializable {

    def supports(enc: String): Boolean = enc match {
      case "shift_jis" | "euc-jp" | "iso-2022-jp" => jis0208 != null
      case "gbk" | "gb18030" => gb != null
      case "big5" => big5 != null
      case "euc-kr" => euckr != null
      case e => singles.contains(e)
    }

    /** A stable identity for plan-equality: versioned artifacts are
      * immutable, so (sizes, checksum) distinguishes pins without
      * comparing whole arrays.
      */
    override def hashCode(): Int = java.util.Arrays.hashCode(Array(
      sum(jis0208), sum(jis0212), sum(gb), sum(big5), sum(euckr),
      sum(rangePointers),
      singles.toSeq.sortBy(_._1).map { case (k, v) =>
        k.hashCode ^ sum(v) }.hashCode()))
    override def equals(o: Any): Boolean = o match {
      case t: LegacyTables =>
        java.util.Arrays.equals(jis0208, t.jis0208) &&
          java.util.Arrays.equals(jis0212, t.jis0212) &&
          java.util.Arrays.equals(gb, t.gb) &&
          java.util.Arrays.equals(big5, t.big5) &&
          java.util.Arrays.equals(euckr, t.euckr) &&
          java.util.Arrays.equals(rangePointers, t.rangePointers) &&
          java.util.Arrays.equals(rangeCodepoints, t.rangeCodepoints) &&
          singles.keySet == t.singles.keySet &&
          singles.forall { case (k, v) =>
            java.util.Arrays.equals(v, t.singles(k)) }
      case _ => false
    }
    private def sum(a: Array[Int]): Int =
      if (a == null) -1 else java.util.Arrays.hashCode(a)

    private def lookup(idx: Array[Int], pointer: Int): Int =
      if (pointer < 0 || pointer >= idx.length) -1 else idx(pointer)

    /** gb18030-ranges: code point for a four-byte pointer, or -1.
      * Supplementary pointers (189000–1237575) are the spec's linear
      * formula; BMP pointers binary-search the ranges index.
      */
    private def rangesCodepoint(pointer: Int): Int = {
      if (pointer > 39419 && pointer < 189000) return -1
      if (pointer >= 189000) {
        if (pointer > 1237575) return -1
        return 0x10000 + pointer - 189000
      }
      if (rangePointers == null || rangePointers.length == 0) return -1
      var lo = 0
      var hi = rangePointers.length - 1
      if (pointer < rangePointers(0)) return -1
      while (lo < hi) { // last range pointer <= pointer
        val mid = (lo + hi + 1) >>> 1
        if (rangePointers(mid) <= pointer) lo = mid else hi = mid - 1
      }
      // a negative base is an explicit HOLE marker (a snapshot gap) —
      // the pointer is unmapped, not an offset into thin air
      if (rangeCodepoints(lo) < 0) -1
      else rangeCodepoints(lo) + (pointer - rangePointers(lo))
    }

    /** Decode `b[from..)` as `enc` per the WHATWG state machine —
      * total (U+FFFD for every malformed sequence, with the spec's
      * prepend/restore behavior), deterministic, one pass.
      */
    def decode(enc: String, b: Array[Byte], from: Int): String = {
      val out = new java.lang.StringBuilder(b.length - from)
      // the spec's "prepend byte(s) to stream": a small pushback queue
      // drained before the input (gb18030 restores up to 3 bytes)
      val pushback = new Array[Int](4)
      var nPush = 0
      var i = from
      def hasNext: Boolean = nPush > 0 || i < b.length
      def next(): Int =
        if (nPush > 0) { nPush -= 1; pushback(nPush) }
        else { val v = b(i) & 0xFF; i += 1; v }
      def prepend1(x: Int): Unit = { pushback(nPush) = x; nPush += 1 }
      def prepend(xs: Int*): Unit = {
        // queue drains LIFO, so push in reverse to replay in order
        var k = xs.length - 1
        while (k >= 0) { prepend1(xs(k)); k -= 1 }
      }
      def err(): Unit = out.append('�')

      enc match {
        case "shift_jis" =>
          var lead = 0
          while (hasNext) {
            val byte = next()
            if (lead != 0) {
              val l = lead; lead = 0
              val offset = if (byte < 0x7F) 0x40 else 0x41
              val leadOffset = if (l < 0xA0) 0x81 else 0xC1
              if ((byte >= 0x40 && byte <= 0x7E) ||
                (byte >= 0x80 && byte <= 0xFC)) {
                val pointer = (l - leadOffset) * 188 + byte - offset
                if (pointer >= 8836 && pointer <= 10715)
                  out.appendCodePoint(0xE000 - 8836 + pointer)
                else {
                  val cp = lookup(jis0208, pointer)
                  if (cp >= 0) out.appendCodePoint(cp)
                  else { if (byte <= 0x7F) prepend1(byte); err() }
                }
              } else { if (byte <= 0x7F) prepend1(byte); err() }
            } else if (byte <= 0x80) out.append(byte.toChar)
            else if (byte >= 0xA1 && byte <= 0xDF)
              out.appendCodePoint(0xFF61 - 0xA1 + byte)
            else if ((byte >= 0x81 && byte <= 0x9F) ||
              (byte >= 0xE0 && byte <= 0xFC)) lead = byte
            else err()
          }
          if (lead != 0) err()

        case "euc-jp" =>
          var lead = 0
          var jis0212Flag = false
          while (hasNext) {
            val byte = next()
            if (lead == 0x8E && byte >= 0xA1 && byte <= 0xDF) {
              lead = 0
              out.appendCodePoint(0xFF61 - 0xA1 + byte)
            } else if (lead == 0x8F && byte >= 0xA1 && byte <= 0xFE) {
              jis0212Flag = true; lead = byte
            } else if (lead != 0) {
              val l = lead; lead = 0
              if (l >= 0xA1 && l <= 0xFE && byte >= 0xA1 && byte <= 0xFE) {
                val pointer = (l - 0xA1) * 94 + byte - 0xA1
                val idx = if (jis0212Flag) jis0212 else jis0208
                val cp = lookup(idx, pointer)
                if (cp >= 0) out.appendCodePoint(cp) else err()
              } else { if (byte <= 0x7F) prepend1(byte); err() }
              jis0212Flag = false
            } else if (byte <= 0x7F) out.append(byte.toChar)
            else if (byte == 0x8E || byte == 0x8F ||
              (byte >= 0xA1 && byte <= 0xFE)) lead = byte
            else err()
          }
          if (lead != 0) err()

        case "gbk" | "gb18030" =>
          var first = 0
          var second = 0
          var third = 0
          while (hasNext) {
            val byte = next()
            if (third != 0) {
              if (byte >= 0x30 && byte <= 0x39) {
                val pointer = ((first - 0x81) * 10 + second - 0x30) * 1260 +
                  (third - 0x81) * 10 + byte - 0x30
                val cp = rangesCodepoint(pointer)
                if (cp >= 0) out.appendCodePoint(cp) else err()
              } else { prepend(second, third, byte); err() }
              first = 0; second = 0; third = 0
            } else if (second != 0) {
              if (byte >= 0x81 && byte <= 0xFE) third = byte
              else {
                prepend(second, byte); err()
                first = 0; second = 0
              }
            } else if (first != 0) {
              if (byte >= 0x30 && byte <= 0x39) second = byte
              else {
                val l = first; first = 0
                val offset = if (byte < 0x7F) 0x40 else 0x41
                if ((byte >= 0x40 && byte <= 0x7E) ||
                  (byte >= 0x80 && byte <= 0xFE)) {
                  val cp = lookup(gb, (l - 0x81) * 190 + byte - offset)
                  if (cp >= 0) out.appendCodePoint(cp)
                  else { if (byte <= 0x7F) prepend1(byte); err() }
                } else { if (byte <= 0x7F) prepend1(byte); err() }
              }
            } else if (byte <= 0x7F) out.append(byte.toChar)
            else if (byte == 0x80) out.append('€') // € per §12.2.1
            else if (byte >= 0x81 && byte <= 0xFE) first = byte
            else err()
          }
          if (first != 0 || second != 0 || third != 0) err()

        case "big5" =>
          var lead = 0
          while (hasNext) {
            val byte = next()
            if (lead != 0) {
              val l = lead; lead = 0
              val offset = if (byte < 0x7F) 0x40 else 0x62
              if ((byte >= 0x40 && byte <= 0x7E) ||
                (byte >= 0xA1 && byte <= 0xFE)) {
                val pointer = (l - 0x81) * 157 + byte - offset
                // the four double-code-point entries (§12.1.1) are
                // part of the DECODER, not the index
                pointer match {
                  case 1133 =>
                    out.appendCodePoint(0x00CA).appendCodePoint(0x0304)
                  case 1135 =>
                    out.appendCodePoint(0x00CA).appendCodePoint(0x030C)
                  case 1164 =>
                    out.appendCodePoint(0x00EA).appendCodePoint(0x0304)
                  case 1166 =>
                    out.appendCodePoint(0x00EA).appendCodePoint(0x030C)
                  case p =>
                    val cp = lookup(big5, p)
                    if (cp >= 0) out.appendCodePoint(cp)
                    else { if (byte <= 0x7F) prepend1(byte); err() }
                }
              } else { if (byte <= 0x7F) prepend1(byte); err() }
            } else if (byte <= 0x7F) out.append(byte.toChar)
            else if (byte >= 0x81 && byte <= 0xFE) lead = byte
            else err()
          }
          if (lead != 0) err()

        case "iso-2022-jp" =>
          // the STATEFUL escape-based decoder (§12.2.1): modes are
          // ASCII / Roman (0x5C → ¥, 0x7E → ‾) / half-width katakana /
          // jis0208 double-byte, switched by ESC ( B, ESC ( J,
          // ESC ( I, ESC $ @|B; the output flag makes two escapes
          // with no output between them an error (escape churn must
          // not hide content)
          var state = 0 // 0 ASCII 1 Roman 2 katakana 3 lead 4 trail
          var outputState = 0 //                      5 escStart 6 escape
          var lead = 0
          var outputFlag = false
          while (hasNext) {
            val byte = next()
            state match {
              case 0 =>
                if (byte == 0x1B) state = 5
                else if (byte <= 0x7F && byte != 0x0E && byte != 0x0F) {
                  outputFlag = false; out.append(byte.toChar)
                } else err()
              case 1 =>
                if (byte == 0x1B) state = 5
                else if (byte == 0x5C) {
                  outputFlag = false; out.append('\u00A5')
                } else if (byte == 0x7E) {
                  outputFlag = false; out.append('\u203E')
                } else if (byte <= 0x7F && byte != 0x0E && byte != 0x0F) {
                  outputFlag = false; out.append(byte.toChar)
                } else err()
              case 2 =>
                if (byte == 0x1B) state = 5
                else if (byte >= 0x21 && byte <= 0x5F) {
                  outputFlag = false
                  out.appendCodePoint(0xFF61 - 0x21 + byte)
                } else err()
              case 3 =>
                if (byte == 0x1B) state = 5
                else if (byte >= 0x21 && byte <= 0x7E) {
                  outputFlag = false; lead = byte; state = 4
                } else err()
              case 4 =>
                if (byte == 0x1B) { state = 5; err() }
                else if (byte >= 0x21 && byte <= 0x7E) {
                  state = 3
                  val cp = lookup(jis0208,
                    (lead - 0x21) * 94 + byte - 0x21)
                  if (cp >= 0) out.appendCodePoint(cp) else err()
                } else { state = 3; err() }
              case 5 =>
                if (byte == 0x24 || byte == 0x28) {
                  lead = byte; state = 6
                } else { prepend1(byte); state = outputState; err() }
              case _ =>
                val l = lead; lead = 0
                val ns =
                  if (l == 0x28 && byte == 0x42) 0
                  else if (l == 0x28 && byte == 0x4A) 1
                  else if (l == 0x28 && byte == 0x49) 2
                  else if (l == 0x24 && (byte == 0x40 || byte == 0x42)) 3
                  else -1
                if (ns < 0) { prepend(l, byte); state = outputState; err() }
                else {
                  state = ns; outputState = ns
                  if (outputFlag) err() else outputFlag = true
                }
            }
          }
          // an incomplete pair or a dangling escape at EOS is one error
          if (state == 4 || state == 5 || state == 6) err()

        case "euc-kr" =>
          var lead = 0
          while (hasNext) {
            val byte = next()
            if (lead != 0) {
              val l = lead; lead = 0
              if (byte >= 0x41 && byte <= 0xFE) {
                val cp = lookup(euckr, (l - 0x81) * 190 + byte - 0x41)
                if (cp >= 0) out.appendCodePoint(cp)
                else { if (byte <= 0x7F) prepend1(byte); err() }
              } else { if (byte <= 0x7F) prepend1(byte); err() }
            } else if (byte <= 0x7F) out.append(byte.toChar)
            else if (byte >= 0x81 && byte <= 0xFE) lead = byte
            else err()
          }
          if (lead != 0) err()

        // single-byte family (WHATWG §10): ASCII identity below 0x80,
        // one table lookup above, unmapped → one U+FFFD per byte
        case s if singles.contains(s) =>
          val tbl = singles(s)
          while (hasNext) {
            val byte = next()
            if (byte <= 0x7F) out.append(byte.toChar)
            else {
              val cp = tbl(byte - 0x80)
              if (cp >= 0) out.appendCodePoint(cp) else err()
            }
          }

        case other => throw new IllegalStateException(
          s"unreachable: unhandled legacy encoding $other")
      }
      out.toString
    }
  }

  /** Build match-ready tables from a pinned artifact. */
  def tablesFrom(art: Artifact): LegacyTables = {
    def arr(name: String, size: Int): Array[Int] =
      art.indexes.get(name) match {
        case None => null
        case Some(m) =>
          val a = Array.fill(size)(-1)
          m.foreach { case (p, c) =>
            val pi = p.toInt
            require(pi >= 0 && pi < size,
              s"index $name pointer $pi outside pointer space $size")
            a(pi) = c
          }
          a
      }
    val sortedRanges = art.ranges.sortBy(_.head)
    val singles = art.indexes.keysIterator
      .filter(_.startsWith("single:"))
      .map(k => k.substring("single:".length) -> arr(k, 128))
      .toMap
    new LegacyTables(
      arr("jis0208", Jis0208Size), arr("jis0212", Jis0212Size),
      arr("gb18030", GbSize), arr("big5", Big5Size),
      arr("euc-kr", EucKrSize),
      if (sortedRanges.isEmpty) null else sortedRanges.map(_.head).toArray,
      if (sortedRanges.isEmpty) null else sortedRanges.map(_(1)).toArray,
      singles)
  }

  /** Load + bake a pinned version (negative = latest at construction;
    * 0 invalid — the stores' shared convention).
    */
  def tablesAt(dir: String, version: Int): LegacyTables = {
    require(version != 0,
      "encoding artifact version 0 is invalid (versions are 1-based; " +
        "pass a negative value to pin to the latest at construction)")
    val v = if (version > 0) version
      else versions(dir).lastOption.getOrElse(
        throw new NoSuchElementException(
          s"no encoding artifact versions under $dir"))
    tablesFrom(get(dir, v).getOrElse(
      throw new NoSuchElementException(
        s"encoding artifact version $v missing under $dir")))
  }

  // ------------------------------------------------------------------
  // offline snapshot generation — probe the JDK's own public decoders
  // ------------------------------------------------------------------

  private def probePairs(charsetName: String,
      pairs: Iterator[(Int, Array[Byte])]): Map[Int, Int] = {
    val cs = java.nio.charset.Charset.forName(charsetName)
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val out = java.nio.CharBuffer.allocate(4)
    val b = Map.newBuilder[Int, Int]
    pairs.foreach { case (pointer, bytes) =>
      dec.reset(); out.clear()
      val in = java.nio.ByteBuffer.wrap(bytes)
      val r1 = dec.decode(in, out, true)
      val r2 = dec.flush(out)
      if (!r1.isError && !r2.isError && !in.hasRemaining) {
        out.flip()
        // exactly one BMP char, not the replacement char — multi-char
        // or supplementary results are not index-shaped entries
        if (out.remaining() == 1) {
          val c = out.get()
          if (c != '�') b += pointer -> c.toInt
        }
      }
    }
    b.result()
  }

  /** The five WHATWG-shaped indexes + gb18030 ranges, generated ONCE
    * per JVM by probing the JDK decoders (all in the public
    * `jdk.charsets` module). `save(dir, jdkIndexes, jdkRanges)` is
    * the offline deployment snapshot; a production rollout would save
    * the published WHATWG index files through the same slot.
    */
  lazy val (jdkIndexes, jdkRanges): (Map[String, Map[Int, Int]], Seq[(Int, Int)]) = {
    // jis0208 in shift_jis pointer space via windows-31j (MS932 — the
    // WHATWG index uses the Windows variants); the EUDC band is a
    // formula and stays out of the index
    val jis0208 = probePairs("windows-31j",
      (0 until Jis0208Size).iterator
        .filterNot(p => p >= 8836 && p <= 10715)
        .map { p =>
          val leadIdx = p / 188
          val lead = if (leadIdx < 0x1F) 0x81 + leadIdx else 0xC1 + leadIdx
          val t = p % 188
          val trail = if (t < 0x3F) 0x40 + t else 0x41 + t
          (p, Array(lead.toByte, trail.toByte))
        })
    val jis0212 = probePairs("EUC-JP",
      (0 until Jis0212Size).iterator.map { p =>
        val a = 0xA1 + p / 94
        val bb = 0xA1 + p % 94
        (p, Array(0x8F.toByte, a.toByte, bb.toByte))
      })
    def twoByte(name: String, size: Int, trailOf: Int => Int,
        leadOf: Int => Int): Map[Int, Int] =
      probePairs(name, (0 until size).iterator.flatMap { p =>
        val trail = trailOf(p)
        if (trail < 0) None
        else Some((p, Array(leadOf(p).toByte, trail.toByte)))
      })
    val gb = twoByte("GBK", GbSize,
      p => { val t = p % 190; if (t < 0x3F) 0x40 + t else 0x41 + t },
      p => 0x81 + p / 190)
    val big5 = twoByte("Big5", Big5Size,
      p => { val t = p % 157; if (t < 0x3F) 0x40 + t else 0x62 + t },
      p => 0x81 + p / 157)
    // WHATWG euc-kr IS the windows-949 plane; the JDK's "EUC-KR" is
    // the narrower KS X 1001 and stands in when the extended charset
    // is absent from the JVM
    val euckrName =
      if (java.nio.charset.Charset.isSupported("x-windows-949"))
        "x-windows-949" else "EUC-KR"
    val euckr = twoByte(euckrName, EucKrSize,
      p => 0x41 + p % 190, p => 0x81 + p / 190)
    // gb18030-ranges: probe the four-byte BMP plane (pointers
    // 0..39419 — every one maps) and compress runs where
    // codePoint − pointer is constant into [pointer, codePoint] range
    // heads, the published index's own shape
    val gbCs = java.nio.charset.Charset.forName("GB18030")
    val dec = gbCs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val ranges = Seq.newBuilder[(Int, Int)]
    var lastDelta = Int.MinValue
    var p = 0
    val out = java.nio.CharBuffer.allocate(4)
    while (p < 39420) {
      val b1 = 0x81 + p / 12600
      val b2 = 0x30 + (p / 1260) % 10
      val b3 = 0x81 + (p / 10) % 126
      val b4 = 0x30 + p % 10
      dec.reset(); out.clear()
      val in = java.nio.ByteBuffer.wrap(
        Array(b1.toByte, b2.toByte, b3.toByte, b4.toByte))
      val r1 = dec.decode(in, out, true)
      val r2 = dec.flush(out)
      var mapped = false
      if (!r1.isError && !r2.isError && !in.hasRemaining) {
        out.flip()
        if (out.remaining() == 1) {
          mapped = true
          val cp = out.get().toInt
          if (cp - p != lastDelta) {
            ranges += ((p, cp))
            lastDelta = cp - p
          }
        }
      }
      // a gap (a pointer the JDK rejects) breaks the run AND records
      // an explicit hole marker (codePoint −1) — without it, pointers
      // inside the gap would binary-search into the PRECEDING range
      // and silently mis-map
      if (!mapped && lastDelta != Int.MinValue) {
        ranges += ((p, -1))
        lastDelta = Int.MinValue
      }
      p += 1
    }
    (Map("jis0208" -> jis0208, "jis0212" -> jis0212, "gb18030" -> gb,
      "big5" -> big5, "euc-kr" -> euckr), ranges.result())
  }

  /** The single-byte long tail as a SEPARATE snapshot bundle — 128
    * upper-half bytes per encoding (ASCII identity belongs to the
    * state machine, not the index). Deliberately NOT folded into
    * [[jdkIndexes]]: the existing pins (the funnels' deployed
    * snapshot) keep their exact supported set, and the rollout that
    * ADDS the singles is a new artifact version — which is the whole
    * point of the versioned store, and exactly what
    * `text_charset_singlebyte`'s two pins demonstrate.
    */
  lazy val jdkSingleIndexes: Map[String, Map[Int, Int]] = {
    def single(jdkName: String): Map[Int, Int] = {
      val name =
        if (java.nio.charset.Charset.isSupported(jdkName)) jdkName
        else return Map.empty
      probePairs(name,
        (0 until 128).iterator.map(p => (p, Array((0x80 + p).toByte))))
    }
    Map(
      "koi8-r" -> single("KOI8-R"),
      "koi8-u" -> single("KOI8-U"),
      "windows-1251" -> single("windows-1251"),
      "windows-1250" -> single("windows-1250"),
      "iso-8859-2" -> single("ISO-8859-2"),
      "iso-8859-5" -> single("ISO-8859-5"),
      "iso-8859-7" -> single("ISO-8859-7"),
      // WHATWG windows-874 is the TIS-620 plane + the Windows
      // extensions; the JDK ships it as x-windows-874 (jdk.charsets
      // module). NO TIS-620 fallback: it lacks the extensions (no
      // 0x80 -> U+20AC), so on a JVM without the module the label
      // must stay an honest unsupported-label rejection rather than
      // silently baking a different plane into the artifact.
      "windows-874" -> single("x-windows-874"))
      .collect { case (k, v) if v.nonEmpty => singleKey(k) -> v }
  }

  /** The full JDK snapshot saved once per JVM into one shared scratch
    * dir — the pin every query that just needs "the deployed tables"
    * uses ([[graft.Queries]]' composed funnels); fixtures exercising
    * the VERSIONED rollout path plant their own dirs.
    */
  lazy val jdkSnapshotDir: String = {
    val dir = graft.Scratch.dir("graft_enc_jdk")
    save(dir, jdkIndexes, jdkRanges)
    dir
  }
}
