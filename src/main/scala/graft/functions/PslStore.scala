package graft.functions

import java.nio.file.{Files, Path, Paths}

import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** Versioned store for public-suffix-list artifacts — the load path
  * [[UrlOps]]'s header promised: eTLD+1 against a ~15-entry embedded
  * snapshot mis-keys real multi-label suffixes, which silently
  * distorts domain caps and robots grouping; a deployment loads the
  * FULL list the way the tokenizer loads its artifact
  * ([[TokenizerStore]] — one immutable JSON per version,
  * [[VersionedSlots.claimFile]] slots, construction-time pinning).
  *
  * The artifact is the PSL RULE list in publicsuffix.org's own
  * format, one rule per entry:
  *  - `com`, `co.uk`, `k12.ma.us` — literal suffixes;
  *  - `*.nom.br` — a wildcard label (matches exactly one label);
  *  - `!city.kawasaki.jp` — an exception to a wildcard rule.
  * [[PslStore.registrable]] implements the published matching
  * algorithm: among matching rules an exception prevails (its public
  * suffix is the rule minus its first label), else the rule with the
  * MOST labels; no match falls back to the implicit `*` rule (the top
  * label is the suffix). The registrable domain (eTLD+1) is the
  * public suffix plus one label; a host that IS a public suffix has
  * none (NULL). The list is control-plane-sized (~10k rules in the
  * real PSL), so one JSON per version is the right durability unit
  * and the rule set broadcasts inside the expression to every
  * executor — the same literal-baking shape as
  * `tokenize_from_artifact`.
  */
object PslStore {

  final case class Artifact(version: Int, rules: Seq[String])

  private implicit val formats: Formats = DefaultFormats

  private val FilePattern = "psl_v([0-9]+)\\.json".r

  private def file(dir: String, version: Int): Path =
    Paths.get(dir, s"psl_v$version.json")

  def versions(dir: String): Seq[Int] =
    VersionedSlots.versions(dir, {
      case FilePattern(v) => Some(v.toInt)
      case _ => None
    })

  /** Persist a rule list as the NEXT version (atomic, immutable). */
  def save(dir: String, rules: Seq[String]): Int =
    VersionedSlots.claimFile(dir, v => s"psl_v$v.json",
      versions(dir).lastOption.getOrElse(0) + 1,
      v => Serialization.write(Artifact(v, rules)))

  def get(dir: String, version: Int): Option[Artifact] =
    try Some(Serialization.read[Artifact](
      Files.readString(file(dir, version))))
    catch { case _: java.nio.file.NoSuchFileException => None }

  def latest(dir: String): Option[Artifact] =
    versions(dir).lastOption.flatMap(get(dir, _))

  /** A parsed, match-ready rule set. Built ONCE at expression
    * construction; matching is per-row label-tail walks.
    */
  final class Rules private[PslStore] (
      exact: Set[Seq[String]], wildcards: Set[Seq[String]],
      exceptions: Set[Seq[String]]) extends Serializable {

    /** Labels of the PUBLIC SUFFIX of `labels`, per the published
      * algorithm; the implicit `*` rule backs everything.
      */
    private def suffixLen(labels: Seq[String]): Int = {
      // exception rules prevail: suffix = rule minus its FIRST label
      var best = -1
      exceptions.foreach { r =>
        if (r.length <= labels.length && labels.takeRight(r.length) == r)
          best = math.max(best, r.length - 1)
      }
      if (best >= 0) return best
      var longest = 1 // the implicit * rule
      exact.foreach { r =>
        if (r.length <= labels.length && labels.takeRight(r.length) == r)
          longest = math.max(longest, r.length)
      }
      wildcards.foreach { r =>
        // r excludes the '*': '*.nom.br' stores ['nom','br'] and
        // matches r.length + 1 trailing labels
        if (r.length + 1 <= labels.length &&
          labels.takeRight(r.length + 1).tail == r)
          longest = math.max(longest, r.length + 1)
      }
      longest
    }

    /** eTLD+1 of `host`, or null when the host IS a public suffix (no
      * registrable domain exists). IP literals and single labels pass
      * through unchanged — they are their own policy unit, the
      * [[UrlOps.domainOf]] convention.
      */
    def registrable(host: String): String = {
      if (host.indexOf(':') >= 0 || host.startsWith("[")) return host
      val labels = host.split("\\.", -1).toSeq
      if (labels.length <= 1) return host
      if (labels.forall(l => l.nonEmpty && l.forall(c => c >= '0' && c <= '9')))
        return host // IPv4 literal
      val n = suffixLen(labels)
      if (labels.length <= n) null
      else labels.takeRight(n + 1).mkString(".")
    }
  }

  /** Parse rule strings into a match-ready set. Rules are
    * ASCII-lowercased; comment (`//`) and blank lines are tolerated so
    * a raw PSL file body can be stored as-is.
    */
  def parseRules(rules: Seq[String]): Rules = {
    val exact = Set.newBuilder[Seq[String]]
    val wild = Set.newBuilder[Seq[String]]
    val exc = Set.newBuilder[Seq[String]]
    rules.foreach { raw =>
      val line = raw.trim.toLowerCase(java.util.Locale.ROOT)
      if (line.nonEmpty && !line.startsWith("//")) {
        if (line.startsWith("!"))
          exc += line.substring(1).split("\\.", -1).toSeq
        else if (line.startsWith("*."))
          wild += line.substring(2).split("\\.", -1).toSeq
        else if (!line.contains("*"))
          exact += line.split("\\.", -1).toSeq
        else throw new IllegalArgumentException(
          s"psl: interior wildcard unsupported: '$raw'")
      }
    }
    new Rules(exact.result(), wild.result(), exc.result())
  }
}
