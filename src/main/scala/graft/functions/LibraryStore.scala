package graft.functions

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import org.apache.spark.sql.functions.expr

/** Durable library of named map functions — the reference's view/library
  * store (save `http_handlers.go:2031-2057`, get `:1977-1999`, delete
  * `:1839-1866`, all under the metakv path `/eventing/view/`,
  * `defs.go:22-23`) re-expressed as one JSON file per function in a
  * directory. Entries carry the same shape as the reference's
  * `jsonType{appname, appcode, description}` (`defs.go:124-128`), with
  * `appcode` generalized to Spark SQL key expressions + optional WHERE.
  *
  * Consumption mirrors `servicemanager.GetCode(funcname)` at evaluator
  * construction (`Projector/indexjs.go:21`): [[LibraryStore.toMapFunction]]
  * compiles an entry into an [[ExprMapFunction]] for the build path.
  * Lambda functions (arbitrary Scala closures) are deliberately NOT
  * persistable — the JVM has no safe, stable closure serialization across
  * versions; declarative entries are the durable form.
  */
object LibraryStore {

  /** One library entry: `exprs` are Spark SQL expression strings evaluated
    * against the source document (the `SecExprs` analog).
    */
  final case class Entry(
      name: String,
      exprs: Seq[String],
      where: Option[String] = None,
      description: String = "")

  private implicit val formats: Formats = DefaultFormats

  private def file(dir: String, name: String): Path = {
    require(name.matches("[A-Za-z0-9_.-]+"), s"illegal function name: $name")
    Paths.get(dir, s"$name.json")
  }

  /** Save (upsert) an entry; validates expressions parse before storing —
    * the compile-before-accept gate of the reference
    * (`http_handlers.go:1210-1223`).
    */
  def save(dir: String, entry: Entry): Unit = {
    // functions.expr defers parsing to analysis; parse eagerly so a bad
    // expression is rejected at save time, not first use
    val parser = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
    entry.exprs.foreach(parser.parseExpression)
    entry.where.foreach(parser.parseExpression)
    Files.createDirectories(Paths.get(dir))
    Files.writeString(file(dir, entry.name), Serialization.write(entry))
  }

  def get(dir: String, name: String): Option[Entry] = {
    val p = file(dir, name)
    if (Files.exists(p)) Some(Serialization.read[Entry](Files.readString(p)))
    else None
  }

  def delete(dir: String, name: String): Boolean =
    Files.deleteIfExists(file(dir, name))

  def list(dir: String): Seq[Entry] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return Seq.empty
    val stream = Files.list(d)
    try stream.iterator.asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .map(p => Serialization.read[Entry](Files.readString(p)))
      .toSeq.sortBy(_.name)
    finally stream.close()
  }

  /** Compile an entry for the build path (GetCode-at-evaluator-build analog). */
  def toMapFunction(e: Entry): ExprMapFunction =
    ExprMapFunction(e.name, e.exprs.map(expr), e.description)

  /** Load every persisted function into an in-memory catalog. */
  def loadInto(dir: String, catalog: FunctionCatalog): Int = {
    val entries = list(dir)
    entries.foreach(e => catalog.register(toMapFunction(e)))
    entries.size
  }
}
