package graft.functions

import scala.collection.concurrent.TrieMap
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.StructType

import graft.model.IndexDef

/** A registered map function — the engine's analog of the reference's
  * user-supplied JS `function OnMap(meta, doc) { emit(...) }`
  * (reference `CGOTRY/v8Instance.cpp:115-176`, `app-model.js:286`).
  *
  * Two flavors, by increasing generality / decreasing optimizability:
  *
  *  - [[ExprMapFunction]]: key derivation is declarative `Column`
  *    expressions. Catalyst sees through it (pushdown, pruning, codegen) —
  *    this is the 100 TB-preferred form and covers the reference's own
  *    examples (single-field extractions, `mapreduceIndex.patch:41-44`).
  *  - [[LambdaMapFunction]]: arbitrary Scala `Row => Iterator[Row]` with
  *    multi-emit (0..n emitted keys per doc — the `emit()` builtin,
  *    reference `CGOTRY/v8Instance.cpp:71-91`). Runs as a typed `flatMap`;
  *    a declared key schema replaces V8's dynamic typing.
  *
  * Unlike the reference's 20-token emit cap (`CGOTRY/Messages.h:17-18`)
  * emission is unbounded — documented divergence, see FunctionCatalogSpec.
  */
sealed trait MapFunction {
  def name: String
  def description: String
}

/** Declarative map function: emitted key = `keyCols` evaluated on the doc. */
final case class ExprMapFunction(
    name: String,
    keyCols: Seq[Column],
    description: String = "") extends MapFunction

/** General map function: `fn(doc) => emitted keys` (multi-emit), each key a
  * Row conforming to `keySchema`. `fn` must be pure and serializable.
  */
final case class LambdaMapFunction(
    name: String,
    keySchema: StructType,
    fn: Row => Iterator[Row],
    description: String = "") extends MapFunction

/** Named map-function registry — the "library" of the reference
  * (save/get/delete handlers, reference `http_handlers.go:2001-2057`,
  * `manager.go:130-144`; consumed at evaluator build time,
  * `Projector/indexjs.go:21`).
  *
  * Registration-time validation replaces the reference's V8 compile check
  * (`http_handlers.go:1210-1223`): expression functions must resolve against
  * a sample schema; lambda functions are probed on sample rows and must not
  * throw (the `recover()` guard of `Projector/indexjs.go:77-81` becomes a
  * registration-time rejection plus a per-row `Try` at run time).
  */
final class FunctionCatalog {
  private val fns = TrieMap.empty[String, MapFunction]
  private val indexes = TrieMap.empty[String, IndexDef]

  def register(fn: MapFunction): Unit = fns.put(fn.name, fn)

  /** Validate + register; returns an error message instead of storing on failure. */
  def registerValidated(fn: MapFunction, sample: DataFrame): Either[String, Unit] = fn match {
    case ExprMapFunction(_, cols, _) =>
      Try(sample.select(cols: _*).queryExecution.analyzed) match {
        case Success(_) => Right(register(fn))
        case Failure(e) => Left(s"key expressions do not resolve: ${e.getMessage}")
      }
    case LambdaMapFunction(_, schema, f, _) =>
      Try(sample.limit(8).collect().foreach { r =>
        f(r).foreach { emitted =>
          require(emitted.length == schema.length,
            s"emitted ${emitted.length} values, declared ${schema.length}")
        }
      }) match {
        case Success(_) => Right(register(fn))
        case Failure(e) => Left(s"map function failed validation: ${e.getMessage}")
      }
  }

  def lookup(name: String): Option[MapFunction] = fns.get(name)
  def drop(name: String): Boolean = fns.remove(name).isDefined
  def list: Seq[String] = fns.keys.toSeq.sorted

  /** Register an index definition, dedup-ing semantically equivalent ones
    * (reference `IsEquivalentIndex`, `Projector/index.go:529-572`). Returns
    * the name of the surviving definition (an existing equivalent, or this).
    */
  def registerIndex(defn: IndexDef): String = this.synchronized {
    // this.synchronized: the find-equivalent + put must be atomic (two
    // concurrent equivalent registrations must converge on one name), and
    // LibraryStore.delete's referential guard holds the same monitor so a
    // function can't be deleted between its dependents-check and the
    // unlink while a new dependent registers
    indexes.values.find(IndexDef.isEquivalent(_, defn)) match {
      case Some(existing) => existing.name
      case None => indexes.put(defn.name, defn); defn.name
    }
  }

  def lookupIndex(name: String): Option[IndexDef] = indexes.get(name)
  def dropIndex(name: String): Boolean = indexes.remove(name).isDefined

  /** Names of registered indexes whose key derivation references the map
    * function — the referential guard [[LibraryStore.delete]] consults
    * before removing a library entry (name-sorted for stable messages).
    */
  def indexesUsing(funcName: String): Seq[String] =
    indexes.values.collect {
      case d if d.funcName.contains(funcName) => d.name
    }.toSeq.sorted
}

object FunctionCatalog {
  /** The session-global registry SQL-facing functions resolve against
    * (the reference's metakv store is likewise one per cluster,
    * `defs.go:22-23`). Scala-API callers can still use private instances.
    */
  val global = new FunctionCatalog
}
