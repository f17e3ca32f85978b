package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-facing library CRUD — the wire-accessible shape of the reference's
  * HTTP library API (`manager.go:130-144` routes; save
  * `http_handlers.go:2031-2057`, get `:1977-1999`, delete `:1839-1866`,
  * temp store `:1922-1999`), re-expressed as session functions so a
  * `spark-sql` / Thrift / Connect user can manage the function library
  * with no driver-side code:
  *
  *   SELECT graft_lib_save('/lib', 'bal', array('c_acctbal'), NULL, 'key');
  *   SELECT graft_lib_get('/lib', 'bal');
  *   SELECT explode(graft_lib_list('/lib'));
  *   SELECT graft_lib_save_draft('/lib', 'bal', array('c_acctbal*2'));
  *   SELECT graft_lib_promote('/lib', 'bal');
  *   SELECT graft_lib_delete('/lib', 'bal');
  *
  * The mutating forms are admin calls, not data-plane expressions: they
  * are declared non-deterministic (never constant-folded, never pushed
  * into scans) and are meant to run over a single row, exactly like the
  * one-request-one-effect HTTP endpoints they mirror. All validation
  * (name legality, eager expression parse with line/column positions,
  * draft isolation) is [[LibraryStore]]'s.
  */
object LibrarySqlExprs {

  val entryType: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("exprs", ArrayType(StringType)),
    StructField("where", StringType),
    StructField("description", StringType)))

  private[functions] def toRow(e: LibraryStore.Entry): InternalRow =
    InternalRow(
      UTF8String.fromString(e.name),
      new GenericArrayData(e.exprs.map(UTF8String.fromString)),
      e.where.map(UTF8String.fromString).orNull,
      UTF8String.fromString(e.description))

  private[functions] def str(v: Any): String =
    if (v == null) null else v.asInstanceOf[UTF8String].toString

  /** Optional trailing flags must be BOOLEAN at analysis time — `'true'`
    * or `1` silently meaning "not set" is the ClassCastException class of
    * bug these admin calls exist to avoid (same contract as the data-path
    * expressions' checkInputDataTypes).
    */
  private[functions] def checkFlag(
      fn: String, flag: String, children: Seq[Expression],
      idx: Int): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (children.length > idx && children(idx).dataType != BooleanType)
      TypeCheckResult.TypeCheckFailure(
        s"$fn: $flag must be BOOLEAN, got ${children(idx).dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }
}

/** `graft_lib_save[_draft](dir, name, exprs[, where[, description]])` →
  * 'saved' / 'draft'. Fails analysis-free at eval with the parser's
  * line/column on a bad expression (the editor-marker contract).
  */
case class LibSaveExpr(children: Seq[Expression], draft: Boolean)
    extends Expression with CodegenFallback {

  require(children.length >= 3 && children.length <= 5,
    "graft_lib_save(dir, name, exprs[, where[, description]])")

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = false
  override def prettyName: String =
    if (draft) "graft_lib_save_draft" else "graft_lib_save"

  override def eval(input: InternalRow): Any = {
    import LibrarySqlExprs.str
    val dir = str(children(0).eval(input))
    val name = str(children(1).eval(input))
    val exprs = children(2).eval(input).asInstanceOf[ArrayData]
      .toObjectArray(StringType).map(v => LibrarySqlExprs.str(v)).toSeq
    val where = if (children.length > 3) Option(str(children(3).eval(input))) else None
    val desc = if (children.length > 4) str(children(4).eval(input)) else ""
    val entry = LibraryStore.Entry(name, exprs, where,
      if (desc == null) "" else desc)
    if (draft) { LibraryStore.saveTemp(dir, entry); UTF8String.fromString("draft") }
    else { LibraryStore.save(dir, entry); UTF8String.fromString("saved") }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LibSaveExpr =
    copy(children = newChildren)
}

/** `graft_lib_promote(dir, name)` → 'promoted' (draft deployed to primary). */
case class LibPromoteExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = StringType
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_lib_promote"

  override def nullSafeEval(dir: Any, name: Any): Any = {
    LibraryStore.promote(dir.asInstanceOf[UTF8String].toString,
      name.asInstanceOf[UTF8String].toString)
    UTF8String.fromString("promoted")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LibPromoteExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_lib_delete(dir, name[, force])` → whether an entry existed and
  * was removed. Refuses (with the dependent index names) when a
  * registered index still references the function and `force` is not
  * true — the referential guard the reference's open to-do
  * (`http_handlers.go:1842`) never grew; see [[LibraryStore.delete]].
  */
case class LibDeleteExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {

  require(children.length == 2 || children.length == 3,
    "graft_lib_delete(dir, name[, force])")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_lib_delete"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    LibrarySqlExprs.checkFlag(prettyName, "force", children, 2)

  override def eval(input: InternalRow): Any = {
    import LibrarySqlExprs.str
    val dir = str(children(0).eval(input))
    val name = str(children(1).eval(input))
    // null-in/null-out, the BinaryExpression contract the 2-arg form had
    if (dir == null || name == null) return null
    val force = children.length == 3 &&
      children(2).eval(input) == java.lang.Boolean.TRUE
    LibraryStore.delete(dir, name, force = force)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LibDeleteExpr =
    copy(children = newChildren)
}

/** `graft_lib_get(dir, name[, draft])` → entry struct, or NULL if absent. */
case class LibGetExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {

  require(children.length == 2 || children.length == 3,
    "graft_lib_get(dir, name[, draft])")

  override def dataType: DataType = LibrarySqlExprs.entryType
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_lib_get"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    LibrarySqlExprs.checkFlag(prettyName, "draft", children, 2)

  override def eval(input: InternalRow): Any = {
    import LibrarySqlExprs.str
    val dir = str(children(0).eval(input))
    val name = str(children(1).eval(input))
    val draft = children.length == 3 &&
      children(2).eval(input) == java.lang.Boolean.TRUE
    val got = if (draft) LibraryStore.getTemp(dir, name)
              else LibraryStore.get(dir, name)
    got.map(LibrarySqlExprs.toRow).orNull
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LibGetExpr =
    copy(children = newChildren)
}

/** `graft_lib_list(dir[, draft])` → array of entry structs (name order). */
case class LibListExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {

  require(children.length == 1 || children.length == 2,
    "graft_lib_list(dir[, draft])")

  override def dataType: DataType = ArrayType(LibrarySqlExprs.entryType)
  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_lib_list"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    LibrarySqlExprs.checkFlag(prettyName, "draft", children, 1)

  override def eval(input: InternalRow): Any = {
    val dir = LibrarySqlExprs.str(children(0).eval(input))
    val draft = children.length == 2 &&
      children(1).eval(input) == java.lang.Boolean.TRUE
    val entries = if (draft) LibraryStore.listTemp(dir) else LibraryStore.list(dir)
    new GenericArrayData(entries.map(LibrarySqlExprs.toRow))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LibListExpr =
    copy(children = newChildren)
}
