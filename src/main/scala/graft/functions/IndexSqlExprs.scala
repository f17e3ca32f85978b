package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.model.IndexDef
import graft.operators.IndexStore

/** SQL-facing scalar-index DDL — the wire surface for the engine's CORE
  * object, closing the asymmetry where the library, tokenizer and ANN
  * stores were spark-sql-reachable (`graft_lib_*`, `graft_tok_*`,
  * `graft_ann_*`) but the scalar index itself still needed driver Scala
  * to build. The reference's analog is the open-stream DDL RPC
  * (`kv_sender.go:134-151`: a CreateIndex arrives over the wire and the
  * projector builds/maintains the standing index):
  *
  *   SELECT graft_idx_build('/store', 'customer', 'c_custkey',
  *                          array('c_acctbal'), NULL);
  *   SELECT graft_idx_versions('/store');
  *   SELECT graft_idx_def('/store', 1).key_exprs;
  *   SELECT graft_idx_gc('/store', 2);
  *
  * [[IdxBuildExpr]] is a CONTROL-PLANE call like every DDL: it resolves
  * the session's table by name and runs the build job from the eval
  * thread (same-JVM in local mode, where all driver-contract SQL runs;
  * a cluster deployment issues DDL from the driver, exactly as the
  * reference issues it from the admin endpoint, not a data node). All
  * exprs are non-deterministic: they touch the store at eval time and
  * must never constant-fold into a stale result.
  */
object IndexSqlExprs {

  val defType: StructType = StructType(Seq(
    StructField("version", IntegerType),
    StructField("name", StringType),
    StructField("source", StringType),
    StructField("docid_expr", StringType),
    StructField("key_exprs", ArrayType(StringType, containsNull = false)),
    StructField("where_expr", StringType),
    StructField("is_primary", BooleanType),
    StructField("is_array", BooleanType)))

  private[functions] def defRow(dir: String, v: Int): InternalRow = {
    val d = IndexStore.loadDef(dir, v)
    InternalRow(v, UTF8String.fromString(d.name),
      UTF8String.fromString(d.source), UTF8String.fromString(d.docidExpr),
      new GenericArrayData(d.secExprs.map(UTF8String.fromString).toArray),
      d.whereExpr.map(UTF8String.fromString).orNull,
      d.isPrimary, d.isArrayIndex)
  }

  // Lookup through the API companion (the one holder populated on task
  // threads — its default survives where every thread-local active does
  // not), then downcast: the build needs the classic session, and the
  // CLASSIC companion's thread-local is what the nested job's
  // SparkPlan.session resolves from (IdxBuildExpr sets it around the
  // build).
  private[functions] def session: org.apache.spark.sql.classic.SparkSession =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .getOrElse(throw new IllegalStateException(
        "graft_idx_build needs a SparkSession in this JVM (control-plane DDL)"))
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
}

/** `graft_idx_build(dir, source_table, docid_expr, key_exprs, where)` →
  * int version: build the index over the session table `source_table`
  * and persist it as the store's next immutable version
  * ([[IndexStore.buildVersioned]]). An empty `key_exprs` array builds a
  * PRIMARY index (all docids); `where` NULL means no partial-index
  * predicate. Expressions are validated by the build (a bad expression
  * fails the call, not a later read).
  */
case class IdxBuildExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_idx_build"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (children.length != 5)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes (dir, source_table, docid_expr, key_exprs, where)")
    else if (children.take(3).exists(_.dataType != StringType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: dir, source_table and docid_expr must be strings")
    else if (!(children(3).dataType match {
      // a bare `array()` (the primary-index form) types as array<void>
      case ArrayType(StringType | NullType, _) => true
      case _ => false
    }))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: key_exprs must be array<string>, got " +
          children(3).dataType.catalogString)
    else if (children(4).dataType != StringType && children(4).dataType != NullType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: where must be a string or NULL")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    def str(i: Int): String = children(i).eval(input) match {
      case null => null
      case s: UTF8String => s.toString
    }
    val dir = str(0); val table = str(1); val docid = str(2)
    require(dir != null && table != null && docid != null,
      s"$prettyName: dir, source_table and docid_expr must be non-null")
    val keys = children(3).eval(input) match {
      case null => Seq.empty[String]
      case a: ArrayData =>
        a.toArray[UTF8String](StringType).map(_.toString).toSeq
    }
    val where = Option(str(4))
    val spark = IndexSqlExprs.session
    val defn = IndexDef(s"sql_$table", table, docid,
      secExprs = keys, whereExpr = where, isPrimary = keys.isEmpty)
    // Control-plane DDL evaluated from a TASK thread (same JVM): the
    // nested build job must plan as if on a driver thread — a fresh
    // thread carries no TaskContext and no stale session thread-locals,
    // so we set the classic active session (what SparkPlan.session
    // resolves from) and run the build there, like every engine that
    // services DDL RPCs off its data path.
    var result: Int = -1
    var err: Throwable = null
    val t = new Thread(() => {
      try {
        org.apache.spark.sql.classic.SparkSession.setActiveSession(spark)
        result = IndexStore.buildVersioned(spark.table(table), dir, defn)
      } catch { case e: Throwable => err = e }
    }, "graft-idx-build")
    t.start()
    t.join()
    if (err != null) throw err
    result
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): IdxBuildExpr =
    copy(children = newChildren)
}

/** `graft_idx_versions(dir)` → array<int> of visible index versions,
  * ascending.
  */
case class IdxVersionsExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_idx_versions"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName, "a string store directory",
      (child.dataType.catalogString, child.dataType == StringType))

  override protected def nullSafeEval(dir: Any): Any =
    new GenericArrayData(IndexStore.versionsOf(
      dir.asInstanceOf[UTF8String].toString).toArray)

  override protected def withNewChildInternal(newChild: Expression): IdxVersionsExpr =
    copy(child = newChild)
}

/** `graft_idx_def(dir, version)` → the pinned version's definition facts
  * struct, NULL if the version is absent.
  */
case class IdxDefExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = IndexSqlExprs.defType
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_idx_def"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: dir must be a string, got ${left.dataType.catalogString}")
    else if (right.dataType != IntegerType && right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: version must be integral, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(dir: Any, version: Any): Any = {
    val d = dir.asInstanceOf[UTF8String].toString
    val v = version match {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long => l.intValue
    }
    if (IndexStore.versionsOf(d).contains(v)) IndexSqlExprs.defRow(d, v)
    else null
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IdxDefExpr =
    copy(left = newLeft, right = newRight)
}
