package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_bm25_versions(dir)` → array<int> of visible BM25 index store
  * versions, ascending — the retrieval store's wire discovery, mirroring
  * `graft_ann_versions`/`graft_tok_versions`/`graft_idx_versions` so
  * every versioned artifact store is SQL-discoverable the same way
  * (GC likewise: `graft_bm25_gc` via [[StoreGcExpr]]). Non-deterministic:
  * reads the store at eval time, never constant-folds.
  */
case class Bm25VersionsExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_bm25_versions"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName, "a string store directory",
      (child.dataType.catalogString, child.dataType == StringType))

  override protected def nullSafeEval(dir: Any): Any =
    new GenericArrayData(graft.operators.Retrieval.versionsOf(
      dir.asInstanceOf[UTF8String].toString).toArray)

  override protected def withNewChildInternal(newChild: Expression): Bm25VersionsExpr =
    copy(child = newChild)
}
