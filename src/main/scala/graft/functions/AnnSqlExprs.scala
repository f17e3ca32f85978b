package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.AnnIndex

/** SQL-facing ANN-index-store access — the wire surface of
  * [[graft.operators.AnnIndex]], mirroring `graft_tok_*`
  * ([[TokenizerSqlExprs]]) so a SQL-only client can discover and pin
  * index versions the same way it can tokenizers (reference catalog
  * shape: `http_handlers.go:2031-2057`):
  *
  *   SELECT graft_ann_versions('/store');
  *   SELECT graft_ann_model('/store', 2).n_centroids;
  *   SELECT graft_ann_latest('/store').batches;
  *
  * The model struct carries the index CONFIGURATION + layout facts a
  * client pins and monitors (PQ geometry, centroid count, vector dim,
  * the committed base+ingest batch ids of the codes table) — not the
  * centroid/codebook matrices themselves: those are the probe engine's
  * frozen artifact ([[graft.operators.AnnIndex.probe]] loads them by
  * pinned version), just as the reference's catalog lists index
  * definitions rather than index payloads. `n_batches` > 1 tells an
  * operator the version has absorbed incremental ingests since its
  * build — the signal that schedules a re-train/rebuild.
  *
  * All three are non-deterministic: they read the store at EVAL time and
  * must never be constant-folded into a stale result.
  */
object AnnSqlExprs {

  val modelType: StructType = StructType(Seq(
    StructField("version", IntegerType),
    StructField("m", IntegerType),
    StructField("codebook_k", IntegerType),
    StructField("coarse_probes", IntegerType),
    StructField("n_centroids", IntegerType),
    StructField("dim", IntegerType),
    StructField("n_batches", IntegerType),
    StructField("batches", ArrayType(LongType, containsNull = false)),
    StructField("residual", BooleanType)))

  private[functions] def toRow(dir: String, v: Int): InternalRow = {
    val m = AnnIndex.loadModel(dir, v)
    val batches = AnnIndex.committedBatches(dir, v)
    InternalRow(v, m.m, m.codebookK, m.coarseProbes, m.fine.length,
      m.fine.headOption.map(_.length).getOrElse(0),
      batches.length, new GenericArrayData(batches.toArray),
      m.isResidual)
  }
}

/** `graft_ann_versions(dir)` → array<int> of visible index versions,
  * ascending.
  */
case class AnnVersionsExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_ann_versions"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName, "a string store directory",
      (child.dataType.catalogString, child.dataType == StringType))

  override protected def nullSafeEval(dir: Any): Any =
    new GenericArrayData(AnnIndex.versions(
      dir.asInstanceOf[UTF8String].toString).toArray)

  override protected def withNewChildInternal(newChild: Expression): AnnVersionsExpr =
    copy(child = newChild)
}

/** `graft_ann_model(dir, version)` → model-facts struct, NULL if the
  * version is absent.
  */
case class AnnModelExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = AnnSqlExprs.modelType
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_ann_model"

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
    if (AnnIndex.versions(d).contains(v)) AnnSqlExprs.toRow(d, v) else null
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AnnModelExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_ann_gc(dir, keepLast)` / `graft_tok_gc(dir, keepLast)` /
  * `graft_idx_gc(dir, keepLast)` → array<int> of the versions deleted
  * ([[graft.operators.AnnIndex.gcShadowed]] /
  * [[TokenizerStore.gcShadowed]] /
  * [[graft.operators.IndexStore.gcVersioned]]): the explicit
  * lifecycle sweep, SQL-reachable like the store mutations
  * (`graft_lib_save`, `graft_tok_save`). Stale-claim collection keeps
  * the library default (24 h) — an aggressive sweep is an operator
  * decision made in code, not ambient SQL. Non-deterministic: a GC
  * must run at eval time, never constant-fold.
  */
case class StoreGcExpr(kind: String, left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override lazy val deterministic: Boolean = false
  override def prettyName: String = s"graft_${kind}_gc"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: dir must be a string, got ${left.dataType.catalogString}")
    else if (right.dataType != IntegerType && right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: keepLast must be integral, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(dir: Any, keepLast: Any): Any = {
    val d = dir.asInstanceOf[UTF8String].toString
    val k = keepLast match {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long => l.intValue
    }
    val deleted = kind match {
      case "ann" => AnnIndex.gcShadowed(d, keepLast = k)
      case "tok" => TokenizerStore.gcShadowed(d, keepLast = k)
      case "idx" => graft.operators.IndexStore.gcVersioned(d, keepLast = k)
      case "bm25" => graft.operators.Retrieval.gcShadowed(d, keepLast = k)
      case other => throw new IllegalStateException(s"unknown store kind $other")
    }
    new GenericArrayData(deleted.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StoreGcExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_ann_latest(dir)` → the newest version's model-facts struct,
  * NULL if the store is empty.
  */
case class AnnLatestExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = AnnSqlExprs.modelType
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_ann_latest"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName, "a string store directory",
      (child.dataType.catalogString, child.dataType == StringType))

  override protected def nullSafeEval(dir: Any): Any = {
    val d = dir.asInstanceOf[UTF8String].toString
    AnnIndex.latestVersion(d).map(AnnSqlExprs.toRow(d, _)).orNull
  }

  override protected def withNewChildInternal(newChild: Expression): AnnLatestExpr =
    copy(child = newChild)
}
