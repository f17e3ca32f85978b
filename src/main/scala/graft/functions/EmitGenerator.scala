package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StructField, StructType}

/** SQL-facing multi-emit UDTF: a registered [[LambdaMapFunction]] exposed
  * as a Catalyst `Generator`, so the reference's `OnMap`/`emit` capability
  * (SURVEY §2.3; reference `CGOTRY/v8Instance.cpp:71-176`) is usable from
  * SQL as
  *
  * {{{
  *   SELECT t.key, docid FROM docs
  *   LATERAL VIEW graft_emit('fn_name', col1, col2) t AS key
  * }}}
  *
  * The function is resolved from [[FunctionCatalog.global]] at expression
  * BUILD time (on the driver) and the closure ships inside the expression
  * with the serialized plan — executors never need the registry. The
  * lambda sees its arguments as a `Row` in argument order; emissions
  * conform to its declared key schema. Per-row panic safety matches the
  * flatMap path (a throwing function emits nothing for that row —
  * reference `recover()`, `Projector/indexjs.go:77-81`).
  */
case class EmitGenerator(fn: LambdaMapFunction, children: Seq[Expression])
    extends Generator with CodegenFallback {

  override def elementSchema: StructType = fn.keySchema
  override def prettyName: String = "graft_emit"

  @transient private lazy val inputSchema = StructType(
    children.zipWithIndex.map { case (c, i) =>
      StructField(s"c$i", c.dataType, c.nullable)
    })
  @transient private lazy val toScala =
    CatalystTypeConverters.createToScalaConverter(inputSchema)
  @transient private lazy val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(fn.keySchema)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val row = toScala(InternalRow.fromSeq(children.map(_.eval(input))))
      .asInstanceOf[Row]
    scala.util.Try(
      fn.fn(row).map(r => toCatalyst(r).asInstanceOf[InternalRow]).toSeq)
      .getOrElse(Seq.empty)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EmitGenerator =
    copy(children = newChildren)
}
