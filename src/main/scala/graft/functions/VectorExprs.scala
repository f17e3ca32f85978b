package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * The `functions.zip_with`/`aggregate` formulation evaluates one interpreted
  * expression tree per ELEMENT; at 64-dim × 160 hyperplanes that is ~10k
  * interpreted evals per row. These expressions run the same math as tight
  * JVM loops over the unsafe array data — [[DotProductExpr]] participates in
  * whole-stage codegen (it sits inside join conditions and projections, the
  * pairwise-hot path), [[HyperplaneBucketsExpr]] computes ALL tables' LSH
  * buckets in one pass per row.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elemKind(e: Expression): String = e.dataType match {
    case ArrayType(FloatType, _) => "Float"
    case ArrayType(DoubleType, _) => "Double"
    case other => throw new IllegalArgumentException(
      s"vec_dot expects array<float|double>, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    (elemKind(left), elemKind(right)) match {
      case ("Float", "Float") =>
        while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i); i += 1 }
      case ("Float", "Double") =>
        while (i < n) { s += x.getFloat(i) * y.getDouble(i); i += 1 }
      case ("Double", "Float") =>
        while (i < n) { s += x.getDouble(i) * y.getFloat(i); i += 1 }
      case _ =>
        while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lk = elemKind(left); val rk = elemKind(right)
      s"""
         |int vdN = Math.min($a.numElements(), $b.numElements());
         |double vdS = 0.0;
         |for (int vdI = 0; vdI < vdN; vdI++) {
         |  vdS += (double) $a.get$lk(vdI) * (double) $b.get$rk(vdI);
         |}
         |${ev.value} = vdS;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** All hyperplane-LSH bucket ids for one vector in a single pass:
  * output[t] = Σ_b (v · planes(t)(b) >= 0 ? 1L << b : 0).
  * `planes` ride along as a plain serialized field (tables × bits × dim
  * doubles — small), flattened once at construction for cache-friendly
  * access. CodegenFallback: one virtual call per ROW, tight loops inside —
  * the per-element interpretation is what mattered, not this dispatch.
  */
case class HyperplaneBucketsExpr(child: Expression,
                                 planes: Seq[Seq[Array[Double]]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"hyperplane_buckets expects array<float|double>, got $other")
  }
  @transient private lazy val nTables = planes.length
  @transient private lazy val nBits = planes.head.length
  @transient private lazy val dim = planes.head.head.length
  // flat[t*nBits*dim + b*dim + i]
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](nTables * nBits * dim)
    var o = 0
    planes.foreach(_.foreach { p =>
      System.arraycopy(p, 0, out, o, dim); o += dim
    })
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val vec = new Array[Double](n)
    var i = 0
    if (isFloat) while (i < n) { vec(i) = v.getFloat(i); i += 1 }
    else while (i < n) { vec(i) = v.getDouble(i); i += 1 }
    val buckets = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var acc = 0L
      var b = 0
      while (b < nBits) {
        val base = (t * nBits + b) * dim
        var s = 0.0
        i = 0
        while (i < n) { s += vec(i) * flat(base + i); i += 1 }
        if (s >= 0) acc |= (1L << b)
        b += 1
      }
      buckets(t) = acc
      t += 1
    }
    new GenericArrayData(buckets)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketsExpr =
    copy(child = newChild)
}
