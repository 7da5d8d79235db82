package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Native dot product over two `array<double>` columns.
  *
  * WHY a custom Catalyst expression (SURVEY §4.3 ladder): the built-in
  * formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is a
  * higher-order function — Spark evaluates HOFs interpreted (lambda
  * variables block codegen), allocates the intermediate product array,
  * and boxes every element. On the pairwise-similarity hot path
  * (embedding near-dup: |pairs| ≫ |rows|) that interpreted fold is the
  * dominant cost. This expression generates a primitive loop inside
  * whole-stage codegen — no allocation, no boxing — and its interpreted
  * `nullSafeEval` matches bit-for-bit.
  *
  * Determinism (§7.4): a sequential left fold from 0.0 in element
  * order — the exact reduction sequence of both the HOF form and
  * DuckDB's `list_aggregate(list_transform(a,(x,i)->x*b[i]),'sum')`,
  * so swapping this in cannot change an oracle-checked result.
  * Null/length semantics: null ARRAY → null; lengths may differ — the
  * fold runs over the common prefix (embeddings are fixed-width; the
  * relaxed rule keeps the expression total). Null ELEMENTS contribute
  * 0 — NOTE this differs from the HOF form, which nulls the whole sum;
  * the vector tables here are null-free so the forms agree on all
  * oracle paths (asserted bitwise in the unit suite).
  */
case class DotF64(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // AbstractDataType is private[sql]; DataType is its public subtype and
  // the override is return-type covariant.
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getDouble(i) * y.getDouble(i)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF64 =
    copy(left = newLeft, right = newRight)
}

object DotF64 {
  private val ident = FunctionIdentifier("graft_dot")
  private val info = new ExpressionInfo(classOf[DotF64].getName, "graft_dot")
  private val builder = (children: Seq[Expression]) =>
    DotF64(children.head, children(1))

  /** Production registration path: inject `graft_dot` via
    * SparkSessionExtensions (`.withExtensions(DotF64.install)` at
    * session build), making the expression available to SQL text and —
    * through `functions.call_function("graft_dot", …)` — the DataFrame
    * API. */
  def install(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((ident, info, builder))

  /** Idempotent post-hoc registration on an existing session (getOrCreate
    * may return a session built before extensions could apply). */
  def register(spark: SparkSession): Unit = synchronized {
    // idempotent AND quiet (no replacement WARN on re-register);
    // synchronized because exists-then-register is check-then-act
    if (!spark.sessionState.functionRegistry.functionExists(ident))
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
