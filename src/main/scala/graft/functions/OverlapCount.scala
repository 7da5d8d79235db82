package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Native distinct-overlap COUNT over two `array<string>` columns —
  * the count-returning sibling of [[JaccardStr]] (same one-pass
  * hash-probe, same §4.3 rationale: the containment verify's
  * built-ins-only form `size(array_intersect(a,b))` materializes the
  * intersection ARRAY per candidate pair just to take its length, and
  * |candidates| ≫ |docs| on that path).
  *
  * Returning the COUNT rather than a ratio keeps both consumers exact:
  * the graded `q_llm_contain` divides it by |a| (one IEEE division of
  * exact ints — bit-identical to the composite, asserted bitwise in
  * the unit suite), while [[graft.Graft.containPairs]] applies its
  * threshold as pure integer arithmetic (count·tDen ≥ |a|·tNum) with
  * no float boundary at all.
  *
  * Semantics — a verbatim drop-in for `size(array_intersect(a,b))` on
  * null-element-free arrays: the number of DISTINCT elements present
  * in both arrays (duplicates on either side count once, matching
  * array_intersect's dedup). Null arrays → null; null ELEMENTS never
  * match (array_intersect would match null with null — the corpus
  * token arrays are null-free).
  */
case class OverlapCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_overlap"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    val set = new java.util.HashSet[Any]()
    var i = 0
    while (i < na) {
      if (!x.isNullAt(i)) set.add(x.getUTF8String(i))
      i += 1
    }
    var common = 0L
    var j = 0
    while (j < nb) {
      // remove-on-match counts each distinct common element once even
      // if the right side carries duplicates
      if (!y.isNullAt(j) && set.remove(y.getUTF8String(j))) common += 1L
      j += 1
    }
    common
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Janino compiles no generics — raw HashSet, explicit casts only.
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val set = ctx.freshName("set")
      val common = ctx.freshName("common")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |java.util.HashSet $set = new java.util.HashSet();
         |for (int $i = 0; $i < $na; $i++) {
         |  if (!$a.isNullAt($i)) $set.add($a.getUTF8String($i));
         |}
         |long $common = 0L;
         |for (int $j = 0; $j < $nb; $j++) {
         |  if (!$b.isNullAt($j) && $set.remove($b.getUTF8String($j))) $common++;
         |}
         |${ev.value} = $common;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): OverlapCount =
    copy(left = newLeft, right = newRight)
}

object OverlapCount {
  private val ident = FunctionIdentifier("graft_overlap")
  private val info = new ExpressionInfo(classOf[OverlapCount].getName, "graft_overlap")
  private val builder = (children: Seq[Expression]) =>
    OverlapCount(children.head, children(1))

  /** SparkSessionExtensions injection (see [[DotF64.install]]). */
  def install(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((ident, info, builder))

  /** Idempotent post-hoc registration for pre-existing sessions. */
  def register(spark: SparkSession): Unit = synchronized {
    // idempotent AND quiet (no replacement WARN on re-register);
    // synchronized because exists-then-register is check-then-act
    if (!spark.sessionState.functionRegistry.functionExists(ident))
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
