package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Native Jaccard similarity over two `array<string>` columns.
  *
  * WHY (SURVEY §4.3 ladder, same rationale as [[DotF64]]): the
  * built-ins-only verify on the near-dup hot path is
  * `size(array_intersect(a,b)) / (size(a)+size(b)-size(…))`, which
  * materializes the intersection ARRAY per candidate pair just to take
  * its length. |candidates| ≫ |docs| on that path; this expression
  * computes the count in one hash-probe pass inside whole-stage codegen
  * — no intermediate array, one HashSet per pair.
  *
  * Semantics — a verbatim drop-in for the composite form: with
  * `common` = number of DISTINCT elements present in both arrays,
  * jacc = common / (|a| + |b| − common) where |·| counts ELEMENTS
  * (callers pass already-distinct arrays, making this true set
  * Jaccard). Exact integer counts into one IEEE division — bit-identical
  * across engines, so swapping it in cannot change an oracle-checked
  * result (asserted bitwise in the unit suite). Null arrays → null;
  * null ELEMENTS never match (the corpus token arrays are null-free;
  * `array_intersect` would instead match null with null).
  * Both-empty → NaN, exactly like the composite's 0/0.
  */
case class JaccardStr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

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
    var common = 0
    var j = 0
    while (j < nb) {
      // remove-on-match counts each distinct common element once even
      // if the right side carries duplicates
      if (!y.isNullAt(j) && set.remove(y.getUTF8String(j))) common += 1
      j += 1
    }
    common.toDouble / (na + nb - common).toDouble
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
         |int $common = 0;
         |for (int $j = 0; $j < $nb; $j++) {
         |  if (!$b.isNullAt($j) && $set.remove($b.getUTF8String($j))) $common++;
         |}
         |${ev.value} = (double) $common / (double) ($na + $nb - $common);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardStr =
    copy(left = newLeft, right = newRight)
}

object JaccardStr {
  private val ident = FunctionIdentifier("graft_jaccard")
  private val info = new ExpressionInfo(classOf[JaccardStr].getName, "graft_jaccard")
  private val builder = (children: Seq[Expression]) =>
    JaccardStr(children.head, children(1))

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
