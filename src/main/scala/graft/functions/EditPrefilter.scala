package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.unsafe.types.UTF8String

/** Native char-histogram / L1 pair for the edit-dedup LOSSLESS prescreen
  * (r15, judge fix for q_llm_editdup's candidate economics).
  *
  * WHY (SURVEY §4.3 ladder): the banded-DP verify `levenshtein(a,b,maxD)`
  * costs ~O(maxD·n) ≈ 250 µs/pair measured, and 97.8% of length-band
  * candidates FAIL it. A character-frequency histogram computed ONCE PER
  * DOC gives a per-PAIR lower bound on edit distance at ~64 integer ops:
  *
  *   - one substitution changes at most 2 histogram count units
  *     (one char count −1, another +1); one insert/delete changes 1;
  *   - hence editDistance(a,b) ≥ ceil(L1(hist_a, hist_b) / 2);
  *   - bucketing chars into 64 bins only MERGES counts, and by the
  *     triangle inequality L1_bucketed ≤ L1_full;
  *   - therefore L1_bucketed > 2·maxD  ⟹  editDistance > maxD.
  *
  * So `graft_l1(h_a, h_b) <= 2·maxD` is a LOSSLESS conjunct in front of
  * the DP: it can never drop a qualifying pair, only doomed ones. The
  * histogram rides the candidate join as a 64-int array (256 B/doc) —
  * computed map-side once per doc, not per pair.
  *
  * Binning: we count UTF-8 LEAD bytes (continuation bytes `10xxxxxx`
  * are skipped), bucketed by `leadByte & 63`. Every character therefore
  * contributes exactly one count unit — the edit-op bound above holds
  * verbatim for any Unicode text — and for ASCII the lead byte IS the
  * character, giving a tight 64-bin spread over letters/digits/punct.
  */
case class CharHist64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_charhist"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    val h = new Array[Int](64)
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b & 0xC0) != 0x80) h(b & 63) += 1
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |int $n = $a.numBytes();
         |int[] $h = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  byte $b = $a.getByte($i);
         |  if (($b & 0xC0) != 0x80) $h[$b & 63]++;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($h);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharHist64 =
    copy(child = newChild)
}

object CharHist64 {
  private val ident = FunctionIdentifier("graft_charhist")
  private val info = new ExpressionInfo(classOf[CharHist64].getName, "graft_charhist")
  private val builder = (children: Seq[Expression]) => CharHist64(children.head)

  def install(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((ident, info, builder))

  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.sessionState.functionRegistry.functionExists(ident))
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}

/** L1 distance between two equal-length `array<int>` columns — the
  * per-pair half of the edit prescreen (see [[CharHist64]]). One tight
  * primitive loop inside whole-stage codegen; no intermediate arrays
  * (the built-ins-only form `aggregate(zip_with(a,b,(x,y)->abs(x-y)),…)`
  * materializes the diff array per pair and runs interpreted). */
case class HistL1(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_l1"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0
    var i = 0
    while (i < n) {
      val d = x.getInt(i) - y.getInt(i)
      s += (if (d < 0) -d else d)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $s = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  int $d = $a.getInt($i) - $b.getInt($i);
         |  $s += ($d < 0) ? -$d : $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HistL1 =
    copy(left = newLeft, right = newRight)
}

object HistL1 {
  private val ident = FunctionIdentifier("graft_l1")
  private val info = new ExpressionInfo(classOf[HistL1].getName, "graft_l1")
  private val builder = (children: Seq[Expression]) =>
    HistL1(children.head, children(1))

  def install(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((ident, info, builder))

  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.sessionState.functionRegistry.functionExists(ident))
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
