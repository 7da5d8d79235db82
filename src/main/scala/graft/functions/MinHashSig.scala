package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature over a token array: distinct 3-gram word
  * shingles → md5-derived 32-bit shingle hash → the 64 minima of the
  * `(aᵢ·x + bᵢ) mod p` universal family — one compiled pass per row.
  *
  * WHY (SURVEY §4.3 ladder, same argument as [[DotF64]]): the
  * column-level per-row form runs THREE interpreted higher-order
  * functions per document (shingle transform, md5 transform, and 64
  * `array_min(transform(...))` passes — lambda variables block
  * whole-stage codegen), which the r7 A/B measured LOSING to the
  * explode + 64-way hash-aggregate form despite that form paying a
  * corpus-wide exchange. This expression is the third rung: the whole
  * signature stage as straight-line JVM code — no lambda interpretation,
  * no intermediate Catalyst arrays, no exchange. The signature stage of
  * the LSH pipeline then becomes a pure scan-side projection at ANY
  * corpus size.
  *
  * Value contract (bit-exact vs the SQL forms, unit-pinned): tokens are
  * used RAW (split on single space — empties kept, matching concat_ws
  * of adjacent split results); shingles are the n−2 joined triples,
  * DISTINCT (Set semantics — min is insensitive to the dedup but the
  * contract mirrors `array_distinct`); x = unsigned value of the first
  * 8 hex chars of md5(shingle) (= Spark `conv(substring(md5(t),1,8),
  * 16,10)`); mins over the exact long arithmetic `(aᵢ·x + bᵢ) % p`
  * with a < 2³¹, x < 2³² so the product stays under 2⁶³ — no overflow
  * in either engine or here. Fewer than 3 tokens → null (the callers
  * filter those rows; the SQL per-row twin yields null mins there too).
  *
  * The generated code delegates to [[MinHashSig.compute]] — a static
  * JVM call inside whole-stage codegen (the win is eliminating
  * interpreted lambdas and intermediate rows, not inlining the md5).
  */
case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "graft_minhash_sig"

  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  override def nullable: Boolean = true

  override protected def nullSafeEval(tokens: Any): Any =
    MinHashSig.compute(tokens.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, tk => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.evalCore($tk);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  /** Bridge for generated code (keeps the per-instance hash family). */
  def evalCore(tokens: ArrayData): ArrayData =
    MinHashSig.compute(tokens, aArr, bArr, p)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Distinct-shingle md5-minhash core. Returns null when < 3 tokens. */
  def compute(tokens: ArrayData, a: Array[Long], b: Array[Long],
              p: Long): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return null
    val toks = new Array[String](n)
    var i = 0
    while (i < n) {
      // split() never yields null elements; defend anyway
      val u = tokens.getUTF8String(i)
      toks(i) = if (u == null) "" else u.toString
      i += 1
    }
    val seen = new java.util.HashSet[String](math.max(16, (n - 2) * 2))
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    i = 0
    while (i < n - 2) {
      val sh = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      if (seen.add(sh)) {
        md.reset()
        val d = md.digest(UTF8String.fromString(sh).getBytes)
        // unsigned value of the first 8 hex chars == first 4 bytes
        val x = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        var j = 0
        while (j < k) {
          val h = (a(j) * x + b(j)) % p
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  private val ident = FunctionIdentifier("graft_minhash_sig")
  private val info =
    new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig")

  private def builder(a: Seq[Long], b: Seq[Long], p: Long) =
    (children: Seq[Expression]) => {
      // explicit arity check: children.head on an empty list (or a
      // silently ignored second argument) would surface as a confusing
      // NoSuchElementException at plan-build time instead of a clean
      // analysis error naming the expected signature
      require(children.length == 1,
        s"graft_minhash_sig expects exactly 1 argument " +
          s"(tokens: array<string>), got ${children.length}")
      MinHashSig(children.head, a, b, p)
    }

  /** SessionExtensions registration (the graded family constants live in
    * LlmOps; injected at session build by [[graft.LocalSession]]). */
  def install(a: Seq[Long], b: Seq[Long], p: Long)(
      ext: SparkSessionExtensions): Unit =
    ext.injectFunction((ident, info, builder(a, b, p)))

  // The hash family last registered per session, so a repeat register
  // with the SAME family can be a quiet no-op (re-registering logs a
  // replacement WARN per call — log noise that also eats the driver's
  // bench output-tail budget) while a DIFFERENT family still replaces
  // the function: a silent first-wins no-op would compute signatures
  // with stale constants for a caller supplying their own family.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, (Seq[Long], Seq[Long], Long)]())

  /** Idempotent post-hoc registration on an existing session: quiet when
    * the session already carries this exact (a, b, p) family, a real
    * (WARN-logged) replacement when the family differs. */
  def register(spark: SparkSession, a: Seq[Long], b: Seq[Long],
               p: Long): Unit = synchronized {
    // synchronized: the known-family check and the re-registration are
    // check-then-act; racing threads would double-register (WARN noise)
    // no JVM-global fallback for extension-built sessions: a global
    // "installed family" is last-wins across sessions, so two sessions
    // extension-built with DIFFERENT families could make register()
    // silently no-op on the wrong one and keep computing signatures
    // with stale constants (r10 advice). The price is one replacement
    // WARN on the first post-hoc register of an extension-built
    // session; every later register with the same family stays quiet.
    val fam = (a, b, p)
    val known = Option(registered.get(spark))
    val same = known.contains(fam) &&
      spark.sessionState.functionRegistry.functionExists(ident)
    if (!same) {
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder(a, b, p))
      registered.put(spark, fam)
    }
  }
}
