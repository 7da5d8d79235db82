package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SQL/DataFrame access to Spark's own Bloom-filter sketch pair —
  * `BloomFilterAggregate` (build) and `BloomFilterMightContain` (probe).
  * Spark ships both Catalyst expressions for its runtime row-level
  * join filtering but does NOT register them in the public function
  * registry (probed: `might_contain` is UNRESOLVED_ROUTINE on a stock
  * 4.1 session), so the scale-critical pattern they enable — replace a
  * giant membership JOIN with a broadcastable byte-array sketch — is
  * unreachable from the API. Registered here under `graft_` names, same
  * contract as the other native functions (codegen'd probe; the build
  * side is one TypedImperativeAggregate merging per-partition filters).
  *
  *   graft_bloom_agg(xxhash64(x), estItems, numBits) → binary
  *   graft_might_contain(bloom, xxhash64(y))         → boolean
  *
  * Used by [[graft.operators.ScaleOps.bloomPrefilter]]; see there for
  * the no-false-negative contract and sizing math. */
object BloomFns {
  private val aggIdent = FunctionIdentifier("graft_bloom_agg")
  private val aggInfo =
    new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg")
  private val aggBuilder = (children: Seq[Expression]) => {
    require(children.length == 3,
      "graft_bloom_agg expects exactly 3 arguments " +
        s"(hash: bigint, estItems: bigint, numBits: bigint), got ${children.length}")
    new BloomFilterAggregate(children(0), children(1), children(2))
  }

  private val mcIdent = FunctionIdentifier("graft_might_contain")
  private val mcInfo =
    new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain")
  private val mcBuilder = (children: Seq[Expression]) => {
    require(children.length == 2,
      "graft_might_contain expects exactly 2 arguments " +
        s"(bloom: binary, hash: bigint), got ${children.length}")
    BloomFilterMightContain(children(0), children(1))
  }

  /** SessionExtensions registration (production path). */
  def install(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((aggIdent, aggInfo, aggBuilder))
    ext.injectFunction((mcIdent, mcInfo, mcBuilder))
  }

  /** Idempotent post-hoc registration on an existing session. */
  def register(spark: SparkSession): Unit = synchronized {
    // synchronized: the exists-then-register pair is check-then-act —
    // two racing threads would both pass the check and the second
    // re-registration logs the replacement WARN this guard exists to
    // silence (behavior would stay correct; the builders are constants)
    val reg = spark.sessionState.functionRegistry
    // idempotent AND quiet (no replacement WARN on re-register); both
    // builders are parameterless constants, so first-wins is safe
    if (!reg.functionExists(aggIdent))
      reg.registerFunction(aggIdent, aggInfo, aggBuilder)
    if (!reg.functionExists(mcIdent))
      reg.registerFunction(mcIdent, mcInfo, mcBuilder)
  }
}
