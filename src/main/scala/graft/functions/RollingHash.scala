package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style document fingerprint: the minimum 64-bit
  * Karp-Rabin rolling hash over all k-byte windows of the input.
  *
  * Equal fingerprints ⇒ the documents share their "rarest" k-gram —
  * the cheap first-stage signal of winnowing-based near-dup detection
  * (one long per document, groupBy-able like an exact hash).
  *
  * Why a custom Catalyst Expression (SURVEY.md §7.2): a rolling hash
  * needs a stateful scan over the string — not expressible with
  * built-in SQL functions short of exploding every k-gram substring
  * (O(n·k) memory and a shuffle). `doGenCode` emits a static call so
  * the whole-stage codegen pipeline is never broken; the hash itself
  * is a tight O(n) loop over the UTF-8 bytes.
  */
case class RollingMinHash(child: Expression, k: Int)
    extends UnaryExpression {
  // input typing is guaranteed by the registration builder (casts to
  // string); AbstractDataType/ExpectsInputTypes are private[sql]
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_min_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingMinHash.compute(input.asInstanceOf[UTF8String].getBytes, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingMinHash.compute($c.getBytes(), $k)")

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {
  /** Base/modulus-free 64-bit polynomial rolling hash (wrap-around
    * multiplication; BASE odd so the map is a bijection per step).
    */
  final val Base = 0x100000001b3L // FNV prime, odd

  /** min over all k-byte windows of hash(window); whole-string hash
    * when the input is shorter than k. Deterministic, data-parallel,
    * no allocation.
    */
  def compute(bytes: Array[Byte], k: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(k, n)
    // precompute Base^(w-1) for the rolling subtraction
    var basePow = 1L
    var i = 0
    while (i < w - 1) { basePow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    var min = h
    i = w
    while (i < n) {
      h = (h - (bytes(i - w) & 0xff) * basePow) * Base + (bytes(i) & 0xff)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Register `rolling_min_hash(str[, k])` in a session's function
    * registry (the injectFunction seam of SparkSessionExtensions).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("rolling_min_hash"),
      new ExpressionInfo(classOf[RollingMinHash].getName, "rolling_min_hash"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => RollingMinHash(Cast(c, StringType), 8)
        case Seq(c, Literal(k: Int, IntegerType)) => RollingMinHash(Cast(c, StringType), k)
        case other => throw new IllegalArgumentException(
          s"rolling_min_hash(str[, k]) got ${other.size} args")
      })
  }
}
