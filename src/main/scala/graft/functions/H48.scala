package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Codegen'd fused form of the engine's portable 48-bit hash: the first
  * 48 bits of md5 as a non-negative long, in ONE step.
  *
  * The composed spelling — `conv(substring(md5(x), 1, 12), 16, 10)` —
  * is already inside whole-stage codegen, but it materializes a 32-char
  * hex `UTF8String` per row only to re-parse 12 characters of it back
  * into the integer the digest already contained. This expression reads
  * the 6 digest bytes directly: no hex encode, no substring slice, no
  * base-16 parse, and the `MessageDigest` instance is thread-local
  * instead of per-row. Values are BIT-IDENTICAL to the composed form
  * (the first 12 hex chars ARE the first 6 bytes, big-endian), so every
  * DuckDB oracle twin — `('0x' || substr(md5(x),1,12))::BIGINT` — and
  * every persisted hash stays valid. HashingSpec pins the equivalence.
  *
  * This is the hot inner operation of every dedup / fingerprint /
  * chunking pipeline (one hash per token n-gram); at 100 TB it runs
  * trillions of times, which is what justifies the custom-Expression
  * escape hatch (same reasoning as [[DotProduct]]).
  */
case class H48(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  // Seq[DataType] <: Seq[AbstractDataType] (covariant override) — the
  // parent type itself is private[sql]
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h48"

  override protected def nullSafeEval(input: Any): Any =
    H48.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H48.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): H48 =
    copy(child = newChild)
}

object H48 {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 6 md5 digest bytes as a big-endian long — identical to parsing
    * the first 12 hex characters of the digest string.
    */
  def compute(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xFFL) << 40) | ((d(1) & 0xFFL) << 32) | ((d(2) & 0xFFL) << 24) |
      ((d(3) & 0xFFL) << 16) | ((d(4) & 0xFFL) << 8) | (d(5) & 0xFFL)
  }
}
