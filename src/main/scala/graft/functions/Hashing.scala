package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives shared by the dedup /
  * similarity / fingerprinting operators.
  *
  * Design constraint: every hash must be computable bit-identically by the
  * DuckDB oracle (driver correctness gate), so we derive 48-bit integers from
  * the standardized md5 hex digest instead of engine-private hashes
  * (Spark `xxhash64` and DuckDB `hash()` disagree). 48 bits keeps all the
  * modular arithmetic below within exact `Long` range.
  *
  * Everything here is built from codegen'd Catalyst built-ins — no UDFs — so
  * hashing stays inside WholeStageCodegen and distributes trivially.
  */
object Hashing {

  /** Mersenne prime 2^31−1: modulus for all MinHash / fingerprint arithmetic.
    * With h < p and multipliers < 2^32, products stay < 2^63 (no overflow).
    */
  val P: Long = 2147483647L

  /** First 48 bits of md5 as a non-negative Long, via the fused
    * codegen'd [[H48]] expression (bit-identical to the composed
    * `conv(substring(md5(c),1,12),16,10)` spelling, minus the per-row
    * hex round-trip — HashingSpec pins the equivalence).
    * DuckDB twin: `('0x' || substr(md5(x), 1, 12))::BIGINT`.
    */
  def h48(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      H48(org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** Driver-side twin of [[h48]] — same md5-prefix integer, computed on
    * the JVM (used to pre-bake literal constants like LSH hyperplanes so
    * plans carry plain doubles instead of 64 md5 expressions).
    */
  def h48String(s: String): Long = h48Bytes(s.getBytes("UTF-8"))

  def h48Bytes(bytes: Array[Byte]): Long = H48.compute(bytes)

  /** h48 reduced mod P — the universal-hash input domain. */
  def h48p(c: Column): Column = h48(c) % P

  /** i-th universal hash of a pre-reduced value `hm` ∈ [0, P):
    * (a_i·hm + b_i) mod P with fixed odd multipliers. Same constants are
    * inlined in the oracle SQL.
    */
  def perm(i: Int, hm: Column): Column =
    (hm * lit(2L * i + 1) + lit((1000003L * i) % P)) % P

  /** SQL fragment of [[h48]] for DuckDB oracle twins. */
  def duckH48(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 12))::BIGINT"

  def duckH48p(expr: String): String = s"${duckH48(expr)} % $P"

  def duckPerm(i: Int, hmExpr: String): String =
    s"((${2L * i + 1}*$hmExpr + ${(1000003L * i) % P}) % $P)"
}
