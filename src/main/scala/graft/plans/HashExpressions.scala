package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `graft_md5_prefix60` — the engine's portable 60-bit hash
  * (Portable.h60) as ONE digest-to-long expression.
  *
  * The composed form `conv(substring(md5(x), 1, 15), 16, 10)::LONG`
  * round-trips through three string materializations per call: the
  * 32-char hex encode of the digest, `conv`'s base-16 parse back to a
  * DECIMAL STRING, and the final cast's decimal parse — all to read the
  * digest's first 60 bits. This expression computes the identical value
  * straight off the digest bytes (first 15 hex digits = bytes 0..6 plus
  * the high nibble of byte 7, big-endian), keeping the md5 contract the
  * DuckDB oracle twin (`('0x' || substr(md5(x),1,15))::BIGINT`) depends
  * on. Bit-identity with the composed form is pinned by
  * Md5Prefix60Spec's generative battery (ASCII/unicode/empty/null).
  *
  * Guide §1.2 step 2 (per-task work): h60 sits under every shingle /
  * fingerprint / permutation-seed path in the dedup, text and
  * similarity families — the hot inner expression of the corpus-scan
  * stages. Hashing cost itself is unchanged (same MD5), only the string
  * plumbing goes.
  */
case class Md5Prefix60(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: org.apache.spark.sql.types.StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_prefix60 expects string, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_prefix60"

  override protected def nullSafeEval(a: Any): Any =
    Md5Prefix60.hash60(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.Md5Prefix60.hash60($a);")

  override protected def withNewChildInternal(
      newChild: Expression): Md5Prefix60 = copy(child = newChild)
}

object Md5Prefix60 {
  // MessageDigest.getInstance per call costs more than the digest for
  // short inputs; one instance per task thread, reset() between calls.
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(utf8 bytes) — exactly
    * `conv(substring(hex(digest), 1, 15), 16, 10)` as an unsigned value:
    * hex digits 1..14 are digest bytes 0..6 big-endian, digit 15 is the
    * high nibble of byte 7. Always in [0, 2^60): non-negative as LONG,
    * same as the composed form (15 hex digits never overflow conv).
    * Callable from generated Java (static forwarder object method).
    */
  def hash60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = md.get()
    d.reset()
    val out = d.digest(s.getBytes)
    ((out(0) & 0xffL) << 52) | ((out(1) & 0xffL) << 44) |
      ((out(2) & 0xffL) << 36) | ((out(3) & 0xffL) << 28) |
      ((out(4) & 0xffL) << 20) | ((out(5) & 0xffL) << 12) |
      ((out(6) & 0xffL) << 4) | ((out(7) & 0xf0L) >>> 4)
  }
}
