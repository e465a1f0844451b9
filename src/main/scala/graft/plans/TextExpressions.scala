package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Numeric character reference decode — `graft_ncr_decode`: one
  * left-to-right pass replacing `&#NNNN;` (1–7 decimal digits) and
  * `&#xHHHH;` / `&#XHHHH;` (1–6 hex digits) with the referenced Unicode
  * codepoint. This is the GRAMMAR half of HTML entity decoding (t45):
  * the named-entity table is finite configuration a replace chain
  * handles, but the numeric form is an infinite family that needs a
  * computed `appendCodePoint` — which Spark's builtin `chr` cannot
  * supply (it reduces mod 256: ASCII, not Unicode).
  *
  * Contract, mirrored exactly by the DuckDB oracle's
  * split/extract/reassemble form:
  *   - a reference decodes iff its digits fit the bounded grammar AND
  *     the value is a VALID scalar codepoint: 1 ≤ cp ≤ 0x10FFFF and not
  *     a surrogate (0xD800–0xDFFF). Anything else (`&#0;`,
  *     `&#99999999;`, `&#xD800;`, `&#x;`, unterminated `&#12`) passes
  *     through as literal text — malformed input must never fail the
  *     scan or desync the two engines;
  *   - replacement text is never rescanned WITHIN this pass (single
  *     pass): `&#38;#60;` yields `&#60;` literally, the same answer a
  *     global regex replace gives because matches are disjoint and
  *     replacements are not re-matched. Note the STAGED-grammar
  *     consequence one level up, deliberate and spec-pinned
  *     (HtmlExtractSpec's decode-ordering test): t45 runs this pass
  *     BEFORE its named-entity table, so a decoded '&' can re-form a
  *     named entity for that later stage — `&#38;lt;` ends as `<`,
  *     where single-pass HTML decoding would leave `&lt;`. Both
  *     engines implement the same staging, so the gate pins it; a
  *     caller needing HTML-spec never-reparse semantics would fold the
  *     named table into this expression instead of chaining.
  *
  * Reference behavior (HTML spec numeric references, restricted to the
  * always-valid subset): /root/reference has no HTML layer — this is
  * the t45 extraction stage's grammar, engine-portable by construction.
  */
case class NcrDecode(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: org.apache.spark.sql.types.StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_ncr_decode expects string, got ${t.sql}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "graft_ncr_decode"

  override protected def nullSafeEval(a: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      NcrDecode.decode(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // one Java method per query, shared by every row — the scan loop
      // is branchy enough that inlining it per call site would bloat
      // the generated method for no gain. Instance-private, NOT static:
      // when codegen size-splitting moves added functions into a
      // non-static nested inner class, a static member is illegal Java
      // and Janino rejects the whole generated class
      val decodeFn = ctx.addNewFunction("graftNcrDecode",
        s"""
           |private java.lang.String graftNcrDecode(java.lang.String s) {
           |  int i = s.indexOf("&#");
           |  if (i < 0) return s;
           |  java.lang.StringBuilder sb = new java.lang.StringBuilder(s.length());
           |  int pos = 0;
           |  while (i >= 0) {
           |    int j = i + 2;
           |    boolean hex = false;
           |    if (j < s.length() && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) {
           |      hex = true; j++;
           |    }
           |    int start = j;
           |    int maxD = hex ? 6 : 7;
           |    long cp = 0L;
           |    while (j < s.length() && j - start < maxD) {
           |      char c = s.charAt(j);
           |      int dv;
           |      if (c >= '0' && c <= '9') dv = c - '0';
           |      else if (hex && c >= 'a' && c <= 'f') dv = c - 'a' + 10;
           |      else if (hex && c >= 'A' && c <= 'F') dv = c - 'A' + 10;
           |      else break;
           |      cp = cp * (hex ? 16 : 10) + dv;
           |      j++;
           |    }
           |    int nd = j - start;
           |    boolean ok = nd >= 1 && j < s.length() && s.charAt(j) == ';'
           |      && cp >= 1L && cp <= 0x10FFFFL
           |      && !(cp >= 0xD800L && cp <= 0xDFFFL);
           |    if (ok) {
           |      sb.append(s, pos, i);
           |      sb.appendCodePoint((int) cp);
           |      pos = j + 1;
           |      i = s.indexOf("&#", pos);
           |    } else {
           |      i = s.indexOf("&#", i + 1);
           |    }
           |  }
           |  sb.append(s, pos, s.length());
           |  return sb.toString();
           |}
         """.stripMargin)
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$decodeFn($a.toString()));"
    })

  override protected def withNewChildInternal(
      newChild: Expression): NcrDecode = copy(child = newChild)
}

object NcrDecode {
  /** Interpreted twin of the generated scan — byte-for-byte the same
    * algorithm; PropertiesSpec-style parity between the two engines is
    * pinned by HtmlExtractSpec's generative battery running both paths.
    */
  private[graft] def decode(s: String): String = {
    var i = s.indexOf("&#")
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var pos = 0
    while (i >= 0) {
      var j = i + 2
      var hex = false
      if (j < s.length && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) {
        hex = true; j += 1
      }
      val start = j
      val maxD = if (hex) 6 else 7
      var cp = 0L
      var stop = false
      while (j < s.length && j - start < maxD && !stop) {
        val c = s.charAt(j)
        val dv =
          if (c >= '0' && c <= '9') c - '0'
          else if (hex && c >= 'a' && c <= 'f') c - 'a' + 10
          else if (hex && c >= 'A' && c <= 'F') c - 'A' + 10
          else -1
        if (dv < 0) stop = true
        else { cp = cp * (if (hex) 16 else 10) + dv; j += 1 }
      }
      val nd = j - start
      val ok = nd >= 1 && j < s.length && s.charAt(j) == ';' &&
        cp >= 1L && cp <= 0x10FFFFL && !(cp >= 0xD800L && cp <= 0xDFFFL)
      if (ok) {
        sb.append(s, pos, i)
        sb.appendCodePoint(cp.toInt)
        pos = j + 1
        i = s.indexOf("&#", pos)
      } else {
        i = s.indexOf("&#", i + 1)
      }
    }
    sb.append(s, pos, s.length)
    sb.toString
  }
}
