package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared scalar core for [[JaroWinkler]] — one static method called from
  * both the interpreted `nullSafeEval` and the generated code, the same
  * pattern Spark's own `Levenshtein` uses (`UTF8String.levenshteinDistance`):
  * the call site stays inside whole-stage codegen and the JIT inlines the
  * static body, without duplicating a 50-line algorithm as a Java string.
  *
  * Algorithm: classic Jaro similarity (match window `max(l1,l2)/2 − 1`,
  * half-transposition count) with the Winkler prefix boost —
  * `jw = jaro + ℓ·0.1·(1 − jaro)` for common prefix ℓ ≤ 4, applied only when
  * `jaro > 0.7` (Winkler 1990's boost threshold). Semantics pinned to
  * DuckDB's `jaro_winkler_similarity` (the oracle engine), probed on the
  * published test pairs: martha/marhta → 0.961111, dixon/dicksonx →
  * 0.813333, dwayne/duane → 0.84, and the edge cases — EITHER input empty
  * → 0.0 (including both empty), boost suppressed at jaro ≤ 0.7 even with
  * a common prefix (abcdefgh/abzzzzzz → 0.5, not 0.6).
  *
  * Operates on UTF-16 code units of the decoded string. The engine only
  * applies it to normalized ASCII text (TextOps.normed), where code unit =
  * code point = byte, so parity with DuckDB's byte-oriented scan is exact;
  * for non-BMP input the two engines' length units would differ (documented
  * limitation, same class as Spark's own `levenshtein` vs DuckDB's).
  */
object JaroWinklerImpl {
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // half-transpositions: matched chars compared in their own orders
    var half = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) half += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val t = (half / 2).toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

/** `jaro_winkler(string, string) → double` as a native Catalyst expression
  * (SURVEY.md §7.2 "custom pieces" preference order: codegen Expression over
  * UDF). A Scala UDF here would box both strings and break the
  * whole-stage-codegen span of the dedup verify tier it serves; this emits a
  * single static call inside the generated consume path.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerImpl.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
