package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_jaro_winkler(a, b)`: Jaro-Winkler similarity in [0, 1] as a
  * codegen'd Catalyst expression — the fuzzy-match scorer Spark's
  * function library lacks (it ships only `levenshtein`/`soundex`).
  *
  * Semantics are pinned BIT-FOR-BIT to DuckDB's
  * `jaro_winkler_similarity` (verified by an exhaustive fuzz in
  * JaroWinklerSpec + the q175 oracle): empty input scores 0.0 (not the
  * textbook 1.0 for two empties), match window is
  * max(0, max(|a|,|b|)/2 - 1), transpositions are half the mismatched
  * match positions (integer division), and the Winkler prefix boost
  * `j + l * 0.1 * (1 - j)` (prefix l capped at 4) applies only when
  * jaro > 0.7. Every floating-point step is ordered exactly as
  * documented here, so the score — not just the ranking — is
  * reproducible across engines.
  *
  * O(|a| * window) time, two small boolean scratch arrays; char-unit
  * (UTF-16) comparison, which agrees with DuckDB's byte-unit scan on
  * ASCII — the catalog's comparison domain.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler needs (STRING, STRING), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerSim.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerSim.sim($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_jaro_winkler"
}

object JaroWinklerSim {

  /** Static entry point shared by interpreted eval and generated code. */
  def sim(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](l1)
    val matched2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && a.charAt(i) == b.charAt(j)) {
          matched1(i) = true
          matched2(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatches = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val t = mismatches / 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro > 0.7) {
      val maxPrefix = math.min(4, math.min(l1, l2))
      var l = 0
      while (l < maxPrefix && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Column API. */
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerSim(Bridge.expression(a), Bridge.expression(b)))
}
