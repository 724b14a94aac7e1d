package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_jaro_winkler(a, b)`: Jaro-Winkler string similarity as a
  * native Catalyst expression with whole-stage codegen (the generated
  * code calls one static method — no interpreted fallback, no UDF
  * serialization). Used by the record-linkage operator: candidate
  * pairs come from a blocking join, this expression scores them.
  *
  * Semantics pinned to the portable textbook definition so the DuckDB
  * oracle's built-in `jaro_winkler_similarity` replays it exactly
  * (probed case-by-case): standard Jaro with match window
  * `max(|a|,|b|)/2 - 1` (floored at 0), Winkler prefix boost
  * `jw = j + l·0.1·(1−j)` applied only when `j > 0.7` with common
  * prefix `l` capped at 4, and an empty string on either side scoring
  * 0.0 (also for empty-vs-empty — the engine-portable convention).
  * Operates on UTF-16 code units; callers compare ASCII/BMP
  * identifiers (names, codes) where units == code points.
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler expects (string, string), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinkler.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_jaro_winkler"
}

object JaroWinkler {
  /** Static entry point shared by the interpreted and generated paths. */
  def compute(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val ls = s.length
    val lt = t.length
    if (ls == 0 || lt == 0) return 0.0
    if (s == t) return 1.0
    val window = math.max(math.max(ls, lt) / 2 - 1, 0)
    val sMatch = new Array[Boolean](ls)
    val tMatch = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val hi = math.min(lt - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var halfTrans = 0
    i = 0
    while (i < ls) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) halfTrans += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // transpositions FLOOR to an integer (t = ht/2 in integer math) —
    // the DuckDB convention, probed: ('new widget','red widget') has 3
    // out-of-order matches and scores with t=1, not t=1.5
    val jaro = (md / ls + md / lt + (md - (halfTrans / 2)) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxPrefix = math.min(4, math.min(ls, lt))
    while (l < maxPrefix && s.charAt(l) == t.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
