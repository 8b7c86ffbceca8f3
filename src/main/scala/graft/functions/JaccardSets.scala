package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}

/** Native Catalyst expression: Jaccard similarity of two SORTED DISTINCT
  * arrays (string or int64 elements) by a single merge pass — the fused
  * form of `size(array_intersect(a,b)) / size(array_union(a,b))`.
  *
  * Why a custom Expression: that composed form materializes two
  * intermediate arrays (plus their hash sets) per PAIR, and the pair
  * loop is the quadratic inner loop of the blocked dedups — the hottest
  * code in the engine at corpus scale. The merge pass allocates nothing,
  * and inlines into whole-stage codegen. The int64 path exists because
  * even a zero-copy UTF8String compare constructs a wrapper object per
  * element visit — callers hashing their tokens first (`xxhash64` inside
  * a `transform`) turn the inner loop into primitive long compares with
  * no allocation at all, while the Jaccard VALUE is unchanged (the hash
  * is injective on any concrete token set short of a 2^-64 collision,
  * so |∩| and |∪| are preserved).
  *
  * Contract: both inputs must be sorted by the SAME order (`array_sort`:
  * binary string order / signed long order) and duplicate-free
  * (`array_distinct`) — then intersection/union COUNTS equal the
  * composed form's exactly, so the emitted double (|∩| / (n + m - |∩|))
  * is bit-identical to it and to the DuckDB oracles. Two empty arrays
  * give 0/0 = NaN, matching the composed form's behavior under a >=
  * threshold filter (dropped).
  */
case class JaccardSets(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  // Dispatch below keys off left.dataType alone, so a mixed call (long
  // left, string right) would getLong on string ArrayData and silently
  // corrupt — reject anything but matched array<bigint>/array<string>
  // pairs at analysis time instead.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> or two array<string> " +
          s"arguments, got ${l.simpleString} and ${r.simpleString}")
    }

  private def longElems: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val m = ys.numElements()
    var i = 0; var j = 0; var inter = 0L
    if (longElems) {
      while (i < n && j < m) {
        val x = xs.getLong(i); val y = ys.getLong(j)
        if (x == y) { inter += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    } else {
      while (i < n && j < m) {
        val c = xs.getUTF8String(i).compareTo(ys.getUTF8String(j))
        if (c == 0) { inter += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    inter.toDouble / (n + m - inter)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val body = if (longElems) {
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
           |  long $x = $a.getLong($i); long $y = $b.getLong($j);
           |  if ($x == $y) { $inter++; $i++; $j++; }
           |  else if ($x < $y) { $i++; } else { $j++; }
         """.stripMargin
      } else {
        val c = ctx.freshName("c")
        s"""
           |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
           |  if ($c == 0) { $inter++; $i++; $j++; }
           |  else if ($c < 0) { $i++; } else { $j++; }
         """.stripMargin
      }
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $inter = 0L;
         |while ($i < $n && $j < $m) {
         |$body
         |}
         |${ev.value} = ((double) $inter) / ($n + $m - $inter);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSets =
    copy(left = newLeft, right = newRight)
}

object JaccardSets {
  /** Register as a SQL function and return the raw similarity Column
    * (callers apply their own emit rounding). Idempotent per session —
    * guarded so repeat calls (or sessions with GraftExtensions, which
    * injects the same name) don't log a replaced-function WARN. */
  def jac(s: SparkSession, a: String, b: String): Column = {
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("graft_jaccard")
    if (!s.sessionState.functionRegistry.functionExists(id))
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_jaccard", es => JaccardSets(es.head, es(1)), "built-in")
    expr(s"graft_jaccard($a, $b)")
  }
}
