package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{expr, round}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two float vectors
  * (SURVEY.md §2.J `expr_custom_cosine`) with whole-stage codegen.
  *
  * Performance twin of the HOF formulation
  * `aggregate(zip_with(a,b,(x,y)=>x*y),0d,_+_) / (sqrt(...)*sqrt(...))`:
  * higher-order-function lambdas are interpreted per element, while this
  * compiles to a tight primitive loop inside the generated code — the
  * whole point of dropping to a custom Expression for the 100 TB path.
  *
  * Determinism contract: accumulates dot/norms left-to-right in double,
  * each float element widened first — the exact sequence the HOF twin
  * and the DuckDB oracle (`list_aggregate(list_transform(...),'sum')`)
  * produce, so results are bit-identical to both.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<float> (the embeddings column type); validated
  // by usage rather than ExpectsInputTypes (AbstractDataType is
  // private[sql] and inaccessible from a third-party package).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = xs.getFloat(i).toDouble
      val y = ys.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Register as a SQL function and return a 4-dp-rounded Column
    * (§2.0-6 emit rule). Registration is idempotent per session —
    * guarded so repeat calls (or sessions with GraftExtensions, which
    * injects the same name) don't log a replaced-function WARN. */
  def cos4(s: SparkSession, a: String, b: String): Column = {
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine")
    if (!s.sessionState.functionRegistry.functionExists(id))
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_cosine", es => CosineSimilarity(es.head, es(1)), "built-in")
    round(expr(s"graft_cosine($a, $b)"), 4)
  }
}
