package graft.plans

import graft.functions.JaccardSets
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

/** Optimizer rule (injected by GraftExtensions): rewrite the composed
  * set-Jaccard
  *
  * {{{ size(array_intersect(a, b)) / size(array_union(a, b)) }}}
  *
  * into the fused single-merge-pass `graft_jaccard(a, b)` expression —
  * the composed form materializes two intermediate arrays plus their
  * hash sets PER PAIR, which is the inner loop of every blocked dedup at
  * corpus scale (see JaccardSets).
  *
  * The fusion is only semantics-preserving when both inputs are provably
  * sorted, duplicate-free, null-free string arrays, so the rule fires
  * solely on the canonical `array_sort(array_distinct(e))` /
  * `sort_array(array_distinct(e))` shape with a null-free element type —
  * exactly the shape the engine's own dedup features use. Everything
  * else is left untouched. Numerically exact: both forms compute
  * |∩| / (n + m − |∩|) as a double ratio of the same two ints and both
  * are null-safe. Two edge guards keep the rewrite strictly
  * semantics-preserving: (a) it fires only when the Divide's result
  * type is DoubleType — a decimal-typed divide (operands cast to
  * decimal) must keep its decimal schema; (b) on two EMPTY inputs the
  * composed 0/0 yields NULL (non-ANSI) or a DIVIDE_BY_ZERO error
  * (ANSI — Spark 4's default) while bare JaccardSets yields NaN, so
  * the emitted expression wraps the fused call in
  * `If(size(raw_a)+size(raw_b) = 0, raw_a/raw_b, jaccard)` over the
  * RAW array children (O(1) length reads — no distinct/sort
  * materialization). That inner divide inherits the original Divide's
  * evalMode, so the degenerate pair reproduces the unfused behavior
  * bit-for-bit in WHICHEVER mode the session runs: NULL in legacy
  * mode, the same DIVIDE_BY_ZERO error under ANSI — the optimizer
  * rule never changes observable semantics. NULL inputs flow through
  * the else-branch unchanged.
  */
object FuseJaccard extends Rule[LogicalPlan] {

  private def strip(e: Expression): Expression = e match {
    case c: Cast => strip(c.child)
    case o       => o
  }

  /** The analyzer resolves array_sort's default comparator into a
    * concrete `if (l < r) -1 else if (l > r) 1 else 0` lambda with fresh
    * variables per call site, so it is recognized structurally (a
    * semanticEquals against the unresolved default can never match). */
  private def isDefaultCmp(f: Expression): Boolean = f match {
    case LambdaFunction(
          If(LessThan(l1, r1), Literal(m, _),
             If(GreaterThan(l2, r2), Literal(p, _), Literal(z, _))),
          Seq(a, b), false)
        if m == -1 && p == 1 && z == 0 &&
          l1.semanticEquals(a) && r1.semanticEquals(b) &&
          l2.semanticEquals(a) && r2.semanticEquals(b) => true
    case _ => false
  }

  /** Provably binary-sorted, duplicate-free, null-free DEFAULT-collation
    * string array; yields the lambda-free ArrayDistinct child, which IS
    * semanticEquals-comparable across call sites (per-site lambda
    * variable ids make the full array_sort trees incomparable).
    * sort_array ASC and array_sort's default comparator agree on
    * null-free binary-collation strings — both are the UTF8 byte order. */
  private object SortedDistinct {
    def unapply(e: Expression): Option[Expression] = {
      val inner = e match {
        case ArraySort(ad: ArrayDistinct, f, _) if isDefaultCmp(f) => Some(ad)
        case SortArray(ad: ArrayDistinct, Literal(true, _))        => Some(ad)
        case _                                                     => None
      }
      inner.filter(_ => e.dataType match {
        case ArrayType(StringType, containsNull) => !containsNull
        case _                                   => false
      })
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // DoubleType guard: a Divide whose operands were cast to DECIMAL
      // has DecimalType — replacing it with the double-typed JaccardSets
      // would change the analyzed schema. Only the double form fuses.
      case d @ Divide(l, r, _) if d.dataType == DoubleType =>
        (strip(l), strip(r)) match {
          case (Size(ArrayIntersect(a1 @ SortedDistinct(x1),
                                    b1 @ SortedDistinct(y1)), _),
                Size(ArrayUnion(SortedDistinct(x2),
                                SortedDistinct(y2)), _))
              if x1.semanticEquals(x2) && y1.semanticEquals(y2) =>
            // x1/y1 are the ArrayDistinct nodes; size their RAW children
            // (plain length reads; distinct(e) is empty iff e is empty).
            // Both empty ⇒ evaluate a 0.0/0.0 divide that inherits the
            // original Divide's evalMode, so the degenerate pair behaves
            // EXACTLY like the unfused form in the session's mode: NULL
            // in legacy, DIVIDE_BY_ZERO under ANSI. The raw-size operands
            // keep this inner Divide out of the rule's own match shape
            // (no re-fusion under the optimizer's fixpoint). A NULL input
            // makes the condition NULL → else-branch → JaccardSets
            // propagates the NULL exactly as the composed form does.
            val rawA = Size(x1.children.head, legacySizeOfNull = false)
            val rawB = Size(y1.children.head, legacySizeOfNull = false)
            If(EqualTo(Add(rawA, rawB), Literal(0)),
               d.copy(left = Cast(rawA, DoubleType),
                      right = Cast(rawB, DoubleType)),
               JaccardSets(a1, b1))
          case _ => d
        }
    }
}
