package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** SURVEY.md §2.C depth item — a REAL custom operator through the full
  * Catalyst stack (logical node → Strategy → physical exec), the (c)
  * rung of the custom-operator ladder, next to the (a)-rung composed
  * `join_asof` (window trick) that answers the same question.
  *
  * Semantics: for each left row, the greatest right `ts` of the same
  * `user` with `right.ts <= left.ts` (LAST-BEFORE as-of), appended as a
  * nullable long column.
  *
  * Scale design: requiredChildDistribution clusters BOTH sides on the
  * user key and requiredChildOrdering sorts each partition by
  * (user, ts), so EnsureRequirements plans exactly one co-partitioned
  * shuffle per side and the merge itself is a single forward pass per
  * partition — O(n) after sort, no per-row state beyond one buffered
  * right row. This is the same exchange profile as a sort-merge join,
  * with none of the window operator's full-partition buffering.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftUser: Expression, rightUser: Expression,
                    leftTs: Expression, rightTs: Expression,
                    outAttr: AttributeReference) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ outAttr
  // outAttr is CREATED here, not consumed from a child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoin = copy(left = l, right = r)
}

object AsOfStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(planLater(j.left), planLater(j.right),
                   j.leftUser, j.rightUser, j.leftTs, j.rightTs,
                   j.outAttr) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftUser: Expression, rightUser: Expression,
                        leftTs: Expression, rightTs: Expression,
                        outAttr: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftUser)),
        ClusteredDistribution(Seq(rightUser)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftUser, Ascending), SortOrder(leftTs, Ascending)),
        Seq(SortOrder(rightUser, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftUser, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val (lu, lt) = (BindReferences.bindReference(leftUser, left.output),
                    BindReferences.bindReference(leftTs, left.output))
    val (ru, rt) = (BindReferences.bindReference(rightUser, right.output),
                    BindReferences.bindReference(rightTs, right.output))
    val leftOut = left.output
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(out, leftOut :+ outAttr)
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // Forward merge state: latest consumed right (user, ts). Both
      // iterators arrive sorted by (user, ts), so a right row once
      // passed is never needed for a later left row with smaller ts.
      var haveMatch = false
      var matchUser = 0L
      var matchTs = 0L
      lIter.map { l =>
        // SQL null semantics: a NULL key/ts never matches — unboxing a
        // null through asInstanceOf[Long] would silently read key 0 /
        // epoch 0. Null left rows emit null; null right rows are skipped
        // (they sort first under ascending-nulls-first, so skipping
        // in-stream is safe).
        val uAny = lu.eval(l)
        val tAny = lt.eval(l)
        if (uAny == null || tAny == null) {
          extra.setNullAt(0)
          proj(joined(l, extra))
        } else {
          val u = uAny.asInstanceOf[Long]
          val t = tAny.asInstanceOf[Long]
          var advance = true
          while (advance && rBuf.hasNext) {
            val r = rBuf.head
            val rUserAny = ru.eval(r)
            val rTsAny = rt.eval(r)
            if (rUserAny == null || rTsAny == null) { rBuf.next() }
            else {
              val rUser = rUserAny.asInstanceOf[Long]
              if (rUser < u ||
                  (rUser == u && rTsAny.asInstanceOf[Long] <= t)) {
                haveMatch = true; matchUser = rUser
                matchTs = rTsAny.asInstanceOf[Long]
                rBuf.next()
              } else advance = false
            }
          }
          if (haveMatch && matchUser == u && matchTs <= t)
            extra.setLong(0, matchTs)
          else extra.setNullAt(0)
          proj(joined(l, extra))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)
}

object AsOfJoinPlan {
  /** As-of join `left` to `right` on long user/ts columns, appending
    * `outName` = greatest right ts <= left ts for the same user.
    * Installs the planner strategy on the live session (idempotent). */
  def asOf(s: SparkSession, l: DataFrame, r: DataFrame,
           userCol: String, tsCol: String, outName: String): DataFrame = {
    if (!s.experimental.extraStrategies.contains(AsOfStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ AsOfStrategy
    build(s, l, r, userCol, tsCol, outName)
  }

  /** Node construction WITHOUT installing the strategy — the path for
    * sessions that carry AsOfStrategy via `spark.sql.extensions`
    * (GraftExtensions); planning fails loudly if neither registration
    * happened, which is what ExtensionsSpec leans on. */
  private[graft] def build(s: SparkSession, l: DataFrame, r: DataFrame,
                           userCol: String, tsCol: String,
                           outName: String): DataFrame = {
    val lp = l.queryExecution.analyzed
    // Fresh aliases give the right side new exprIds: a left/right pair
    // derived from the same base table would otherwise share ids, and
    // the analyzer's DeduplicateRelations cannot rewrite expressions of
    // a node it does not know.
    val rp = r.select(col(userCol).as(s"__r_$userCol"),
                      col(tsCol).as(s"__r_$tsCol")).queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n"))
    val node = AsOfJoin(lp, rp,
      attr(lp, userCol), attr(rp, s"__r_$userCol"),
      attr(lp, tsCol), attr(rp, s"__r_$tsCol"),
      AttributeReference(outName, LongType, nullable = true)())
    org.apache.spark.sql.GraftSqlShim.ofRows(s, node)
  }
}
