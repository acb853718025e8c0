package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, PredicateHelper, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, FilterExec, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Native as-of join: the whole-operator custom-plan path (brief preference
  * order (c)) — custom `LogicalPlan` node + `Rule[LogicalPlan]` +
  * `SparkStrategy` + `SparkPlan`, registered via [[GraftExtensions]]
  * (`spark.sql.extensions`) or at runtime via [[GraftPlans.ensure]].
  *
  * Semantics match [[graft.operators.AsOfJoin]] (the (a)-path compose, built
  * for the reference's enrich-with-latest-state pattern,
  * `workingTest.scala:150-243`): for each left row, attach the right row of
  * the same key with the greatest time ≤ the left row's time (ties on time
  * broken by the greatest tiebreak), left-outer.
  *
  * Why a physical operator when the compose already exists: the union+window
  * plan materializes left+right into ONE sorted window partition per key and
  * null-pads every row to the union schema before the window walk. This node
  * shuffles each side on its own key, sorts each side separately, and streams
  * a two-pointer merge per partition holding ONE carried right row — no
  * union blow-up, no window buffer, and each side's sort is over its own
  * (narrower) schema. Same two shuffles, strictly less data through them —
  * the gap widens with right-side width and row count at 100 TB.
  */
object AsOfMark {
  val name = "graft_asof"
}

/** Boolean marker expression carried as a join condition through analysis
  * and optimization. Never evaluated: [[AsOfJoinRewrite]] (or
  * [[AsOfJoinStrategy]]'s direct-Join fallback) replaces the enclosing join
  * before execution. Riding on a plain `Join` node until then means every
  * built-in optimization that understands joins — column pruning, predicate
  * pushdown, join-side filter inference — applies for free; only the
  * physical algorithm is custom.
  *
  * Args: (leftKey, rightKey, leftTime, rightTime[, rightTiebreak]).
  */
case class AsOfMark(children: Seq[Expression]) extends Expression {
  def leftKey: Expression = children(0)
  def rightKey: Expression = children(1)
  def leftTime: Expression = children(2)
  def rightTime: Expression = children(3)
  def tiebreak: Option[Expression] = children.drop(4).headOption

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length != 4 && children.length != 5)
      TypeCheckResult.TypeCheckFailure(
        s"${AsOfMark.name} takes (leftKey, rightKey, leftTime, rightTime[, tiebreak]); got ${children.length} args")
    else if (!DataType.equalsStructurally(leftKey.dataType, rightKey.dataType, ignoreNullability = true))
      TypeCheckResult.TypeCheckFailure(
        s"key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
    else if (!DataType.equalsStructurally(leftTime.dataType, rightTime.dataType, ignoreNullability = true))
      TypeCheckResult.TypeCheckFailure(
        s"time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")
    else if (!RowOrdering.isOrderable(leftKey.dataType) || !RowOrdering.isOrderable(leftTime.dataType))
      TypeCheckResult.TypeCheckFailure("key and time types must be orderable")
    else TypeCheckResult.TypeCheckSuccess

  private def unplanned = new UnsupportedOperationException(
    s"${AsOfMark.name} is a plan marker: register graft.plans.GraftExtensions in " +
      "spark.sql.extensions or call GraftPlans.ensure(spark) so the as-of strategy plans it")
  override def eval(input: InternalRow): Any = throw unplanned
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = throw unplanned

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** Logical as-of join. Output = left ++ right(nullable) — the shape the
  * analyzer already gave the marker `Join`, so attribute ids line up.
  * `emitUnmatched=false` is the inner variant `EliminateOuterJoin` produces
  * when a null-rejecting predicate sits above the join. */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    tiebreak: Option[Expression],
    emitUnmatched: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Rewrites a marker `Join` to [[AsOfJoinPlan]]. Runs at the END of
  * optimization (`experimental.extraOptimizations` via [[GraftPlans.ensure]],
  * or the extension operator-optimization batch via [[GraftExtensions]]), so
  * pushdown and pruning have already run against the plain `Join`. Handles
  * the condition having accumulated extra conjuncts (inner-join pushdown
  * moves predicates into the condition): they come back out as a `Filter`
  * above the as-of node. */
object AsOfJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Join(l, r, jt, Some(cond), _) if cond.exists(_.isInstanceOf[AsOfMark]) =>
      val (marks, rest) = splitConjunctivePredicates(cond).partition(_.isInstanceOf[AsOfMark])
      require(marks.length == 1, s"exactly one ${AsOfMark.name} marker per join, got ${marks.length}")
      val emitUnmatched = jt match {
        case LeftOuter => true
        case Inner     => false
        case other => throw new IllegalArgumentException(
          s"${AsOfMark.name} join must be left_outer (or optimizer-converted inner), got $other")
      }
      // Extra ON conjuncts are only sound to hoist above the join when the
      // join is (optimizer-converted) INNER: there Filter-above ≡ ON. For a
      // still-outer join, ON semantics are "null-pad the left row when the
      // predicate fails", which a post-Filter would silently turn into
      // "drop the left row" — refuse rather than mis-execute a hand-written
      // `LEFT JOIN ... ON graft_asof(...) AND p` (the GraftPlans.asOf entry
      // path never produces this shape).
      if (emitUnmatched && rest.nonEmpty)
        throw new IllegalArgumentException(
          s"${AsOfMark.name} left_outer join does not support extra ON conjuncts " +
            s"(${rest.mkString(", ")}); apply them as a WHERE filter or use an inner join")
      val m = marks.head.asInstanceOf[AsOfMark]
      val asof = AsOfJoinPlan(l, r, m.leftKey, m.rightKey, m.leftTime, m.rightTime,
        m.tiebreak, emitUnmatched)
      rest.reduceOption(And).map(Filter(_, asof)).getOrElse(asof)
  }
}

/** Plans [[AsOfJoinPlan]] → [[AsOfJoinExec]]. Also matches a marker `Join`
  * directly, in case the rewrite rule was not reached (e.g. a session where
  * only the strategy was registered) — the logical rewrite is applied inline
  * so both paths produce the identical physical tree. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKey, p.rightKey, p.leftTime, p.rightTime, p.tiebreak,
        p.emitUnmatched, planLater(p.left), planLater(p.right)) :: Nil
    case j @ Join(_, _, _, Some(cond), _) if cond.exists(_.isInstanceOf[AsOfMark]) =>
      AsOfJoinRewrite(j) match {
        case Filter(f, p: AsOfJoinPlan) => FilterExec(f, planAsOf(p)) :: Nil
        case p: AsOfJoinPlan            => planAsOf(p) :: Nil
        case other                      => sys.error(s"unexpected as-of rewrite: $other")
      }
    case _ => Nil
  }
  private def planAsOf(p: AsOfJoinPlan): SparkPlan =
    AsOfJoinExec(p.leftKey, p.rightKey, p.leftTime, p.rightTime, p.tiebreak,
      p.emitUnmatched, planLater(p.left), planLater(p.right))
}

/** Sort-merge as-of join.
  *
  * Required shape (EnsureRequirements provides it): both sides hash-clustered
  * on their key with co-partitioned exchanges — the same contract
  * `SortMergeJoinExec` declares — and sorted by (key, time[, tiebreak])
  * ascending within partitions. Execution is then a single streaming
  * two-pointer merge per partition: right rows behind the current left key
  * are discarded, right rows of the same key with time ≤ the left time
  * overwrite the ONE carried candidate (sort order makes the last such row
  * the max-(time, tiebreak) match), and the first right row ahead stops the
  * walk. O(|L|+|R|) per partition, one buffered right row, no window state.
  *
  * Scale contract: two shuffles (one per side, each on its own narrow
  * schema), sorts feed off the shuffle's partial ordering machinery, output
  * streams — nothing is materialized per key, so key cardinality and
  * per-key row counts are unbounded.
  *
  * Null semantics (matches DuckDB `ASOF LEFT JOIN`): null keys and null
  * times never match; unmatched left rows are emitted null-padded when
  * `emitUnmatched` (left-outer), dropped otherwise.
  */
case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    tiebreak: Option[Expression],
    emitUnmatched: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      tiebreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    val (leftOut, rightOut, outAttrs) = (left.output, right.output, output)
    val (keyType, timeType) = (leftKey.dataType, leftTime.dataType)
    val emit = emitUnmatched
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lkProj = UnsafeProjection.create(Seq(lk), leftOut)
      val rkProj = UnsafeProjection.create(Seq(rk), rightOut)
      val ltProj = UnsafeProjection.create(Seq(lt), leftOut)
      val rtProj = UnsafeProjection.create(Seq(rt), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.size)

      new Iterator[InternalRow] {
        private var pendingLeft: InternalRow = _
        private var pendingMatch: InternalRow = _
        private var ready = false
        private var nextRight: InternalRow = _
        private var rightExhausted = false
        // The carried candidate: last right row of matchKey seen with
        // time ≤ the current left time. Copied — sorter buffers are reused.
        private var matchRow: InternalRow = _
        private var matchKey: UnsafeRow = _

        private def pullRight(): Unit =
          if (!rightExhausted) {
            if (rIter.hasNext) nextRight = rIter.next()
            else { nextRight = null; rightExhausted = true }
          }

        private def findNext(): Boolean = {
          while (lIter.hasNext) {
            val l = lIter.next()
            val lkRow = lkProj(l)
            var matched = false
            if (!lkRow.isNullAt(0)) {
              val ltRow = ltProj(l)
              var walking = true
              while (walking) {
                if (nextRight == null) pullRight()
                if (nextRight == null) walking = false
                else {
                  val rkRow = rkProj(nextRight)
                  if (rkRow.isNullAt(0)) nextRight = null // null key never matches
                  else {
                    val c = keyOrd.compare(rkRow, lkRow)
                    if (c < 0) nextRight = null // behind the left key: dead
                    else if (c > 0) walking = false // ahead: stop
                    else {
                      val rtRow = rtProj(nextRight)
                      if (rtRow.isNullAt(0)) nextRight = null // null time never matches
                      else if (timeOrd.compare(rtRow, ltRow) <= 0) {
                        matchRow = nextRight.copy()
                        matchKey = rkRow.copy()
                        nextRight = null
                      } else walking = false // future row: stop
                    }
                  }
                }
              }
              matched = matchRow != null && keyOrd.compare(matchKey, lkRow) == 0
            }
            if (matched) { pendingLeft = l; pendingMatch = matchRow; return true }
            else if (emit) { pendingLeft = l; pendingMatch = null; return true }
          }
          false
        }

        override def hasNext: Boolean = ready || { ready = findNext(); ready }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty as-of iterator")
          ready = false
          numOutputRows += 1
          resultProj(joined(pendingLeft,
            if (pendingMatch != null) pendingMatch else nullRight))
        }
      }
    }
  }
}

/** `spark.sql.extensions`-installable registration: the production cluster
  * path (`--conf spark.sql.extensions=graft.plans.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(AsOfMark.name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[AsOfMark].getName, AsOfMark.name),
      (args: Seq[Expression]) => AsOfMark(args)))
    e.injectOptimizerRule(_ => AsOfJoinRewrite)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

/** Runtime registration + DataFrame-level entry point. `ensure` mirrors
  * [[graft.functions.expr.HashExpressions.register]]: the driver builds its
  * own SparkSession without `spark.sql.extensions`, so query entry paths
  * install the rule/strategy through `spark.experimental` (read afresh on
  * every optimize/plan call, so late installation is safe). Idempotent. */
object GraftPlans {
  def ensure(spark: SparkSession): Unit = synchronized {
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(AsOfJoinRewrite))
      exp.extraOptimizations = exp.extraOptimizations :+ AsOfJoinRewrite
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      AsOfMark.name, args => AsOfMark(args), "built-in")
  }

  /** As-of join through the custom plan. Column names must be unambiguous
    * across the two sides (rename the right side's key/time if shared). */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, leftTime: String,
           rightKey: String, rightTime: String,
           tiebreak: Option[String] = None): DataFrame = {
    ensure(left.sparkSession)
    val args = Seq(leftKey, rightKey, leftTime, rightTime) ++ tiebreak
    left.join(right, expr(s"${AsOfMark.name}(${args.mkString(", ")})"), "left_outer")
  }
}
