package graft.plans

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder}
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Whole-operator extension point (SURVEY §7.3 option c): per-key top-k as
  * a first-class physical operator.
  *
  * The built-in spelling — `row_number() over (partition by key order by
  * o) <= k` — plans as Exchange + FULL SORT of every partition + window +
  * filter: at 100 TB the sort is O(n log n) per partition and must
  * materialize/spill ALL rows per key before ranking. This operator keeps
  * a bounded k-row heap per key (O(n log k) comparisons, O(#keys·k)
  * memory, nothing spilled), consuming the exchange output directly with
  * NO sort — the same declared distribution (`ClusteredDistribution` on
  * the keys) lets the planner reuse any existing hash partitioning.
  *
  * Semantics: exactly the rows `row_number() <= k` would keep, PROVIDED
  * the ordering is total (callers append a unique tiebreak column, as all
  * engine queries already do for determinism). Equality with the window
  * form is proved in `TopKSpec`; the no-Sort plan shape in `PlanAuditSpec`.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Physical operator: hash-map of bounded max-heaps (heap head = the
  * worst kept row; a new row replaces it iff it sorts strictly earlier).
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keysLocal = keys
    val orderLocal = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      val ord: Ordering[InternalRow] = GenerateOrdering.generate(orderLocal, childOutput)
      val heaps = new java.util.HashMap[InternalRow, mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.values().iterator().asScala.flatMap(_.dequeueAll.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to its physical operator;
  * injected via `GraftExtensions.injectPlannerStrategy`.
  */
class GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** DataFrame-facing API for the operator. */
object TopK {

  /** Keep the first `k` rows of each key group under `order`
    * ((column, descending?) pairs — append a unique tiebreak for total
    * order). Requires a session built with `GraftExtensions` (the engine's
    * `Sessions` factories and the driver mains all are).
    */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val plan = Bridge.logicalPlan(df)
    def attr(n: String): Attribute = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"no column '$n' in ${plan.output.map(_.name).mkString(", ")}"))
    val sortOrder = order.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    Bridge.ofRows(df.sparkSession,
      TopKPerKey(keys.map(attr), sortOrder, k, plan))
  }
}
