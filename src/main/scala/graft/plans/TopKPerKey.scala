package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.GraftSqlBridge

/** Per-key top-k as a WHOLE-OPERATOR Catalyst extension — custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered through
  * `SparkSessionExtensions` (the (c) rung of the custom-operator ladder;
  * the (b) rung is [[graft.functions.CosineSimilarity]] and the optimizer
  * rung is [[RangeJoinRewrite]]).
  *
  * The built-in expression of "first k rows per key" is a rank window:
  * `row_number().over(partitionBy(key).orderBy(...)) <= k` — which SORTS
  * every key's entire row set inside one task before discarding all but k
  * rows. At 100 TB a hot key is a full-partition sort, and the sort is
  * 100% wasted work beyond the k survivors. This operator replaces it
  * with bounded heaps:
  *
  *   - PARTIAL stage, on the child's existing layout: one pass per input
  *     partition keeping a size-k heap per key seen — each partition
  *     emits ≤ k rows per key (top-k of a union is contained in the union
  *     of per-partition top-ks), the aggregate-style map-side combine;
  *   - one hash shuffle on the keys (`ClusteredDistribution` — the
  *     planner's `EnsureRequirements` inserts the Exchange);
  *   - FINAL stage: same pass, now over ≤ k · #inputPartitions rows per
  *     key, emitting exactly the top k in requested order.
  *
  * Memory is O(#keys-in-partition · k) rows — never a full sort buffer —
  * and the shuffle moves ≤ k rows per (key, input partition) instead of
  * every row.
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyPlan]] as partial→(exchange)→final [[TopKPerKeyExec]]. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val ordExprs = order
    val kk = k
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val cmp = new LazilyGeneratedOrdering(ordExprs, childOutput)
      // max-heap under cmp: head is the WORST retained row, evicted first
      val revCmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = cmp.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (it.hasNext) {
        val row = toUnsafe(it.next())
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          q = new java.util.PriorityQueue[UnsafeRow](kk + 1, revCmp)
          heaps.put(key.copy(), q)
        }
        if (q.size < kk) q.add(row.copy())
        else if (cmp.compare(row, q.peek()) < 0) {
          q.poll()
          q.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { q =>
        val arr = q.toArray(new Array[UnsafeRow](q.size))
        java.util.Arrays.sort(arr, cmp) // within-key output in requested order
        arr.iterator
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {

  /** First k rows per key group, ordered by `orderCols` ((name, ascending)
    * pairs — give a total order for deterministic output). Column names
    * resolve against `df`'s analyzed output.
    */
  def apply(df: DataFrame, keyCols: Seq[String], orderCols: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    def resolve(n: String): Attribute = analyzed.output.find(_.name == n)
      .getOrElse(sys.error(s"topKPerKey: no column '$n' in ${analyzed.output.map(_.name)}"))
    val sortOrders = orderCols.map { case (n, asc) =>
      SortOrder(resolve(n), if (asc) Ascending else Descending)
    }
    GraftSqlBridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(keyCols.map(resolve), sortOrders, k, analyzed))
  }
}
