// Hosted under org.apache.spark.sql to reach the private[sql] plan/Dataset
// bridges, like the expression in VectorExpressions.scala.
package org.apache.spark.sql.graftexpr

import java.util.{PriorityQueue => JPriorityQueue}

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Logical "top k rows per key, by ordering" — an operator Spark's
  * algebra lacks as a first-class node: users write
  * `row_number().over(Window...) <= k`, which sorts EVERY key's whole
  * group. This node lets the planner pick a bounded-heap physical
  * operator instead: O(n log k) per partition, no per-group sort, no
  * rank column materialized.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Physical bounded-heap top-k per key. Planned in two phases like a
  * partial aggregation: a `partial` instance runs on the child's existing
  * partitioning and cuts every partition to at most k rows per key, so
  * the exchange the `final` instance requires moves only
  * O(#keys * k * #partitions) rows — never the full scored relation.
  * Inside each partition it keeps one size-k heap per key. */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    child.execute().mapPartitionsInternal { it =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val ord = new LazilyGeneratedOrdering(order, childOutput)
      // JPriorityQueue head = the WORST kept row (reverse order), so a
      // better incoming row evicts it in O(log k).
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, JPriorityQueue[UnsafeRow]]
      val reverse = ord.reverse.asInstanceOf[java.util.Comparator[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          new JPriorityQueue[UnsafeRow](k + 1, reverse.asInstanceOf[java.util.Comparator[UnsafeRow]]))
        if (heap.size < k) {
          heap.add(row.asInstanceOf[UnsafeRow].copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.asInstanceOf[UnsafeRow].copy())
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        val arr = heap.toArray(new Array[UnsafeRow](heap.size))
        java.util.Arrays.sort(arr, ord.asInstanceOf[java.util.Comparator[UnsafeRow]])
        arr.iterator
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to the heap operator;
  * injected by [[graft.GraftExtensions]]. */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Top `k` rows per `keys` group, best-first by `order` —
    * (columnName, ascending) pairs resolved against `df`'s output. */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k") // k=0 would NPE in the heap eviction
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output.find(_.name == n)
      .getOrElse(sys.error(s"column $n not in ${analyzed.output.map(_.name)}"))
    val plan = TopKPerKey(
      keys.map(attr),
      order.map { case (n, asc) =>
        SortOrder(attr(n),
          if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
          else org.apache.spark.sql.catalyst.expressions.Descending)
      },
      k,
      analyzed)
    org.apache.spark.sql.classic.Dataset.ofRows(
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
  }
}
