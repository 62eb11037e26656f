package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftexpr.DotProduct

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL users. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * `SELECT graft_dot(a, b)` then plans as the codegen'd
  * [[org.apache.spark.sql.graftexpr.DotProduct]] loop.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_dot requires exactly 2 arguments, got ${children.length}")
        DotProduct(children(0), children(1))
      }))
    // Plans graft's TopKPerKey logical node as the bounded-heap operator.
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graftexpr.TopKStrategy)
  }
}

/** doreisa `persist` / `prepare_iteration` analogs
  * (docs/analytics.md:67-138): computation kicked off in the background
  * while the caller keeps building the next iteration's plan. Spark
  * already builds plans lazily (the "preparation" half is free); the
  * async half is a FutureAction on the job. */
object Async {
  import org.apache.spark.FutureAction
  import org.apache.spark.sql.{DataFrame, Row}

  /** Start computing `df` in the background (doreisa `persist`). */
  def prepare(df: DataFrame): FutureAction[Seq[Row]] =
    df.rdd.collectAsync().asInstanceOf[FutureAction[Seq[Row]]]

  /** Background materialization into the cache: the analog of
    * `array.sum().persist()` — subsequent queries reuse the result. */
  def persistAsync(df: DataFrame): FutureAction[Long] = {
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.rdd.countAsync().asInstanceOf[FutureAction[Long]]
  }
}
