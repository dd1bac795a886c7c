package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.io.Cdc

/** `SELECT * FROM table_changes('lake.events', 2, 5)` — Delta's CDC
  * table-valued function, planned by [[graft.io.Cdc]]: the builder runs
  * at analysis time, resolves the table string to a manifest root, and
  * splices the change-frame plan into the outer query, so filters and
  * projections over the change rows optimize like any other subquery
  * (a `WHERE _change_type = 'insert'` reaches the appended-directory
  * scans as an ordinary pushed predicate).
  *
  * Arguments (literals — the plan is built before execution):
  *   1. table — `catalog.ns….name` (resolved through the catalog's
  *      `spark.sql.catalog.<cat>.root` warehouse conf, the same
  *      mapping [[graft.io.dsv2.GraftCatalog]] uses) or a filesystem
  *      root containing `/`
  *   2. from version (inclusive)
  *   3. optional to version (inclusive; defaults to the table head)
  *   4. optional merge-key column (defaults to the table's recorded
  *      `set_mor_key`; only consulted when the range carries
  *      merge-on-read commits)
  *
  * Installed by [[GraftExtensions]]; [[register]] retrofits sessions
  * built without it (the [[LongArrayOps.register]] convention).
  */
object TableChanges {

  val name = "table_changes"

  val info = new ExpressionInfo(TableChanges.getClass.getName, name)

  def build(args: Seq[Expression]): LogicalPlan = {
    require(args.size >= 2 && args.size <= 4,
      s"$name(table, from[, to[, key]]) takes 2-4 arguments, " +
        s"got ${args.size}")
    def evald(i: Int): Any = {
      // resolved first: an unresolved attribute would throw from
      // `foldable` instead of explaining the contract
      require(args(i).resolved && args(i).foldable,
        s"$name argument ${i + 1} must be a literal")
      args(i).eval()
    }
    val s = SparkSession.active
    val table = String.valueOf(evald(0))
    val from = toInt(evald(1), 2)
    val to = if (args.size >= 3) Some(toInt(evald(2), 3)) else None
    val key = if (args.size >= 4) Some(String.valueOf(evald(3))) else None
    Cdc.changes(s, resolveRoot(s, table), from, to, key)
      .queryExecution.logical
  }

  private def toInt(v: Any, pos: Int): Int = v match {
    case n: java.lang.Number => n.intValue()
    case other => throw new IllegalArgumentException(
      s"$name argument $pos must be an integer version, got $other")
  }

  /** A string with `/` is a manifest root verbatim; `cat.ns….name`
    * resolves through the catalog's warehouse conf exactly like the
    * catalog's own identifier mapping.
    */
  private[graft] def resolveRoot(s: SparkSession, table: String)
      : String = {
    if (table.contains("/")) return table
    val parts = table.split('.')
    val conf = s.conf.getOption(s"spark.sql.catalog.${parts.head}.root")
    (conf, parts.length) match {
      case (Some(w), n) if n >= 2 => (w +: parts.tail.toSeq).mkString("/")
      case _ => throw new IllegalArgumentException(
        s"cannot resolve '$table': pass a filesystem root (with '/') " +
          s"or 'catalog.table' where spark.sql.catalog.<catalog>.root " +
          "is configured")
    }
  }

  /** Retrofit registration for sessions built without
    * `spark.sql.extensions` — idempotent.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(name), info, build _)
}
