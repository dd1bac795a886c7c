package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Global contiguous 0..n-1 id assignment in `orderCol` order — the
  * "number every document" primitive training pipelines need for shard
  * addressing and example indexing.
  *
  * The naive formulation, `row_number().over(Window.orderBy(orderCol))`,
  * plans an `Exchange SinglePartition`: the entire corpus funnels through
  * ONE task — the canonical 100 TB anti-pattern. Spark's own
  * `monotonically_increasing_id` is parallel but non-contiguous (gaps
  * between partitions), and its values depend on partition layout.
  *
  * This is the two-pass idiom instead: range-repartition + sort within
  * partitions (so partition k holds the k-th slice of the global order),
  * then `zipWithIndex` — which runs one lightweight count job over the
  * partitions to compute per-partition offsets and assigns ids in a single
  * map pass, no global shuffle to one node anywhere. Cost: one range
  * shuffle + one count job; every stage is fully parallel.
  *
  * `orderCol` values must be unique for the assignment to be
  * deterministic (ties would order arbitrarily within a partition).
  */
object ContiguousIds {

  def apply(df: DataFrame, orderCol: String, idCol: String): DataFrame = {
    require(!df.columns.contains(idCol),
      s"column $idCol already exists")
    val sorted = df.repartitionByRange(col(orderCol))
      .sortWithinPartitions(col(orderCol))
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
