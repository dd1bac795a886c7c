package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: when one join key carries a large
  * fraction of the big side (a hot entity, a null-ish default), hash
  * partitioning sends that whole key to one task. Salting spreads it:
  * every big-side row gets a salt in [0, salts); the small side is
  * replicated once per salt value; the join runs on (key, salt) so the hot
  * key fans out across `salts` tasks. Identical results to the plain join
  * (each big-side row still meets every matching small-side row exactly
  * once), at the cost of `salts`× the small side — which is the side you
  * were going to broadcast anyway.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`) splits
  * oversized sort-merge partitions at runtime and is the first resort;
  * explicit salting remains the tool when AQE cannot help — broadcast-side
  * skew in the stream, skewed aggregation feeding the join, or a
  * deterministic plan requirement.
  */
object SkewJoin {

  def apply(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Row-id salt: spreads even exact-duplicate hot rows; affects only
    // placement, never the join result.
    val saltedBig = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
