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

  /** `saltCols` restricts which big-side columns feed the salt hash:
    * xxhash64 fails analysis on unhashable column types (MapType), and
    * hashing a narrower distinguishing subset (e.g. an id + timestamp)
    * decouples salt distribution from wide payloads. Empty (default) =
    * all columns.
    */
  def apply(big: DataFrame, small: DataFrame, key: String,
      salts: Int, saltCols: Seq[String] = Seq.empty): DataFrame = {
    require(salts > 0, "salts must be positive")
    // DETERMINISTIC salt (hash of big-side columns): a nondeterministic
    // salt (row id, rand) re-salts rows differently when a stage partially
    // retries after a fetch failure, so a row can land in zero or two
    // reduce partitions and the join silently loses/duplicates rows (the
    // SPARK-23207 hazard). The tradeoff: rows identical in the hashed
    // columns share a salt and don't spread — hot KEYS with varying
    // payloads (the actual skew case) spread fine.
    val hashed = if (saltCols.isEmpty) big.columns.toSeq else saltCols
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(hashed.map(col): _*), lit(salts.toLong)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
