package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is hot-headed
  * (a few keys holding most rows — the 100 TB failure mode AQE's
  * skew-join split doesn't cover when the skewed side must hash
  * first, e.g. pre-AQE stages or storage-partitioned inputs).
  *
  * `saltedJoin` splits each hot key into `salts` sub-keys: the big
  * side salts deterministically (hash of a discriminator column — NOT
  * random, so retries/recomputations are stable), the small side
  * replicates across all salt values. Result rows are identical to the
  * plain equi-join (asserted in OperatorSpec); only the partitioning
  * changes: each hot key now spreads over `salts` reducers.
  */
object Skew {

  /** Note: uses an internal `_salt` working column — an existing
    * `_salt` column on either input would be clobbered (the library's
    * operators reserve `_`-prefixed and documented output names:
    * `_salt`, `rn`, `session_id`, `asof`). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, saltBy: Column): DataFrame = {
    val salted = big.withColumn("_salt", pmod(hash(saltBy), lit(salts)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
