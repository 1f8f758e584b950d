package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (100 TB posture).
  *
  * First line of defense is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default). For keys too hot
  * even for AQE (a fact table where one key is >> a partition), classic
  * salting: the skewed (large) side gets a random salt in [0, salts); the
  * small side is replicated once per salt value; the join key becomes
  * (key, salt) — spreading one hot key over `salts` reducers at the cost of
  * replicating the build side `salts`×.
  */
object Skew {

  /** Inner equi-join with the left (large/skewed) side salted and the right
    * (small) side replicated per salt. Row-level results are identical to a
    * plain inner join on `key`. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    // deterministic pseudo-salt: spreads rows without an RNG (keeps plans
    // reproducible; monotonically_increasing_id is partition-local unique)
    val salted = large.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
