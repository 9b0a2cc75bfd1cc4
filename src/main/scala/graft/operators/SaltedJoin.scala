package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join (the 100 TB hazard the testdata is too uniform
  * to exhibit): when a handful of hot keys dominate a shuffle join, the
  * tasks holding them straggle. Salting splits each hot key into
  * `saltFactor` sub-keys on the large side and replicates the small side's
  * matching rows across all sub-keys, so the hot key's rows spread over
  * saltFactor tasks.
  *
  * This composes with — not replaces — AQE's skew-join splitting
  * (spark.sql.adaptive.skewJoin.*): AQE fixes skewed PARTITIONS after the
  * map stage; salting fixes a single skewed KEY that would still land in
  * one reduce bucket. Use for the join patterns AQE can't rescue:
  * aggregations keyed on the hot column, or sort-merge joins where one key
  * exceeds a single task's memory.
  */
object SaltedJoin {

  /** Inner equi-join of `large` with `small` on `key`, salted.
    *
    * large gets salt = pmod(hash(entire row? no — a uniform random would
    * break determinism) — salt derives from a second column when provided,
    * else spark_partition_id, both uniform enough to spread a hot key.
    */
  def inner(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 16, saltBy: Option[Column] = None): DataFrame = {
    require(saltFactor > 0)
    val salt = saltBy.getOrElse(spark_partition_id())
    val saltedLarge = large.withColumn("__salt", pmod(salt.cast("int"), lit(saltFactor)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLarge
      .join(saltedSmall, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }
}
