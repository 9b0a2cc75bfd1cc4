package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The `Dataset.observe` surface: named accumulator-style metrics that
  * ride an existing action instead of costing a second pass — how a
  * 100 TB pipeline audits itself (rows ingested, total value, null
  * rate) without re-scanning. The metric expressions follow the same
  * determinism rules as queries (decimal sums), so observed values are
  * exact, not approximate.
  */
class ObserveSpec extends SparkSpec {

  test("observed metrics equal a direct aggregation, at zero extra scans") {
    val src = Tables.load(spark, sfDir, "orders")
    val df = src
      .observe("ingest_audit",
        count(lit(1)).as("rows_in"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("total_in"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_keys"))
      .filter(col("o_totalprice") > 100000)
    df.collect()

    val m = df.queryExecution.observedMetrics("ingest_audit")
    val expectRows = src.count()
    val expectTotal = src
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))).head.getDecimal(0)
    // Metrics observe the PRE-filter relation (they sit below the filter
    // in the plan) — the audit sees everything that was read.
    assert(m.getAs[Long]("rows_in") == expectRows)
    assert(m.getAs[java.math.BigDecimal]("total_in").compareTo(expectTotal) == 0)
    assert(m.getAs[Long]("null_keys") == 0L)
  }
}
