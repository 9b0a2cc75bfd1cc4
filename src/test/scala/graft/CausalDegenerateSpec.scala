package graft

import java.nio.file.Files

/** Degenerate-input behavior of the causal pack: single-arm corpora and
  * control-free segments must gate to empty results (both engines agree
  * by construction), never divide by zero or throw.
  */
class CausalDegenerateSpec extends SparkSpec {

  private def writeEvents(dir: String, userIds: Seq[Long]): Unit = {
    import spark.implicits._
    userIds.zipWithIndex.map { case (u, i) =>
      (i.toLong, new java.sql.Timestamp(1709251200000L + i * 3600000L),
        u, if (i % 2 == 0) "purchase" else "click", 10.0 + i, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("single-arm corpus gates did/iv/cuped to empty instead of erroring") {
    val dir = Files.createTempDirectory("graft-causal-degen").toString
    // every user_id even -> the control arm is EMPTY
    writeEvents(dir, Seq(2L, 4L, 6L, 8L, 10L, 12L, 14L, 16L))
    Seq("q_causal_did", "q_causal_iv", "q_causal_cuped").foreach { q =>
      val rows = SparkEntry.queries(q)(spark, dir).collect()
      CacheScope.releaseAll()
      assert(rows.isEmpty, s"$q must gate out a single-arm corpus")
    }
    // IPW's per-stratum overlap gate drops every stratum the same way
    val ipw = SparkEntry.queries("q_causal_ipw")(spark, dir).collect()
    CacheScope.releaseAll()
    assert(ipw.isEmpty, "q_causal_ipw must drop no-overlap strata")
  }

  test("control-free segment drops its treated customers from matching") {
    val dir = Files.createTempDirectory("graft-causal-degen2").toString
    import spark.implicits._
    // seg A has treated+control; seg B holds ONLY treated (even keys)
    Seq((2L, "n", 1, 100.0, "A"), (3L, "n", 1, 200.0, "A"),
      (4L, "n", 1, 300.0, "B"), (6L, "n", 1, 400.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 2L, "O", 50.0, new java.sql.Timestamp(1709251200000L), "1-URGENT"),
      (2L, 3L, "O", 70.0, new java.sql.Timestamp(1709254800000L), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = SparkEntry.queries("q_causal_matching_att")(spark, dir).collect()
    CacheScope.releaseAll()
    // only seg A's single treated customer (key 2) matches (to key 3);
    // seg B's two treated customers have no control and must vanish
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getLong(r.fieldIndex("n_matched")) == 1L)
    // att = y(2) - y(3) = 50 - 70 = -20
    assert(math.abs(r.getDouble(r.fieldIndex("att")) - (-20.0)) < 1e-6)
  }
}
