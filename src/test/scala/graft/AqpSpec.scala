package graft

import graft.relational.RelationalQueries

/** The AQP probes' contract: the deterministic md5 bucket actually
  * samples ~1/64 of the rows, the scale-up estimates land near the exact
  * answers, and the reported rel_err is consistent with both.
  */
class AqpSpec extends SparkSpec {

  test("sampled estimate tracks the exact sum within a loose band") {
    val r = RelationalQueries.queries("q_aqp_sum")(spark, sfDir).collect()(0)
    val exactSum = r.getDouble(0)
    val exactN = r.getLong(1)
    val estSum = r.getDouble(2)
    val estN = r.getLong(3)
    val relErr = r.getDouble(4)
    // the md5 bucket is uniform: sampled count (estN/64) within 3x of
    // the expected 1/64 — deterministic, so this cannot flake
    assert(estN > 0 && estN < 3L * exactN && exactN < 3L * estN,
      s"sample fraction off: est_n=$estN exact_n=$exactN")
    assert(relErr >= 0.0 && relErr < 0.5, s"rel_err out of band: $relErr")
    assert(math.abs(estSum - exactSum) / exactSum < 0.5)
  }

  test("per-group estimates carry per-group errors") {
    val rows = RelationalQueries.queries("q_aqp_groupby")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exactN = r.getLong(1)
      val estN = r.getLong(2)
      val relErr = r.getDouble(3)
      assert(math.abs(relErr -
        math.abs(estN - exactN).toDouble / exactN) < 1e-6,
        "reported rel_err must equal the recomputed one")
    }
  }
}
