package graft

import graft.mm.MultimodalQueries

/** Invariants for the cross-modal retrieval eval: the planted counterpart
  * is findable (recall well above the ~k/N random-ranking floor) but the
  * perturbation genuinely costs rank (metric below 1), and the released
  * aggregate identities hold.
  */
class CrossModalSpec extends SparkSpec {

  test("crossmodal recall is non-degenerate and internally consistent") {
    val r = MultimodalQueries.queries("mm_crossmodal_recall")(spark, sfDir)
      .collect()(0)
    val n = r.getLong(r.fieldIndex("n_queries"))
    val rec = r.getDouble(r.fieldIndex("recall_at_5"))
    val mrr = r.getDouble(r.fieldIndex("mrr"))
    assert(n > 0)
    assert(rec > 0.2 && rec <= 1.0, s"recall@5 degenerate: $rec")
    assert(mrr > 0.0 && mrr <= 1.0)
    // every top-5 hit contributes at least 1/5 to MRR, misses >= 0
    assert(mrr >= rec / 5.0 - 1e-9, s"mrr=$mrr below recall/5=${rec / 5}")
    // recall is a multiple of 1/n by construction
    assert(math.abs(rec * n - math.round(rec * n)) < 1e-6)
  }
}
