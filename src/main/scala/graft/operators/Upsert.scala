package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-versioned upsert: apply a change relation to a standing snapshot,
  * highest version winning per key — MERGE INTO semantics without a
  * transactional table format. ONE shuffle: union both sides and take
  * max(struct(ver, ...)) per key (argmax without a window; a full outer
  * join would shuffle both sides anyway and then need a COALESCE per
  * column). Version-order, not arrival-order, decides the winner, so the
  * operator is deterministic under any partitioning and any micro-batch
  * chunking — which is exactly what lets the SAME function serve as a
  * Structured Streaming foreachBatch sink body (StreamingSpec drives it
  * batch-by-batch and asserts convergence to the one-shot batch merge).
  *
  * Shared by the registered q_cdc_merge query and the streaming upsert
  * sink spec.
  */
object Upsert {

  /** Merge `batch` into `state` (same schema), `key` winning by highest
    * `ver`; ties (same key, same ver — e.g. a replayed micro-batch)
    * resolve deterministically by the remaining columns' struct order,
    * making re-delivery idempotent when payloads are identical.
    */
  def upsert(state: DataFrame, batch: DataFrame, key: String,
      ver: String): DataFrame = {
    val vals = state.columns.filter(_ != key).toSeq
    val ordered = ver +: vals.filter(_ != ver)
    state.unionByName(batch)
      .groupBy(col(key))
      .agg(max(struct(ordered.map(col): _*)).as("m"))
      .select(col(key) +: vals.map(c => col(s"m.$c").as(c)): _*)
  }
}
