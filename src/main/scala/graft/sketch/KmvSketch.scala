package graft.sketch

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values (KMV / bottom-k theta) distinct-count sketch state:
  * the `n` smallest distinct hash values seen so far, sorted ascending in
  * `arr[0, n)`; capacity is the sketch parameter k.
  */
case class KmvBuf(arr: Array[Long], n: Int)

/** Result of a KMV sketch: `n_kept` distinct hashes retained (== k once
  * the stream has >= k distinct values), the kth smallest hash, and the
  * classic (k-1)/U_(k) estimator mapped to the 2^60 hash space. When fewer
  * than k distinct values were seen the sketch IS the distinct set and the
  * estimate is exact.
  */
case class KmvResult(k: Int, n_kept: Long, kth_hash: Long, est_distinct: Double)

/** Distinct-count sketch as a typed [[Aggregator]] — the 100 TB answer to
  * `count(distinct x)`: an exact distinct is a full shuffle of every
  * distinct value, while this aggregates to a CONSTANT-size state per
  * partition (k longs) and merges in O(k) — the shuffle carries k values
  * per map task no matter how many billions of rows feed it.
  *
  * Determinism: the input is a 60-bit md5-derived hash
  * ([[graft.dedup.Shingles.hash60]]), and "k smallest distinct hashes" is a
  * set-algebraic property of the input set — independent of row order,
  * partitioning, and merge order. The DuckDB oracle recomputes the same k
  * smallest via ORDER BY hash LIMIT k and must agree bit-for-bit, estimator
  * included (exact int64 inputs, one double division).
  *
  * Per-row cost: O(log k) binary search for the common reject/duplicate
  * case; the O(k) memmove insert happens only ~k·ln(n) times per partition
  * (harmonic bound on bottom-k updates), which is noise at any scale.
  *
  * Reference anchor: the reference's only distinct-count is the exact
  * per-term document frequency (DocumentFreq.java:96-106); this is the
  * approximate counterpart a 100 TB corpus profile needs.
  */
class KmvAgg(k: Int) extends Aggregator[Long, KmvBuf, KmvResult] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  /** Hash-space size: hash60 yields 15 hex chars = [0, 2^60). */
  private val Space = (1L << 60).toDouble

  override def zero: KmvBuf = KmvBuf(new Array[Long](k), 0)

  override def reduce(b: KmvBuf, h: Long): KmvBuf = {
    if (b.n == k && h >= b.arr(b.n - 1)) return b // common case: too large
    val ip = java.util.Arrays.binarySearch(b.arr, 0, b.n, h)
    if (ip >= 0) return b // duplicate of a retained hash
    val at = -ip - 1
    val newN = math.min(b.n + 1, k)
    System.arraycopy(b.arr, at, b.arr, at + 1, newN - at - 1)
    b.arr(at) = h
    if (newN == b.n) b else KmvBuf(b.arr, newN)
  }

  override def merge(a: KmvBuf, c: KmvBuf): KmvBuf = {
    if (c.n == 0) return a
    if (a.n == 0) return c
    val out = new Array[Long](k)
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.n || j < c.n)) {
      val va = if (i < a.n) a.arr(i) else Long.MaxValue
      val vc = if (j < c.n) c.arr(j) else Long.MaxValue
      if (va == vc) { out(n) = va; i += 1; j += 1 }
      else if (va < vc) { out(n) = va; i += 1 }
      else { out(n) = vc; j += 1 }
      n += 1
    }
    KmvBuf(out, n)
  }

  override def finish(b: KmvBuf): KmvResult =
    if (b.n < k)
      KmvResult(k, b.n, if (b.n == 0) 0L else b.arr(b.n - 1), b.n.toDouble)
    else
      KmvResult(k, k, b.arr(k - 1), (k - 1).toDouble * Space / b.arr(k - 1))

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvResult] = Encoders.product[KmvResult]
}

/** The retained bottom-k hashes themselves, ascending. */
case class KmvKept(hs: Seq[Long])

/** Same bottom-k state machine as [[KmvAgg]], finishing to the retained
  * hash set instead of the cardinality estimate — the mergeable form that
  * cross-sketch set algebra consumes (q_sketch_overlap): the bottom-k of a
  * UNION is exactly computable from the two bottom-k's alone, and
  * membership of a union-bottom-k element in either input set is decidable
  * against that input's sketch (if h is among the k smallest of A∪B and
  * h ∈ A, it is among the k smallest of A).
  */
class KmvKeepAgg(k: Int) extends Aggregator[Long, KmvBuf, KmvKept] {
  private val inner = new KmvAgg(k)
  override def zero: KmvBuf = inner.zero
  override def reduce(b: KmvBuf, h: Long): KmvBuf = inner.reduce(b, h)
  override def merge(a: KmvBuf, c: KmvBuf): KmvBuf = inner.merge(a, c)
  override def finish(b: KmvBuf): KmvKept = KmvKept(b.arr.take(b.n).toSeq)
  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvKept] = Encoders.product[KmvKept]
}
