package graft

import org.apache.spark.sql.functions._

import graft.tfidf.TfIdf

/** Structural invariants for the round-6 training-prep operators, run
  * against the REGISTERED queries on sf0.001. The DuckDB hash compare is
  * the exact cross-engine check; these pin the semantics a hash match
  * can't explain (chunk geometry, the BM25 formula wiring, the
  * decimal-summed log-prob path) via independent scalar recomputation.
  */
class TrainingPrepSpec extends SparkSpec {
  import spark.implicits._

  test("text_chunk: contiguous ids, all-but-last chunks full, last-chunk " +
    "size matches the stride formula") {
    val out = SparkEntry.queries("text_chunk")(spark, sfDir)
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"))
      .as[(Long, Int, Int)].collect()
    CacheScope.releaseAll()
    val toks = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), size(split(col("text"), "\\s+")).as("n"))
      .as[(Long, Int)].collect().toMap
    val byDoc = out.groupBy(_._1)
    assert(byDoc.keySet == toks.keySet, "every document must be chunked")
    assert(out.exists(_._2 > 0), "no multi-chunk doc — constants don't exercise the window")
    byDoc.foreach { case (doc, rows) =>
      val n = toks(doc)
      val expChunks = if (n <= 32) 1 else math.ceil((n - 32) / 16.0).toInt + 1
      assert(rows.map(_._2).sorted.toSeq == (0 until expChunks),
        s"doc $doc chunk ids not contiguous")
      rows.sortBy(_._2).dropRight(1).foreach { case (_, id, nt) =>
        assert(nt == 32, s"doc $doc chunk $id not full")
      }
      assert(rows.maxBy(_._2)._3 == n - (expChunks - 1) * 16,
        s"doc $doc last chunk size")
    }
  }

  test("tfidf_bm25_raw: same (doc,term) keys as tfidf_tf_raw; scores equal " +
    "an independent scalar recomputation") {
    val bm = SparkEntry.queries("tfidf_bm25_raw")(spark, sfDir)
      .as[(Long, String, Long, Long, Double)].collect()
    CacheScope.releaseAll()
    val tfKeys = SparkEntry.queries("tfidf_tf_raw")(spark, sfDir)
      .select(col("doc_id"), col("term")).as[(Long, String)].collect().toSet
    CacheScope.releaseAll()
    assert(bm.map(r => (r._1, r._2)).toSet == tfKeys,
      "BM25 must score exactly the top-100-term TF relation")
    val raw = TfIdf.Default.copy(stem = false)
    val dl = TfIdf.termFrequencyAll(
        TfIdf.terms(Tables.load(spark, sfDir, "documents"), raw))
      .groupBy("doc_id").agg(sum(col("tf")).as("dl"))
      .as[(Long, Long)].collect().toMap
    val avgdl = dl.values.sum.toDouble / dl.size
    val nDocs = dl.size.toDouble
    bm.foreach { case (doc, term, tf, df, got) =>
      val idf = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
      val norm = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl(doc) / avgdl))
      val exp = BigDecimal(idf * norm)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got - exp) < 1e-9, s"bm25($doc, $term): got $got exp $exp")
    }
  }

  test("text_unigram_logprob equals a scalar recomputation through the " +
    "exact-decimal sum path") {
    val got = SparkEntry.queries("text_unigram_logprob")(spark, sfDir)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    CacheScope.releaseAll()
    // Same tokenizer expression as the query (parity by construction),
    // scalar math from here on.
    val toks = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        explode(split(regexp_replace(lower(col("text")), "[^a-z ]", ""), " +"))
          .as("tok"))
      .filter(col("tok") =!= "")
      .as[(Long, String)].collect()
    val vocab = toks.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val total = vocab.values.sum.toDouble
    toks.groupBy(_._1).foreach { case (doc, xs) =>
      val sumLp = xs.map { case (_, t) =>
        BigDecimal(math.log(vocab(t) / total))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      val exp = (sumLp.toDouble / xs.length, xs.length.toLong)
      val (nTok, avg) = got(doc)
      assert(nTok == exp._2, s"doc $doc token count")
      val expRounded = BigDecimal(exp._1)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(avg - expRounded) < 1e-9,
        s"doc $doc avg_logprob: got $avg exp $expRounded")
    }
  }

  test("temperature sampling keeps the rarest language whole and makes " +
    "the exact md5-replayable decision per majority doc") {
    import graft.text.CorpusOpsQueries
    // 90 "big" docs vs 10 "small": n_min = 10, r_small = 1 (all kept),
    // r_big = round(9^(alpha-1), 9) — replay each keep decision in
    // scalar Scala and demand the identical set.
    val alpha = 0.3
    val docsDf = ((1L to 90L).map(i => (i, "big", "s")) ++
      (91L to 100L).map(i => (i, "small", "s")))
      .toDF("doc_id", "lang", "source")
    val kept =
      try CorpusOpsQueries.temperatureSampleOf(docsDf, alpha)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      finally CacheScope.releaseAll()
    assert((91L to 100L).forall(i => kept.contains((i, "small"))),
      "the rarest language must be kept in full")
    val rBig = BigDecimal(math.pow(9.0, alpha - 1.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(id: Long): Double = {
      val hex = md.digest(s"temp:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4503599627370496.0
    }
    val expBig = (1L to 90L).filter(i => u(i) < rBig).toSet
    assert(kept.collect { case (i, "big") => i } == expBig,
      s"big-language decisions diverge: got ${kept.count(_._2 == "big")}, " +
        s"expected ${expBig.size}")
    assert(expBig.nonEmpty && expBig.size < 90,
      "planted corpus must exercise both keep and drop paths")
  }
}
