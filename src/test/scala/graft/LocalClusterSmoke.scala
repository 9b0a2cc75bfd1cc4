package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Child-JVM main for [[LocalClusterSpec]]: runs the three iterative
  * operators (DedupClusters, KCore, mstOf) on planted inputs under a
  * `local-cluster[2,2,1024]` master — REAL separate executor JVMs — with a
  * reliable checkpointDir, so the non-local-master scale claims
  * (reliable-checkpoint pinning, shared-FS edge materialization) are
  * executed rather than merely require()d. Prints `LC-SMOKE OK` on
  * success; any assertion failure or launch problem exits nonzero.
  *
  * Lives in test sources: it is test scaffolding, not product surface.
  */
object LocalClusterSmoke {

  def main(args: Array[String]): Unit = {
    val ckpt = Files.createTempDirectory("graft-lc-ckpt").toString
    // Executors are fresh JVMs launched by the in-process Worker: they
    // need this JVM's classpath (graft classes) and the JDK17 add-opens
    // the driver got from build.sbt.
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master("local-cluster[2,2,1024]")
      .appName("graft-lc-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try {
      // 1. DedupClusters fixpoint: two components + singletons, labels
      // pinned through RELIABLE checkpoints under ckpt.
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
      val universe = (1L to 12L).toDF("doc_id")
      val got = dedup.DedupClusters
        .clusters(pairs, universe, checkpointDir = Some(ckpt))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      CacheScope.releaseAll()
      val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L) ++
        Seq(4L, 5L, 6L, 7L, 8L, 9L, 12L).map(i => i -> i)
      assert(got == expect, s"clusters: $got")

      // 2. KCore cascade (the GraphSpec pendant-path case) on the
      // reliable-checkpoint path.
      val clique = for (a <- 0L to 3L; b <- 0L to 3L if a != b) yield (a, b)
      val path = Seq((3L, 10L), (10L, 11L), (11L, 12L))
        .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val core = graph.KCore
        .kcore((clique ++ path).toDF("src", "dst"), k = 2,
          checkpointDir = Some(ckpt))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      CacheScope.releaseAll()
      assert(core == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L),
        s"kcore: $core")

      // 3. Borůvka MST with unique weights — exact forest expected.
      val ew = Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 10L), (3L, 4L, 3L))
        .toDF("src", "dst", "w")
      val mst = graph.GraphPathQueries.mstOf(ew, checkpointDir = Some(ckpt))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      CacheScope.releaseAll()
      assert(mst == Set((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L)),
        s"mst: $mst")

      // 4. Brandes betweenness layer pinning through the same reliable
      // checkpointDir (the r11 operator's non-local-master path): path
      // graph 41-42-43-44-45, single seed 41, hand-computed dependencies.
      val bund = Seq((41L, 42L), (42L, 43L), (43L, 44L), (44L, 45L))
      val bedges = (bund ++ bund.map(_.swap)).toDF("src", "dst")
      val btw = graph.GraphPathQueries
        .betweennessOf(bedges, checkpointDir = Some(ckpt))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      CacheScope.releaseAll()
      assert(btw == Map(42L -> 3.0, 43L -> 2.0, 44L -> 1.0, 45L -> 0.0),
        s"betweenness: $btw")

      // 5. RadixSelect (the r11 k-th-order-statistic operator): each
      // level is a filtered aggregation across the separate executor
      // JVMs with only the 2-scalar rank state returning to the driver —
      // exactly the protocol a cluster run exercises.
      val vals = Seq(0L, 5L, 5L, 7L, 1L << 20, 1L << 37, 999999999999L, 3L)
      val vdf = vals.toDF("v").repartition(4)
        .transform(CacheScope.persisted(_))
      val sortedV = vals.sorted
      (1 to vals.size).foreach { k =>
        val got = operators.RadixSelect.kth(vdf, "v", k.toLong)
        assert(got == sortedV(k - 1), s"radix rank $k: $got")
      }
      CacheScope.releaseAll()

      // 6. SCC peeling (this round's directed-connectivity operator):
      // forced multi-partition state so the condensed-graph loop and its
      // reliable checkpoints run across the separate executor JVMs — the
      // Tarjan fast path alone would sidestep the distributed machinery.
      val sccEdges = ((1L to 6L).map(i => i -> (i % 6 + 1)) ++
        Seq(3L -> 7L, 7L -> 8L, 8L -> 3L, 8L -> 20L, 30L -> 1L))
        .toDF("src", "dst")
      val scc = graph.Scc
        .sccOf(sccEdges, checkpointDir = Some(ckpt), stateParts = Some(3))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      CacheScope.releaseAll()
      val sccExpect = (1L to 8L).map(_ -> 8L).toMap ++
        Map(20L -> 20L, 30L -> 30L)
      assert(scc == sccExpect, s"scc: $scc")

      // 7. 4-truss peel (the community-pack fixpoint) across executor
      // JVMs: a K4 (every edge in exactly 2 triangles) survives, a lone
      // triangle (support 1) and a pendant edge (support 0) peel away.
      val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a != b) yield (a, b)
      val extra = Seq((5L, 6L), (6L, 7L), (5L, 7L), (4L, 8L))
        .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val truss = graph.CommunityQueries
        .trussOf((k4 ++ extra).toDF("src", "dst"), checkpointDir = Some(ckpt))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      CacheScope.releaseAll()
      val k4Edges = for (a <- 1L to 4L; b <- 1L to 4L if a < b)
        yield (a, b, 2L)
      assert(truss == k4Edges.toSet, s"truss: $truss")

      // 8. Stateful streaming CUSUM across separate executor JVMs: the
      // HDFS-backed state store files land under the shared
      // checkpointLocation and the flatMapGroupsWithState state (case
      // classes + tuple keys) round-trips executor serialization; the
      // result must equal the shared scan rule run driver-side.
      {
        import org.apache.spark.sql.streaming.Trigger
        val evTmp = Files.createTempDirectory("graft-lc-ev").toString
        def ts(h: Int) = new java.sql.Timestamp(1709251200000L + h * 3600000L)
        val raw = Seq(
          ("a", ts(0), 1L, 95.0, 1L, "{}"), ("a", ts(1), 2L, 96.0, 1L, "{}"),
          ("a", ts(2), 3L, 97.0, 1L, "{}"), ("b", ts(0), 4L, 10.0, 2L, "{}"),
          ("b", ts(1), 5L, 99.0, 2L, "{}"), ("b", ts(2), 6L, 98.0, 2L, "{}"))
          .toDF("event_type", "ts", "event_id", "value", "user_id", "props")
        raw.write.mode("overwrite").parquet(evTmp)
        val in = spark.readStream
          .schema(spark.read.parquet(evTmp).schema).parquet(evTmp)
        val q = streaming.Cusum.cusum(streaming.Ewma.fromRaw(in))
          .writeStream.format("memory").queryName("lc_cusum")
          .outputMode("append")
          .option("checkpointLocation", s"$ckpt/cusum")
          .trigger(Trigger.AvailableNow()).start()
        assert(q.awaitTermination(300000), "lc cusum stream timed out")
        val streamed = spark.table("lc_cusum").collect()
          .map(r => r.getString(0) ->
            ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
        val day = new java.sql.Date(1709251200000L)
        def expect(key: String) = {
          val evs = raw.collect().toSeq
            .filter(_.getString(0) == key)
            .map(r => streaming.Ewma.VEvent(key, day, r.getTimestamp(1),
              r.getLong(2), r.getDouble(3)))
          val st = streaming.Cusum.scan(None, evs)
          (st.n, st.s, st.alarms)
        }
        assert(streamed == Map("a" -> expect("a"), "b" -> expect("b")),
          s"lc cusum: $streamed")
        assert(streamed("a")._3 == 1L, s"key a must alarm: $streamed")
      }

      // 9. The causal matching walk (segment-partitioned ignore-nulls
      // first/last windows + exact tie-breaks) across executor JVMs on a
      // hand-built panel with a control-free segment.
      {
        val dir = Files.createTempDirectory("graft-lc-causal").toString
        Seq((2L, "n", 1, 100.0, "A"), (3L, "n", 1, 200.0, "A"),
          (4L, "n", 1, 300.0, "B"), (6L, "n", 1, 400.0, "B"))
          .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
            "c_mktsegment")
          .write.mode("overwrite").parquet(s"$dir/customer.parquet")
        Seq((1L, 2L, "O", 50.0, new java.sql.Timestamp(1709251200000L),
            "1-URGENT"),
          (2L, 3L, "O", 70.0, new java.sql.Timestamp(1709254800000L),
            "1-URGENT"))
          .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority")
          .write.mode("overwrite").parquet(s"$dir/orders.parquet")
        val att = relational.CausalQueries
          .queries("q_causal_matching_att")(spark, dir).collect()
        CacheScope.releaseAll()
        assert(att.length == 1 && att(0).getLong(0) == 1L &&
          math.abs(att(0).getDouble(1) - (-20.0)) < 1e-6,
          s"lc matching: ${att.mkString(", ")}")
      }

      // Reliable checkpoints actually landed on the shared path.
      val st = Files.walk(java.nio.file.Paths.get(ckpt))
      val hasRdd =
        try {
          val it = st.iterator()
          var found = false
          while (it.hasNext && !found)
            found = it.next().getFileName.toString.startsWith("rdd-")
          found
        } finally st.close()
      assert(hasRdd, s"no ReliableCheckpointRDD dirs under $ckpt")

      // scalastyle:off println
      println("LC-SMOKE OK")
      // scalastyle:on println
    } finally {
      CacheScope.releaseAllScopes()
      spark.stop()
    }
  }
}
