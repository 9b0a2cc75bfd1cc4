package graft

import org.apache.spark.sql.functions._

import graft.operators.RadixSelect

/** Planted-input proof of the radix k-th order statistic: agreement with
  * a driver-side sort at every rank, under duplicates, zeros, and values
  * spanning multiple radix levels.
  */
class RadixSelectSpec extends SparkSpec {

  test("kth matches the sorted answer at every rank, with dups and zeros") {
    val vals: Seq[Long] = Seq(0L, 0L, 5L, 5L, 5L, 7L, 1L << 13, 1L << 25,
      (1L << 25) + 1, 1L << 40, 987654321098L, 3L, 3L)
    import spark.implicits._
    val df = vals.toDF("v").repartition(4).transform(CacheScope.persisted(_))
    val sorted = vals.sorted
    (1 to vals.size).foreach { k =>
      assert(RadixSelect.kth(df, "v", k.toLong) == sorted(k - 1), s"rank $k")
    }
    CacheScope.releaseAll()
  }

  test("ranks resolves every rank at once == per-rank sorted answers") {
    val vals: Seq[Long] = Seq(0L, 0L, 5L, 5L, 5L, 7L, 1L << 13, 1L << 25,
      (1L << 25) + 1, 1L << 40, 987654321098L, 3L, 3L)
    import spark.implicits._
    val df = vals.toDF("v").repartition(4).transform(CacheScope.persisted(_))
    val sorted = vals.sorted
    val all = RadixSelect.ranks(df, "v", (1 to vals.size).map(_.toLong))
    (1 to vals.size).foreach { k =>
      assert(all(k.toLong) == sorted(k - 1), s"rank $k")
    }
    // duplicate ranks are fine (they share a cursor)
    val dup = RadixSelect.ranks(df, "v", Seq(3L, 3L, 7L))
    assert(dup(3L) == sorted(2) && dup(7L) == sorted(6))
    CacheScope.releaseAll()
  }

  test("ranks on a small-range column (level skip) stays exact") {
    import spark.implicits._
    val vals: Seq[Long] = Seq(0L, 1L, 1L, 2L, 4095L, 4096L, 9999L)
    val df = vals.toDF("v").repartition(3).transform(CacheScope.persisted(_))
    val sorted = vals.sorted
    val got = RadixSelect.ranks(df, "v", (1 to vals.size).map(_.toLong))
    (1 to vals.size).foreach(k => assert(got(k.toLong) == sorted(k - 1)))
    CacheScope.releaseAll()
  }

  test("kthByGroup == per-group kth at assorted ranks, planted groups") {
    import spark.implicits._
    val rows: Seq[(String, Long)] =
      Seq("a" -> 0L, "a" -> 5L, "a" -> 5L, "a" -> (1L << 30), "a" -> 17L,
        "b" -> 3L, "b" -> 999999999999L, "b" -> 3L, "b" -> 4L,
        "c" -> 42L)
    val df = rows.toDF("g", "v").repartition(4).transform(CacheScope.persisted(_))
    val ks = Map("a" -> 3L, "b" -> 2L, "c" -> 1L)
    val grouped = RadixSelect.kthByGroup(df, "g", "v", ks)
    ks.foreach { case (g, k) =>
      val single = RadixSelect.kth(df.filter(col("g") === g), "v", k)
      assert(grouped(g) == single, s"group $g rank $k")
    }
    CacheScope.releaseAll()
  }

  test("kthByGroup medians agree with per-group sort on real data") {
    val v = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("g"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("v"))
      .transform(CacheScope.persisted(_))
    val ns = v.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getAs[Long]("count")).toMap
    val meds = RadixSelect.kthByGroup(v, "g", "v",
      ns.map { case (g, n) => g -> (n + 1) / 2 })
    ns.foreach { case (g, n) =>
      val viaSort = v.filter(col("g") === g).orderBy("v")
        .collect()(((n + 1) / 2).toInt - 1).getLong(1)
      assert(meds(g) == viaSort, s"group $g")
    }
    CacheScope.releaseAll()
  }

  test("median via kth agrees with Spark's own sort on real data") {
    val v = Tables.load(spark, sfDir, "lineitem")
      .select(expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
        .as("v"))
      .transform(CacheScope.persisted(_))
    val n = v.count()
    val k = (n + 1) / 2
    val viaRadix = RadixSelect.kth(v, "v", k)
    val viaSort = v.orderBy("v").collect()(k.toInt - 1).getLong(0)
    CacheScope.releaseAll()
    assert(viaRadix == viaSort)
  }
}
