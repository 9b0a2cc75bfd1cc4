package graft

import java.nio.file.Files

/** End-to-end runs of the reference-shaped CLI jobs on a fixture corpus,
  * including the two-job DF -> IDF chain through a materialized TSV
  * (README.md:12-18's workflow, S6).
  */
class CliJobsSpec extends SparkSpec {

  private def mkCorpus(): String = {
    val dir = Files.createTempDirectory("graft-cli")
    Files.writeString(dir.resolve("a1.txt"),
      "Spark engines process queries quickly.\nSpark scales horizontally!")
    Files.writeString(dir.resolve("a2.txt"),
      "Queries run on engines.\nDon't forget the 2nd optimizer pass.")
    Files.writeString(dir.resolve("a3.txt"), "spark spark spark")
    dir.toString
  }

  private def readTsv(out: String): Seq[Array[String]] = {
    val f = new java.io.File(out).listFiles().filter(_.getName.endsWith(".csv")).head
    scala.io.Source.fromFile(f).getLines().map(_.split("\t")).toSeq
  }

  test("DocumentFreqJob -> TERM\\tDF, then IdfJob consumes it via -tsv") {
    val in = mkCorpus()
    val dfOut = Files.createTempDirectory("graft-df").toString + "/df"
    graft.cli.DocumentFreqJob.run(spark, Array(in, dfOut))
    val df = readTsv(dfOut).map(r => r(0) -> r(1).toLong).toMap
    assert(df("spark") == 2L) // a1 (x2) + a3; "Spark" lowercased
    assert(df("queri") == 2L) // stemmed "queries"
    assert(df("engin") == 2L)
    assert(!df.contains("the"), s"stopword leaked: $df")
    // quirk parity: the stopword file has "don't" but P2 strips apostrophes
    // BEFORE the filter, so "dont" survives (SURVEY §2 P5)
    assert(df.contains("dont"))

    val idfOut = Files.createTempDirectory("graft-idf").toString + "/scores"
    graft.cli.IdfJob.run(spark, Array(in, idfOut, "-tsv", dfOut))
    val rows = readTsv(idfOut)
    assert(rows.forall(_.length == 3), "ID\\tTERM\\tSCORE shape")
    val sparkA3 = rows.find(r => r(0) == "a3.txt" && r(1) == "spark").get
    // tf=3, df=2 -> 3 * ln(10000/3)
    assert(math.abs(sparkA3(2).toDouble - 3 * math.log(10000.0 / 3)) < 1e-9)
  }

  test("-casesensitive keeps case distinctions through the pipeline") {
    val in = mkCorpus()
    val out = Files.createTempDirectory("graft-cs").toString + "/df"
    graft.cli.DocumentFreqJob.run(spark, Array(in, out, "-casesensitive"))
    val df = readTsv(out).map(r => r(0) -> r(1).toLong).toMap
    // a1 has capitalized "Spark" (twice); a3 is lowercase "spark": in
    // case-sensitive mode they are DIFFERENT terms with df 1 each
    assert(df.get("Spark") == Some(1L), df)
    assert(df.get("spark") == Some(1L), df)
  }

  test("flag parser rejects a trailing flag without its value") {
    intercept[IllegalArgumentException] {
      graft.cli.Jobs.parse(Array("in", "out", "-tsv"))
    }
  }

  test("PosJob -> TAG\\tCOUNT over the corpus") {
    val in = mkCorpus()
    val out = Files.createTempDirectory("graft-pos").toString + "/tags"
    graft.cli.PosJob.run(spark, Array(in, out))
    val tags = readTsv(out).map(r => r(0) -> r(1).toLong).toMap
    assert(tags.getOrElse("NOUN", 0L) > 0)
    assert(tags.getOrElse("PUNCT", 0L) >= 4) // periods, '!', "'", digits...
    assert(tags.getOrElse("NUM", 0L) >= 1)   // "2" from "2nd"
    assert(tags.values.sum ==
      sources.TextCorpus.lines(spark, in).collect()
        .flatMap(r => pos.PosTagger.tokenize(r.getString(1))).length)
  }
}
