package graft

/** Merge per-key bench records ACROSS separated full runs (VERDICT r14
  * #1): ambient interference is one-sided (a loaded window only ADDS
  * time), and the r14 closing record proved a single run's
  * min-of-n-back-to-back repeats is NOT burst-robust — one multi-hour
  * window covered all three repeats and inflated two alphabetical
  * stretches 2-4x while the driver's independent same-code run had them
  * at r13 levels. The committed per-key floor must therefore be
  * min-of-SEPARATED-runs: run the full suite at different hours, merge
  * here, commit the merged record. PLANS.md states this as the r15
  * comparison rule.
  *
  * Usage: BenchMerge <out.json> <run1.json> <run2.json> [...]
  * Inputs are Bench full records (mode "suite"); the output carries
  * per-key min across runs for BOTH maps (queries = min of medians,
  * queries_min = min of mins), totals recomputed from the merged maps,
  * and the source list for provenance. Key sets must match exactly —
  * records from different query surfaces must not merge silently.
  */
object BenchMerge {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: BenchMerge <out.json> <run1.json> <run2.json> [...]")
    val out = args.head
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val runs = args.tail.toSeq.map { p =>
      val root = mapper.readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(p)))
      val mode = Option(root.get("mode")).map(_.asText).getOrElse("?")
      require(mode == "suite",
        s"$p: mode '$mode' — only full-suite records merge into a baseline")
      def qmap(field: String): Map[String, Double] = {
        val node = root.get(field)
        require(node != null, s"$p: no '$field' map")
        import scala.jdk.CollectionConverters._
        node.properties().asScala
          .map(e => e.getKey -> e.getValue.asDouble()).toMap
      }
      (p, qmap("queries"), qmap("queries_min"))
    }
    // Union of keys: a key registered mid-round exists only in later
    // runs — its floor is then a min over FEWER separated runs, which the
    // output must say rather than hide (partial_keys below), because a
    // single-run floor has no cross-run burst robustness yet.
    val keys = runs.flatMap(_._2.keySet).distinct.sorted
    val partial = keys.filter(k => runs.exists(r => !r._2.contains(k)))
    def mergedOf(pick: ((String, Map[String, Double], Map[String, Double])) =>
        Map[String, Double]): Seq[(String, Double)] =
      keys.map(k => k -> runs.flatMap(r => pick(r).get(k)).min)
    val med = mergedOf(_._2)
    val min = mergedOf(_._3)
    def jmap(xs: Seq[(String, Double)]): String =
      xs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
    val srcs = runs.map(r => "\"" + r._1 + "\"").mkString("[", ",", "]")
    val partialJson = partial.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      f"""{"metric":"total","value":${med.map(_._2).sum}%.3f,"value_min":${min.map(_._2).sum}%.3f,"unit":"sec","n":${runs.size},"stat":"min-across-runs","mode":"merged","n_queries":${keys.size},"sources":$srcs,"partial_keys":$partialJson,"queries":${jmap(med)},"queries_min":${jmap(min)}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"[bench-merge] ${runs.size} runs -> $out " +
      f"(total median-floor ${med.map(_._2).sum}%.1f s, " +
      f"min-floor ${min.map(_._2).sum}%.1f s)")
  }
}
