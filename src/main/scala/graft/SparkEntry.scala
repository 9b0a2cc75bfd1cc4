package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.tfidf.{TfIdf, TfIdfQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized in QueryPacks (one per operator family from
  * SURVEY.md §2 and the training-pipeline extensions); this object is the
  * union the driver consumes.
  */
object SparkEntry {

  /** The pack registry — the single source of truth for the query surface.
    * Specs derive their expectations from this list (SparkEntrySpec); adding
    * a pack here is the ONLY step needed to register its queries + oracles.
    */
  def packs: Seq[QueryPack] = Seq(
    TfIdfQueries,
    pos.PosQueries,
    relational.RelationalQueries,
    relational.WindowQueries,
    relational.ScalarFuncQueries,
    relational.TpchQueries,
    relational.SqlFeatureQueries,
    relational.ProfilingQueries,
    relational.EventOpsQueries,
    relational.MarkovQueries,
    relational.TimeSeriesQueries,
    relational.SpectralQueries,
    relational.DtwQueries,
    relational.StatsQueries,
    relational.InferenceQueries,
    relational.InferenceEffectQueries,
    relational.InferenceSequentialQueries,
    relational.RecsysQueries,
    relational.MiningQueries,
    relational.ModelPrepQueries,
    relational.EntityResolutionQueries,
    relational.PrivacyQueries,
    relational.DecisionQueries,
    relational.FeatureQueries,
    relational.RollingQueries,
    relational.RobustStatsQueries,
    relational.TsDiagnosticsQueries,
    relational.HeavyTailQueries,
    relational.GeoQueries,
    relational.CausalQueries,
    relational.RegDiagQueries,
    relational.GrowthQueries,
    dedup.DedupQueries,
    dedup.DedupReportQueries,
    sim.SimilarityQueries,
    sim.KnnGraphQueries,
    sim.SelectionQueries,
    sim.RankEvalQueries,
    sketch.SketchQueries,
    layout.LayoutQueries,
    sources.FormatQueries,
    graph.GraphQueries,
    graph.GraphProfileQueries,
    graph.GraphPathQueries,
    graph.SccQueries,
    graph.CommunityQueries,
    text.TextAnalysisQueries,
    text.TokenStatsQueries,
    dedup.SemanticDedupQueries,
    dedup.PairEvalQueries,
    text.BpeQueries,
    text.CorpusOpsQueries,
    text.DriftQueries,
    text.EvalQueries,
    text.TextModelQueries,
    text.LexicalQueries,
    text.TopicModelQueries,
    text.PipelineFilterQueries,
    mm.MultimodalQueries,
    mm.MediaCodecQueries,
    streaming.StreamingQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full reference TF-IDF (DF → top-100 → TF → score) over documents.
    */
  def entry(spark: SparkSession): DataFrame =
    TfIdf.pipeline(
      Tables.load(spark, "/root/testdata/sf0.001", "documents"),
      TfIdf.Default)

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (non-SQL-expressible ops, e.g.
    * Porter stemming) get the driver's weaker rows-only check.
    */
  lazy val oracleSql: Map[String, String] = packs.flatMap(_.oracles).toMap
}
