package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryPack

/** Registered round-trip probes for the non-parquet batch formats — see
  * [[Formats]] for the write→read→audit design and why hash equality
  * against the parquet original proves losslessness.
  */
object FormatQueries extends QueryPack {

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_source_orc" -> ((s, d) => Formats.orcRoundtrip(s, d)),
    "q_source_csv" -> ((s, d) => Formats.csvRoundtrip(s, d)),
    "q_source_json" -> ((s, d) => Formats.jsonRoundtrip(s, d)),
    "q_source_xml" -> ((s, d) => Formats.xmlRoundtrip(s, d)))

  override val oracles: Map[String, String] = Map(
    "q_source_orc" -> Formats.auditOracle,
    "q_source_csv" -> Formats.auditOracle,
    "q_source_json" -> Formats.auditOracle,
    "q_source_xml" -> Formats.auditOracle)
}
