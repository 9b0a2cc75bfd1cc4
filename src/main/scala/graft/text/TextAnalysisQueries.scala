package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryPack

object TextAnalysisQueries extends QueryPack {
  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  override val oracles: Map[String, String] = Map()
}
