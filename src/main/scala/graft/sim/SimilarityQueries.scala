package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryPack

object SimilarityQueries extends QueryPack {
  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  override val oracles: Map[String, String] = Map()
}
