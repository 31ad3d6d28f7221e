package graft.queries

/** Aggregates every query module into the SparkEntry contract maps. */
object Registry {
  def all: Seq[Q] = Relational.qs ++ Alignment.qs ++ Aggregates.qs ++ PhysicsQueries.qs ++ WaveQueries.qs ++ PipelineQueries.qs ++ ProfileQueries.qs ++ SpectralAggQueries.qs ++ SonarQueries.qs ++ CurationQueries.qs

  lazy val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    all.map(q => q.name -> q.run).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
