package graft.queries

/** Aggregates every query module into the SparkEntry contract maps. */
object Registry {
  def all: Seq[Q] = Relational.qs ++ Alignment.qs ++ Aggregates.qs ++ PhysicsQueries.qs ++ WaveQueries.qs ++ PipelineQueries.qs ++ ProfileQueries.qs ++ SpectralAggQueries.qs ++ SonarQueries.qs ++ CurationQueries.qs

  lazy val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    all.map(q => q.name -> q.run).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap

  /** Quadratic referee baselines — spec-only (ScalePathSpec equality
    * proofs), never registered with the driver: their plans are
    * O(corpus²) by construction and exist solely to define the correct
    * result set for the registered scale paths named in their `note`. */
  def referees: Seq[Q] = PipelineQueries.referees

  lazy val refereeQueries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    referees.map(q => q.name -> q.run).toMap
}
