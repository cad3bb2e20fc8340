package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in per-module registries (graft.queries.*,
  * graft.operators.*); this object just flattens them into the
  * name → fn and name → oracle maps the driver consumes.
  */
object SparkEntry {

  def registry: Seq[Q] =
    _root_.graft.queries.RelationalQueries.all ++
      _root_.graft.queries.TrailAnalytics.queries ++
      engine.TrckQueries.queries ++
      operators.TextAnalysis.queries ++
      operators.Dedup.queries ++
      operators.TrainingDataQueries.queries ++
      operators.Curation.queries ++
      operators.QualityTrain.queries ++
      operators.Graph.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The trck flagship program (single-block counter FSM) run through the
    * distributed TrailEngine.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("m1_fsm_count")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case Q(n, _, Some(sql)) => n -> sql.stripMargin.trim }.toMap
}
