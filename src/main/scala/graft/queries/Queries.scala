package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** The 40-query contract (SURVEY.md §2): one entry per operator.
  *
  * Two implementation surfaces, both entering the same Catalyst
  * pipeline:
  *   - native DataFrame-API implementations ([[Relational]] and
  *     friends) — the idiomatic engine;
  *   - the validated Spark-SQL texts ([[QueryTexts.spark]]) as the SQL
  *     compatibility surface and fallback.
  * A native implementation must stay row-identical to the oracle; the
  * SQL text remains available for differential testing.
  */
object Queries {

  type QueryFn = (SparkSession, String) => DataFrame

  /** Run the validated Spark-SQL text over the registered table views. */
  def sql(key: String): QueryFn = (spark, sfDir) => {
    Tables.registerAll(spark, sfDir)
    spark.sql(QueryTexts.spark(key))
  }

  /** Native DataFrame-API implementations; keys here shadow the SQL path. */
  private def native: Map[String, QueryFn] =
    Relational.queries ++ Analytics.queries ++ Pipeline.queries

  val all: Map[String, QueryFn] =
    QueryTexts.spark.keys.map(k => k -> native.getOrElse(k, sql(k))).toMap ++
      Extensions.queries ++ Extended.queries ++ DecisionSupport.queries ++
      Curation.queries ++ Series.queries ++ Retrieval.queries ++
      Corpus.queries ++ Quality.queries ++ Activity.queries ++ Composite.queries ++
      Training.queries ++ Diversity.queries ++ Evaluation.queries ++
      Governance.queries ++ Graph.queries ++ Introspection.queries ++
      Calibration.queries ++ Profiles.queries ++ Tuning.queries ++
      Selection.queries ++ Lifecycle.queries ++ Flows.queries ++
      Spectrum.queries ++ Motifs.queries ++ Reconcile.queries ++
      Robust.queries ++ Concord.queries ++ Division.queries ++
      Forensics.queries ++ Dynamics.queries ++ Tenure.queries ++
      Integrity.queries ++ Gains.queries

  val oracle: Map[String, String] =
    QueryTexts.oracle ++ Extensions.oracle ++ Extended.oracle ++
      DecisionSupport.oracle ++ Curation.oracle ++ Series.oracle ++
      Retrieval.oracle ++ Corpus.oracle ++ Quality.oracle ++ Activity.oracle ++
      Composite.oracle ++ Training.oracle ++ Diversity.oracle ++
      Evaluation.oracle ++ Governance.oracle ++ Graph.oracle ++
      Introspection.oracle ++ Calibration.oracle ++ Profiles.oracle ++
      Tuning.oracle ++ Selection.oracle ++ Lifecycle.oracle ++ Flows.oracle ++
      Spectrum.oracle ++ Motifs.oracle ++ Reconcile.oracle ++
      Robust.oracle ++ Concord.oracle ++ Division.oracle ++
      Forensics.oracle ++ Dynamics.oracle ++ Tenure.oracle ++
      Integrity.oracle ++ Gains.oracle
}
