package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (one entry per implemented
  * operator from SURVEY.md §2 plus the training-data-pipeline operators);
  * `oracleSql` carries the DuckDB-equivalent SQL for every
  * SQL-expressible entry. Registry is assembled from the per-package
  * query modules.
  */
object SparkEntry {

  /** All registered queries (name → implementation + optional oracle). */
  def registry: Map[String, Q] =
    etl.Relational.queries ++ etl.DataMix.queries ++
      etl.Sharding.queries ++ etl.EventAnalytics.queries ++
      etl.GapFill.queries ++ text.Bm25.queries ++ text.Rake.queries ++
      text.PhraseSearch.queries ++
      dedup.FuzzyLink.queries ++ dedup.EmbedDecon.queries ++
      etl.RateWindows.queries ++
      text.Collocations.queries ++ etl.MarketBasket.queries ++
      stats.Anova.queries ++ stats.TwoSample.queries ++
      stats.Winsorize.queries ++ stats.MutualInfo.queries ++
      stats.GroupedOls.queries ++ stats.QuantileMap.queries ++
      sim.MaxSim.queries ++ sim.HybridRrf.queries ++
      sim.JlProject.queries ++
      sim.GraphTriangles.queries ++ sim.KCore.queries ++
      sim.ClusterLabels.queries ++
      etl.SessionPaths.queries ++ etl.SeqPatterns.queries ++
      etl.SessionFunnel.queries ++
      etl.Scd.queries ++
      etl.ZOrder.queries ++ etl.MultiJoin.queries ++
      etl.Expectations.queries ++ etl.CurationFunnel.queries ++
      etl.TemporalSplit.queries ++ etl.SkewReport.queries ++
      etl.StageFloor.queries ++
      etl.Curriculum.queries ++
      plans.GroupedTopK.queries ++
      stats.StatsQueries.queries ++ stats.Drift.queries ++
      stats.Agreement.queries ++ stats.Bootstrap.queries ++
      stats.KruskalWallis.queries ++ stats.Cuped.queries ++
      stats.FdrSweep.queries ++ stats.Kish.queries ++
      stats.Gini.queries ++ stats.Survival.queries ++
      stats.LogRank.queries ++ stats.Jackknife.queries ++
      stats.Fleiss.queries ++ stats.RocAuc.queries ++
      stats.TrendTest.queries ++ stats.BradleyTerry.queries ++
      stats.Conformal.queries ++ stats.Isotonic.queries ++
      text.Heaps.queries ++ etl.Privacy.queries ++
      stats.DawidSkene.queries ++ stats.AbDesign.queries ++
      stats.ExperimentOps.queries ++ stats.TreatmentEffects.queries ++
      inference.Raking.queries ++ stats.Krippendorff.queries ++
      stats.Spearman.queries ++ stats.CochranArmitage.queries ++
      stats.McNemar.queries ++ stats.WelchT.queries ++
      stats.Levene.queries ++ stats.Friedman.queries ++
      stats.Dunn.queries ++ stats.Wasserstein.queries ++
      stats.Association.queries ++ stats.Brier.queries ++
      stats.Cronbach.queries ++ stats.Benford.queries ++
      stats.Simpson.queries ++ etl.Dispersion.queries ++
      etl.Autocorr.queries ++ stats.GwetAc1.queries ++
      stats.Cmh.queries ++
      text.QueryLikelihood.queries ++
      dedup.LshAudit.queries ++ dedup.VersionedGramIndex.queries ++
      sim.RankBiasedOverlap.queries ++ text.Zipf.queries ++
      text.PseudoRelevance.queries ++ etl.UniMax.queries ++
      text.VocabCoverage.queries ++ etl.ChangePoint.queries ++
      text.Jsd.queries ++ etl.Ewma.queries ++ etl.Seasonal.queries ++ etl.Holt.queries ++
      text.TextOps.queries ++ text.BpeMerge.queries ++
      text.UnigramLm.queries ++ text.Objectives.queries ++
      text.ChatPrep.queries ++ text.ChatTokens.queries ++
      text.UnigramPrune.queries ++ text.BestFitPack.queries ++
      etl.PaddingReport.queries ++
      text.PackContamination.queries ++ etl.ShuffleQuality.queries ++
      text.NgramLm.queries ++ text.TrigramLm.queries ++
      text.KneserNey.queries ++
      text.QualityClassifier.queries ++
      text.Blocklist.queries ++ text.UrlOps.queries ++
      text.Dsir.queries ++
      dedup.DedupOps.queries ++ dedup.VersionedEmbedIndex.queries ++
      dedup.Saturation.queries ++
      dedup.DupClusters.queries ++
      sim.SimilarityOps.queries ++ sim.VersionedIvf.queries ++
      sim.RerankFusion.queries ++ text.Novelty.queries ++
      sim.RetrievalEval.queries ++ sim.Err.queries ++
      sim.MmrDiversify.queries ++
      sim.Matryoshka.queries ++ sim.LabelProp.queries ++
      sim.GraphStats.queries ++ sim.Triplets.queries ++ sim.Hits.queries ++
      sim.KCenter.queries ++
      multimodal.MultimodalOps.queries ++
      multimodal.PerceptualHash.queries ++
      multimodal.AudioFingerprint.queries ++
      multimodal.VideoPHash.queries ++
      multimodal.MediaLake.queries ++
      multimodal.TarShards.queries ++
      cluster.MlQueries.queries ++ sketch.HeavyHitters.queries ++
      sketch.CountMin.queries ++ sketch.ThetaKmv.queries ++
      pipeline.CorpusCuration.queries ++ pipeline.SurveyCuration.queries ++
      pipeline.TokenizerPipeline.queries ++ pipeline.SftPipeline.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-style pricing summary: scan → filter → groupBy → agg, fully
    * whole-stage-codegen'd with map-side partial aggregation. */
  def entry(spark: SparkSession): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_quantity") > 0)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, Q(_, Some(sql))) => name -> sql }
}
