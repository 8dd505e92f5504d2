package graft.spark.metrics

import org.apache.spark.sql.connector.metric.CustomSumMetric

/** One top-level, zero-arg class per DSv2 custom scan metric.
  *
  * Spark's SQLAppStatusListener re-instantiates each metric class
  * REFLECTIVELY (by class name, requiring a public no-arg constructor) to
  * aggregate task values at query end — a nested class with constructor
  * args compiles fine but then throws "did not have a zero-argument
  * constructor" on every query (the r7 `[error]` spam), so the metric
  * never aggregates. The reference solves it the same way: one tiny
  * top-level class per metric (spark/v4.0/spark/src/main/java/org/apache/
  * iceberg/spark/source/metrics/NumSplits.java et al.).
  */
final class NumSplits extends CustomSumMetric {
  override def name(): String = "numSplits"
  override def description(): String = "number of file splits read"
}

final class NumDeletes extends CustomSumMetric {
  override def name(): String = "numDeletes"
  override def description(): String = "number of row deletes applied"
}

final class TotalDataManifests extends CustomSumMetric {
  override def name(): String = "totalDataManifests"
  override def description(): String = "total data manifests"
}

final class ScannedDataManifests extends CustomSumMetric {
  override def name(): String = "scannedDataManifests"
  override def description(): String = "scanned data manifests"
}

final class SkippedDataManifests extends CustomSumMetric {
  override def name(): String = "skippedDataManifests"
  override def description(): String = "skipped data manifests"
}

final class TotalDataFiles extends CustomSumMetric {
  override def name(): String = "totalDataFiles"
  override def description(): String = "total data files"
}

final class ResultDataFiles extends CustomSumMetric {
  override def name(): String = "resultDataFiles"
  override def description(): String = "result data files"
}

final class SkippedDataFiles extends CustomSumMetric {
  override def name(): String = "skippedDataFiles"
  override def description(): String = "skipped data files"
}

final class ResultDeleteFiles extends CustomSumMetric {
  override def name(): String = "resultDeleteFiles"
  override def description(): String = "result delete files"
}

final class TotalPlanningDuration extends CustomSumMetric {
  override def name(): String = "totalPlanningDuration"
  override def description(): String = "total planning duration (ms)"
}
