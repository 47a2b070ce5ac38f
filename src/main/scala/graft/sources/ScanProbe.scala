package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan

/** Plan introspection for pruning PROOFS: how many data files does a
  * catalog-table plan actually hand to its parquet scan after
  * stats/bucket/bloom pruning? Used by specs and by driver queries
  * whose staged `require`s assert the skipping they claim (a query
  * that merely returns the right ANSWER can't distinguish "pruned to
  * one file" from "scanned everything"). */
object ScanProbe {

  /** The pruned file count of the FIRST v2 parquet scan in the plan;
    * None when the plan has no such scan (fell back to a v1 path, or
    * every BatchScanExec wraps a non-parquet scan). */
  def scannedFiles(df: DataFrame): Option[Int] =
    df.queryExecution.executedPlan.collectLeaves()
      .iterator.flatMap {
        case b: BatchScanExec =>
          (b.scan match {
            case r: RuntimeSkippingScan => r.delegateScan
            case s => s
          }) match {
            case p: ParquetScan => Some(p.fileIndex.inputFiles.length)
            case _ => None // non-parquet v2 scan: not ours to count
          }
        case _ => None
      }.nextOption()
}
