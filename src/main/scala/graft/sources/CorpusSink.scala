package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Curated-corpus parquet sink — the write side of the pipeline: after
  * dedup/filter/mix, the corpus ships as partitioned parquet that the
  * NEXT consumer (tokenizer, trainer, another Spark job) can scan with
  * partition pruning and per-file parallelism.
  *
  * Write discipline for 100 TB:
  *  - `partitionBy` a LOW-cardinality column (source/domain/date) so
  *    directory listing stays sane and consumers prune scans;
  *  - one shuffle to co-locate each partition value before the write —
  *    without it every task writes a file into every partition dir
  *    (tasks × partitions small files, the classic fragmentation bug);
  *  - rows clustered by `doc_id` inside files (stable ordering →
  *    reproducible files, better column compression);
  *  - `maxRecordsPerFile` bounds file size so a hot partition splits
  *    into parallel-scannable files instead of one giant one.
  */
object CorpusSink {

  def write(df: DataFrame, path: String, partitionCol: String = "source",
      maxRecordsPerFile: Long = 1000000L, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(col(partitionCol))
      .sortWithinPartitions(col(partitionCol), col("doc_id"))
      .write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(path)
}
