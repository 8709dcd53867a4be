package graft.streaming

import graft.encode.{StoreLayout, TableCodec}
import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming ingest for the encode pipeline.
  *
  * The reference has no streaming engine (SURVEY.md §2.9 — its closest
  * feature is SWMR single-writer/multi-reader refresh, schunk.py:524);
  * the Spark-native shape is Structured Streaming file ingest with
  * `foreachBatch`: each micro-batch is encoded with the SAME
  * shuffle-free TableCodec transform and appended atomically, and the
  * streaming checkpoint provides exactly-once batch lineage (the
  * streaming analog of graft.lineage.Lineage's shard manifest).
  *
  * Windowed/watermarked aggregation over a stream is exercised in
  * StreamingSpec over the events table shape.
  */
object StreamingEncode {

  /** Continuously encode parquet files arriving in `inDir`. */
  def start(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      checkpointDir: String,
      schema: StructType,
      chunkRows: Int = TableCodec.CHUNK_ROWS
  ): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "16")
      .parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Idempotent per batchId: a micro-batch replayed after a failure
        // or restart OVERWRITES its own partition dir instead of
        // appending duplicates — exactly-once at the store level, not
        // just at-least-once. `batch=<id>` is a partition column on read.
        val blocks = TableCodec.encode(batch, chunkRows = chunkRows)
        StoreLayout.toStoreRows(blocks, TableCodec.encodedNames(schema))
          .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$batchId")
        ()
      }
      .start()
  }

  /** Compact a batch-partitioned streaming store into a plain keyed
    * store: (shard, partId, chunkId) is only unique WITHIN a batch, so
    * keyed operations (indexes, gathers, slices) refuse batch stores
    * (StoreLayout.requireNoBatch). Compaction folds the batch id into
    * the chunkId (metadata-level rewrite — payloads are copied, never
    * re-encoded) and drops the batch dimension.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(inDir)
    require(StoreLayout.hasBatchPartitions(df.schema), s"$inDir has no batch= partitions")
    val dataCols = df.schema.fieldNames.filterNot(Seq("batch", "shard", "partId", "chunkId", "nRows").contains)
    df.select(
        col("shard") +: col("partId") +:
          // chunkIds stay far below 2^40 per batch (one counter per task)
          (col("batch").cast("long") * lit(1L << 40) + col("chunkId")).as("chunkId") +:
          col("nRows") +: dataCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(outDir)
  }
}
