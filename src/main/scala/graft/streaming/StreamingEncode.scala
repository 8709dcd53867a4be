package graft.streaming

import graft.encode.TableCodec
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
        blocks.write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$batchId")
        ()
      }
      .start()
  }
}
