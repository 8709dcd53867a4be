package graft.functions

import graft.core.Bytes
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}

/** Catalyst-level surface of the engine (SURVEY.md §2.10): a native
  * Expression that reads encoded-block headers without decoding, and a
  * typed Aggregator for compression-ratio rollups — the two extension
  * mechanisms the reference exposes as user codecs/filters + group-by
  * UDF aggs (python-blosc2 core.py:2000, groupby.py:284-297).
  */
object GraftFunctions {

  /** Number of logical rows recorded in a self-describing encoded block,
    * read from the header varint — no decompression, no payload scan.
    * Catalyst Expression (not a Scala UDF): null-safe, usable in SQL.
    */
  case class BlockRows(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val r = new Bytes.Reader(bytes, 6) // skip magic,ver,colType,method,entropy,level
      r.getVarInt()
    }
    override protected def withNewChildInternal(c: Expression): BlockRows = copy(child = c)
    override def prettyName: String = "graft_block_rows"
  }

  /** Logical (uncompressed) byte size recorded in the block header. */
  case class BlockRawLen(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val r = new Bytes.Reader(bytes, 6)
      r.getVarInt() // nRows
      r.getVarInt() // nulls
      r.getVarLong() // rawLen (method body, pre-entropy)
    }
    override protected def withNewChildInternal(c: Expression): BlockRawLen = copy(child = c)
    override def prettyName: String = "graft_block_raw_len"
  }

  import org.apache.spark.sql.graftshim.ColumnShim.{toColumn, toExpr}
  def block_rows(c: Column): Column = toColumn(BlockRows(toExpr(c)))
  def block_raw_len(c: Column): Column = toColumn(BlockRawLen(toExpr(c)))

  /** Register graft_block_rows / graft_block_raw_len for SQL use. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_block_rows", exprs => BlockRows(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_block_raw_len", exprs => BlockRawLen(exprs.head), "scala_udf")
  }

  /** Typed Aggregator: overall compression ratio of (nBytes, cBytes)
    * pairs — partial+final mergeable, registrable as a UDAF.
    */
  object RatioAgg extends Aggregator[(Long, Long), (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) = (b._1 + a._1, b._2 + a._2)
    def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) = (x._1 + y._1, x._2 + y._2)
    def finish(r: (Long, Long)): Double = if (r._2 == 0) 0.0 else r._1.toDouble / r._2
    def bufferEncoder: org.apache.spark.sql.Encoder[(Long, Long)] =
      org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong)
    def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }
}
