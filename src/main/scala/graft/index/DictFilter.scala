package graft.index

import graft.codecs.{BinVec, ChunkCodec}
import graft.encode.{EncodedBlock, TableCodec}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.graftshim.InternalRowShim
import org.apache.spark.sql.types.StructType
import java.nio.charset.StandardCharsets.UTF_8

/** Decode-free dictionary predicates over the encoded store: equality /
  * isin on a string column is answered in the CODE domain for
  * DICT-encoded chunks (compare the ≤few-hundred dictionary entries,
  * then scan bit-packed codes) and by a single compare for CONST
  * chunks — matching rows are then gathered positionally; chunks whose
  * dictionary lacks every target never materialize a single value.
  * Mirrors the reference's dictionary-predicate rewrite
  * (python-blosc2 ctable.py:12953-13029).
  *
  * Chunks under other plans (FSST/PLAIN/BYTEPACK) fall back to decoding
  * ONLY the filter column to find positions, then gather — still never
  * a full-width decode of non-matching rows.
  */
object DictFilter {

  def isinScan(spark: SparkSession, storeDir: String, schema: StructType,
               colName: String, values: Seq[String]): DataFrame = {
    implicit val encB: org.apache.spark.sql.Encoder[EncodedBlock] = Encoders.product[EncodedBlock]
    val names = schema.fieldNames
    val dts = schema.fields.map(_.dataType)
    val targets = values.map(_.getBytes(UTF_8)).toArray
    val blocks = spark.read.parquet(storeDir)
      .select("shard", "partId", "chunkId", "nRows", "cols").as[EncodedBlock]
    val rdd = blocks.rdd.mapPartitions { it =>
      it.flatMap { b =>
        val c = b.cols.find(_.name == colName)
          .getOrElse(throw new IllegalArgumentException(s"no column $colName"))
        val positions = ChunkCodec.dictEqualityPositions(c.payload, targets).getOrElse {
          // non-dictionary plan: decode just this one column for positions
          val vec = TableCodec.decodeColumn(c).asInstanceOf[BinVec]
          val out = new scala.collection.mutable.ArrayBuffer[Int]()
          var i = 0
          while (i < vec.n) {
            if (vec.isValid(i) && targets.exists(java.util.Arrays.equals(_, vec.values(i)))) out += i
            i += 1
          }
          out.toArray
        }
        if (positions.isEmpty) Iterator.empty
        else TableCodec.rowsOfBlock(b, names, dts, withShard = false, positions = positions)
      }
    }
    InternalRowShim.createDataFrame(spark, rdd, schema)
  }

  def equalityScan(spark: SparkSession, storeDir: String, schema: StructType,
                   colName: String, value: String): DataFrame =
    isinScan(spark, storeDir, schema, colName, Seq(value))
}
