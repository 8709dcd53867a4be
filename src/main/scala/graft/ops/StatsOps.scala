package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column statistics beyond describe(): the covariance matrix
  * (reference `cov()`, python-blosc2 ctable.py:6772).
  */
object StatsOps {

  /** Sample-covariance matrix of `cols` in ONE aggregation pass:
    * k(k+1)/2 `covar_samp` partials, map-side combined (no shuffle
    * beyond the single final merge — at 100 TB this is one scan),
    * exploded to long format (col_a, col_b, cov) with `stack` so no
    * second job runs. The diagonal is the sample variance.
    */
  def covMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "covMatrix needs at least one column")
    val pairs = for { i <- cols.indices; j <- i until cols.length } yield (cols(i), cols(j))
    // positional aliases + Column-API explode: no SQL string splicing,
    // so column names with quotes/backticks/underscores can't produce
    // malformed or colliding expressions
    val aggs: Seq[Column] = pairs.zipWithIndex.map { case ((a, b), i) =>
      covar_samp(col(a), col(b)).as(s"__cov_$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(pairs.zipWithIndex.map { case ((a, b), i) =>
        struct(lit(a).as("col_a"), lit(b).as("col_b"), col(s"__cov_$i").as("cov"))
      }: _*)).as("p"))
      .select("p.col_a", "p.col_b", "p.cov")
  }
}
