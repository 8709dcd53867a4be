package graft.job

import graft.corpus.Corpus
import graft.encode.TableCodec
import graft.lineage.{GeneratedCols, Lineage}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** spark-submit entrypoint for the encode pipeline (the analog of the
  * reference's `cli/parquet_to_blosc2.py` batch converter).
  *
  * Usage (class graft.job.GraftJob):
  *   gen     <outParquet> <nRows> <nParts> [hotRepoFrac]   synthesize corpus
  *   encode  <inParquet> <outDir> [nShards] [nBatches]     resumable encode
  *   verify  <encodedDir>                                  sha256 roundtrip check
  *   decode  <encodedDir> <outParquet>                     decode back to parquet
  *   stats   <encodedDir>                                  codec mix + ratios
  *   index   <encodedDir> <col>                            build FULL index
  *   lookup  <encodedDir> <col> <lo> <hi>                  planned range query
  *   slice   <encodedDir> <start> <count>                  positional rows
  *   delete  <encodedDir> <col> <value>                    copy-on-write delete
  *   recluster <encodedDir> <col>                          decode-free chunk re-order
  *   vacuum  <encodedDir>                                  reap unreferenced snapshot files
  *   gencol add <encodedDir> <name> <exprSql>              materialize generated column
  *   gencol refresh <encodedDir> <name>                    recompute stale shards only
  *   gencol stale <encodedDir> <name>                      list stale shards
  *   catalog put|get|ls|rm <root> ...                      hierarchical table catalog
  *
  * On a real cluster the same jar runs unchanged: all stages are
  * shuffle-free mapPartitions (encode/decode/verify) or manifest-sized
  * aggregations (stats).
  */
object GraftJob {

  def session(app: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val b = SparkSession.builder().appName(app)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // under spark-submit master is provided; default to local for dev
    val withMaster = if (sys.props.contains("spark.master")) b else b.master(s"local[$cpus]")
    val s = withMaster.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "gen" :: out :: nRows :: nParts :: rest =>
      val spark = session("graft-gen")
      val hot = rest.headOption.map(_.toDouble).getOrElse(0.0)
      Corpus.generate(spark, nRows.toLong, nParts.toInt, hotRepoFrac = hot)
        .write.mode(SaveMode.Overwrite).parquet(out)
      println(s"""{"job":"gen","rows":$nRows,"out":"$out"}""")
      spark.stop()

    case "encode" :: in :: out :: rest =>
      val spark = session("graft-encode")
      val nShards = rest.headOption.map(_.toInt).getOrElse(64)
      val nBatches = rest.drop(1).headOption.map(_.toInt).getOrElse(8)
      val t0 = System.nanoTime()
      val sum = Lineage.encodeResumable(spark, spark.read.parquet(in), out,
        idCols = Seq("repo", "path", "commit"), nShards = nShards, nBatches = nBatches)
      val sec = (System.nanoTime() - t0) / 1e9
      val gbps = sum.nBytes / 1e9 / sec
      println(f"""{"job":"encode","rows":${sum.nRows},"nBytes":${sum.nBytes},"cBytes":${sum.cBytes},"ratio":${sum.nBytes.toDouble / math.max(1, sum.cBytes)}%.3f,"sec":$sec%.2f,"encodeGBps":$gbps%.4f,"shardsDone":${sum.shardsDone},"shardsSkipped":${sum.shardsSkipped}}""")
      spark.stop()

    case "verify" :: dir :: Nil =>
      val spark = session("graft-verify")
      val ver = TableCodec.verify(Lineage.readBlocks(spark, dir))
      val total = ver.count()
      val bad = ver.filter(v => !v.ok).count()
      println(s"""{"job":"verify","chunkCols":$total,"mismatches":$bad,"ok":${bad == 0}}""")
      spark.stop()
      if (bad != 0) sys.exit(1)

    case "decode" :: dir :: out :: Nil =>
      val spark = session("graft-decode")
      val schema = codeSchema
      val t0 = System.nanoTime()
      TableCodec.decode(Lineage.readBlocks(spark, dir), schema)
        .write.mode(SaveMode.Overwrite).parquet(out)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"job":"decode","sec":$sec%.2f,"out":"$out"}""")
      spark.stop()

    case "stats" :: dir :: Nil =>
      val spark = session("graft-stats")
      // metadata leaves only — no payload byte is read for stats
      val byPlan = graft.encode.StoreLayout.colStats(spark, dir)
        .groupBy("col", "plan")
        .agg(count(lit(1)).as("chunks"), sum("nBytes").as("nBytes"), sum("cBytes").as("cBytes"))
        .withColumn("ratio", round(col("nBytes") / col("cBytes"), 2))
        .orderBy("col", "plan")
      byPlan.show(100, truncate = false)
      spark.stop()

    case "index" :: dir :: colName :: Nil =>
      val spark = session("graft-index")
      val t0 = System.nanoTime()
      graft.index.IndexStore.createFull(spark, dir, codeSchema, colName)
      val rows = spark.read.parquet(graft.index.IndexStore.fullPath(dir, colName)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"job":"index","col":"$colName","entries":$rows,"sec":$sec%.2f}""")
      spark.stop()

    case "lookup" :: dir :: colName :: lo :: hi :: Nil =>
      val spark = session("graft-lookup")
      val t0 = System.nanoTime()
      val (df, choice) = graft.index.Planner.query(spark, dir, codeSchema, colName, lo, hi)
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"job":"lookup","col":"$colName","path":"${choice.path}","rows":$n,"idxChunks":${choice.idxChunks},"zoneChunks":${choice.zoneChunks},"totalChunks":${choice.totalChunks},"sec":$sec%.2f}""")
      spark.stop()

    case "slice" :: dir :: start :: cnt :: Nil =>
      val spark = session("graft-slice")
      val n = graft.index.IndexStore.slice(spark, dir, codeSchema, start.toLong, cnt.toLong).count()
      println(s"""{"job":"slice","start":$start,"count":$cnt,"rows":$n}""")
      spark.stop()

    // agg <dir> <col> — decode-free count/min/max (zone metadata only;
    // unbounded chunks fall back to a one-column decode)
    case "agg" :: dir :: colName :: Nil =>
      val spark = session("graft-agg")
      val t0 = System.nanoTime()
      val n = graft.encode.MetaAgg.count(spark, dir)
      val (mn, mx) = graft.encode.MetaAgg.minMax(spark, dir, codeSchema, colName)
      val sec = (System.nanoTime() - t0) / 1e9
      // JSON-safe display form: escape control/quote chars, cap length
      def esc(v: Option[Any]): String = v.map(_.toString).getOrElse("")
        .take(64).flatMap {
          case '"' => "\\\""
          case '\\' => "\\\\"
          case c if c < ' ' => f"\\u${c.toInt}%04x"
          case c => c.toString
        }
      println(f"""{"job":"agg","col":"$colName","rows":$n,"min":"${esc(mn)}","max":"${esc(mx)}","sec":$sec%.2f}""")
      spark.stop()

    // groupcount <dir> <col> — decode-free GROUP BY col COUNT(*) from
    // the per-chunk value histograms (histogram-dead chunks fall back
    // to a one-column decode); prints top groups by count
    case "groupcount" :: dir :: colName :: Nil =>
      val spark = session("graft-groupcount")
      val t0 = System.nanoTime()
      val rows = graft.encode.MetaAgg.groupCount(spark, dir, codeSchema, colName)
        .orderBy(col("cnt").desc, col("value")).limit(20).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val groups = rows.map { r =>
        val v = if (r.isNullAt(0)) "null" else "\"" + r.getString(0).take(64)
          .flatMap {
            case '"' => "\\\""
            case '\\' => "\\\\"
            case c if c < ' ' => f"\\u${c.toInt}%04x"
            case c => c.toString
          } + "\""
        s"""{"value":$v,"cnt":${r.getLong(1)}}"""
      }.mkString(",")
      println(f"""{"job":"groupcount","col":"$colName","groups":[$groups],"sec":$sec%.2f}""")
      spark.stop()

    case "delete" :: dir :: colName :: value :: Nil =>
      val spark = session("graft-delete")
      val t0 = System.nanoTime()
      val deleted = Lineage.deleteWhere(spark, dir, codeSchema, col(colName) === value)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"job":"delete","col":"$colName","deleted":$deleted,"sec":$sec%.2f}""")
      spark.stop()

    // recluster <dir> <col[,col2[,col3]]> — decode-free physical
    // re-order of chunks by a column's zone key (reference
    // reorder_offsets), or by the Z-ORDER interleave of 2-4 columns'
    // zone-key ranks (multi-column box-probe locality); payloads and
    // indexes untouched, committed as a snapshot version
    case "recluster" :: dir :: colName :: Nil =>
      val spark = session("graft-recluster")
      val t0 = System.nanoTime()
      val cols = colName.split(',').toSeq
      if (cols.size == 1) graft.encode.StoreLayout.recluster(spark, dir, codeSchema, colName)
      else graft.encode.StoreLayout.reclusterZOrder(spark, dir, codeSchema, cols)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"job":"recluster","col":"$colName","zorder":${cols.size > 1},"sec":$sec%.2f}""")
      spark.stop()

    // vacuum <dir> — reap data files no snapshot version references
    // (replaced by CoW mutations, or orphaned by a crashed writer);
    // run when no reader is pinned to an old version (SWMR contract)
    // bundle pack <storeDir> <outFile> — single-file export of the
    // CURRENT store version (reference to_b2z/to_b2d)
    case "bundle" :: "pack" :: dir :: outFile :: Nil =>
      val spark = session("graft-bundle-pack")
      val t0 = System.nanoTime()
      val (files, bytes) = graft.encode.Bundle.pack(spark, dir, outFile)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"job":"bundle-pack","files":$files,"bytes":$bytes,"out":"$outFile","sec":$sec%.2f}""")
      spark.stop()

    case "bundle" :: "unpack" :: bundleFile :: outDir :: Nil =>
      val spark = session("graft-bundle-unpack")
      val t0 = System.nanoTime()
      val (files, bytes) = graft.encode.Bundle.unpack(spark, bundleFile, outDir)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"job":"bundle-unpack","files":$files,"bytes":$bytes,"out":"$outDir","sec":$sec%.2f}""")
      spark.stop()

    case "vacuum" :: dir :: Nil =>
      val spark = session("graft-vacuum")
      val t0 = System.nanoTime()
      val reaped = graft.encode.Snapshots.vacuum(spark, dir)
      val v = graft.encode.Snapshots.currentVersion(spark, dir).getOrElse(-1L)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"job":"vacuum","filesReaped":$reaped,"version":$v,"sec":$sec%.2f}""")
      spark.stop()

    // gencol add <dir> <name> <exprSql>   — materialize a generated column
    // gencol refresh <dir> <name>         — recompute stale shards only
    // gencol stale <dir> <name>           — list stale shards
    case "gencol" :: "add" :: dir :: name :: exprSql :: Nil =>
      val spark = session("graft-gencol")
      val t0 = System.nanoTime()
      GeneratedCols.add(spark, dir, codeSchema, name, exprSql, Seq("repo", "path", "commit"))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"job":"gencol-add","name":"$name","sec":$sec%.2f}""")
      spark.stop()

    case "gencol" :: "refresh" :: dir :: name :: Nil =>
      val spark = session("graft-gencol")
      val t0 = System.nanoTime()
      val shards = GeneratedCols.refresh(spark, dir, codeSchema, name)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"job":"gencol-refresh","name":"$name","shardsRecomputed":${shards.size},"sec":$sec%.2f}""")
      spark.stop()

    case "gencol" :: "stale" :: dir :: name :: Nil =>
      val spark = session("graft-gencol")
      val shards = GeneratedCols.staleShards(spark, dir, name)
      println(s"""{"job":"gencol-stale","name":"$name","staleShards":[${shards.mkString(",")}]}""")
      spark.stop()

    // catalog put <root> <key> <inParquet> <idCols,csv>  — encode a table into the catalog
    // catalog get <root> <key> <outParquet>              — decode a catalog table
    // catalog ls  <root> [path]                          — list children (key, table?)
    // catalog rm  <root> <key>                           — delete subtree
    case "catalog" :: "put" :: root :: key :: in :: ids :: Nil =>
      val spark = session("graft-catalog")
      val t0 = System.nanoTime()
      val df = spark.read.parquet(in)
      val sum = new graft.catalog.Catalog(spark, root).put(key, df, ids.split(",").toSeq)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"job":"catalog-put","key":"$key","rows":${sum.nRows},"sec":$sec%.2f}""")
      spark.stop()

    case "catalog" :: "get" :: root :: key :: out :: Nil =>
      val spark = session("graft-catalog")
      val df = new graft.catalog.Catalog(spark, root).get(key)
      df.write.mode(SaveMode.Overwrite).parquet(out)
      println(s"""{"job":"catalog-get","key":"$key","out":"$out"}""")
      spark.stop()

    case "catalog" :: "ls" :: root :: rest =>
      val spark = session("graft-catalog")
      val cs = new graft.catalog.Catalog(spark, root).children(rest.headOption.getOrElse("/"))
      val items = cs.map { case (k, t) => s"""{"key":"$k","table":$t}""" }.mkString(",")
      println(s"""{"job":"catalog-ls","children":[$items]}""")
      spark.stop()

    case "catalog" :: "rm" :: root :: key :: Nil =>
      val spark = session("graft-catalog")
      val ok = new graft.catalog.Catalog(spark, root).delete(key)
      println(s"""{"job":"catalog-rm","key":"$key","deleted":$ok}""")
      spark.stop()

    case other =>
      System.err.println(s"unknown args: $other — see GraftJob scaladoc")
      sys.exit(2)
  }

  private def codeSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      Seq("repo", "path", "commit", "lang", "content")
        .map(n => org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType)))
}
