package graft.encode

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Single-file store export/import — the reference's `to_b2z`/`to_b2d`
  * bundle (python-blosc2 ctable.py:5641/5698): one self-describing file
  * a user can mail around, holding a CONSISTENT version of the store.
  *
  * Scale position, stated plainly: the partitioned store directory IS
  * the native bundle at scale (every payload already self-describing,
  * SURVEY §2.1) — this is the INTERCHANGE path for small/medium
  * extracts, and it streams through the driver one file at a time
  * (bounded memory via a fixed copy buffer, but O(data) driver
  * bandwidth; it refuses nothing, so the caller sizes the extract).
  *
  * Pack semantics tie into SWMR snapshots: only the CURRENT version's
  * data files are packed — superseded CoW orphans and `_stage`
  * resumable temp state are excluded, so an unpacked bundle is a clean
  * plain-directory store (no `_snapshots` needed: one version exists).
  *
  * Layout (all integers little-endian or LEB128 varints):
  *   magic "GRFTB2D1" (8 bytes)
  *   entry*: varint pathLen (> 0) | path UTF-8 | varint byteLen |
  *           bytes | u32 crc32(bytes)
  *   terminator: varint 0
  *   trailer: u64 entryCount | u64 totalPayloadBytes
  */
object Bundle {

  val MAGIC: Array[Byte] = "GRFTB2D1".getBytes("US-ASCII")

  private def fsOf(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Store-relative paths to pack: the current snapshot's data files
    * (or the physical walk when versioning was never enabled) plus all
    * metadata/derived state except snapshot listings, resumable stage
    * temp, and hidden temp files.
    */
  def manifest(spark: SparkSession, storeDir: String): Seq[String] = {
    val fs = fsOf(spark, storeDir)
    val root = new Path(storeDir)
    require(fs.exists(root), s"no store at $storeDir")
    val data = Snapshots.currentVersion(spark, storeDir) match {
      case Some(v) => Snapshots.listing(spark, storeDir, v)
      case None => Snapshots.dataFiles(spark, storeDir)
    }
    def walk(p: Path, rel: String): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val name = st.getPath.getName
        val r = if (rel.isEmpty) name else s"$rel/$name"
        if (name.startsWith(".") || name == "_snapshots" || name == "_stage" ||
          name.startsWith("_put-")) Nil
        else if (st.isDirectory) {
          if (name.startsWith("shard=")) Nil // data handled via the listing
          else walk(st.getPath, r)
        } else Seq(r)
      }
    (data ++ walk(root, "")).sorted
  }

  /** Pack `storeDir` into the single file `outFile`. Returns
    * (files, payloadBytes).
    */
  def pack(spark: SparkSession, storeDir: String, outFile: String): (Long, Long) = {
    val srcFs = fsOf(spark, storeDir)
    val dstFs = fsOf(spark, outFile)
    val files = manifest(spark, storeDir)
    val out = dstFs.create(new Path(outFile), true)
    val buf = new Array[Byte](1 << 20)
    var total = 0L
    try {
      out.write(MAGIC)
      files.foreach { rel =>
        val st = srcFs.getFileStatus(new Path(s"$storeDir/$rel"))
        val pathBytes = rel.getBytes("UTF-8")
        writeVar(out, pathBytes.length.toLong)
        out.write(pathBytes)
        writeVar(out, st.getLen)
        val crc = new java.util.zip.CRC32()
        val in = srcFs.open(st.getPath)
        try {
          var n = in.read(buf)
          while (n > 0) {
            out.write(buf, 0, n)
            crc.update(buf, 0, n)
            total += n
            n = in.read(buf)
          }
        } finally in.close()
        writeU32(out, crc.getValue)
      }
      writeVar(out, 0L)
      writeU64(out, files.length.toLong)
      writeU64(out, total)
    } finally out.close()
    (files.length.toLong, total)
  }

  /** Unpack a bundle into `outDir` (must not already contain a store's
    * files — existing paths are refused, never overwritten). Verifies
    * magic, per-file CRCs and the trailer. Returns (files, bytes).
    */
  def unpack(spark: SparkSession, bundleFile: String, outDir: String): (Long, Long) = {
    val srcFs = fsOf(spark, bundleFile)
    val dstFs = fsOf(spark, outDir)
    val in = srcFs.open(new Path(bundleFile))
    val buf = new Array[Byte](1 << 20)
    var nFiles = 0L
    var total = 0L
    try {
      val magic = new Array[Byte](MAGIC.length)
      in.readFully(magic)
      require(java.util.Arrays.equals(magic, MAGIC), s"$bundleFile is not a graft bundle")
      var pathLen = readVar(in)
      while (pathLen > 0) {
        val pathBytes = new Array[Byte](pathLen.toInt)
        in.readFully(pathBytes)
        val rel = new String(pathBytes, "UTF-8")
        require(!rel.contains("..") && !rel.startsWith("/"), s"unsafe bundle path: $rel")
        val target = new Path(s"$outDir/$rel")
        require(!dstFs.exists(target), s"unpack refuses to overwrite $target")
        var remaining = readVar(in)
        val crc = new java.util.zip.CRC32()
        val out = dstFs.create(target, false)
        try {
          while (remaining > 0) {
            val n = in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
            require(n > 0, s"truncated bundle at $rel")
            out.write(buf, 0, n)
            crc.update(buf, 0, n)
            remaining -= n
            total += n
          }
        } finally out.close()
        require(readU32(in) == crc.getValue, s"CRC mismatch unpacking $rel")
        nFiles += 1
        pathLen = readVar(in)
      }
      require(readU64(in) == nFiles, "bundle trailer: file count mismatch")
      require(readU64(in) == total, "bundle trailer: byte count mismatch")
    } finally in.close()
    (nFiles, total)
  }

  private def writeVar(out: java.io.OutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def readVar(in: java.io.InputStream): Long = {
    var shift = 0; var out = 0L; var b = 0
    do {
      b = in.read()
      require(b >= 0, "truncated bundle varint")
      out |= (b & 0x7fL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    out
  }
  private def writeU32(out: java.io.OutputStream, v: Long): Unit = {
    var i = 0
    while (i < 4) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }
  private def readU32(in: java.io.InputStream): Long = {
    var v = 0L; var i = 0
    while (i < 4) { val b = in.read(); require(b >= 0, "truncated bundle"); v |= b.toLong << (8 * i); i += 1 }
    v
  }
  private def writeU64(out: java.io.OutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }
  private def readU64(in: java.io.InputStream): Long = {
    var v = 0L; var i = 0
    while (i < 8) { val b = in.read(); require(b >= 0, "truncated bundle"); v |= b.toLong << (8 * i); i += 1 }
    v
  }
}
