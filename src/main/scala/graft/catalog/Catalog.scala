package graft.catalog

import graft.encode.{StoreLayout, TableCodec}
import graft.lineage.Lineage
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Hierarchical catalog of encoded table stores under one root — the
  * reference's TreeStore/DictStore container layer (python-blosc2
  * tree_store.py:86 hierarchical '/'-keys + traversal; dict_store.py
  * key→container mapping; per-store user metadata = the vlmeta dict,
  * tree_store.py:961).
  *
  * Design for a 1000-writer cluster: NO central registry file to
  * contend on. Each entry directory is self-describing — a tiny
  * `_entry.json` (schema DDL + identity columns) marks it as a table —
  * and catalog listing is a filesystem walk, so concurrent `put`s to
  * different keys never serialize, and a crashed writer leaves at worst
  * an unregistered partial directory (no corrupt catalog state).
  * Entry payloads are full lineage stores: resumable encode, manifest,
  * indexes, generated columns and CoW mutations all work per entry.
  *
  * Keys are '/'-separated paths (`/corpus/docs`); a leading '/' is
  * implied. Path segments map to real subdirectories, so `children` /
  * `descendants` / `walk` are directory listings, not scans.
  */
final class Catalog(val spark: SparkSession, val root: String, val readOnly: Boolean = false) {

  private val ENTRY = "_entry.json"
  // marker inside _put-tmp/_put-old dirs naming the sibling table dir
  // they belong to, so reapTemp can RECOVER a mid-swap crash instead of
  // deleting the only surviving copies
  private val SWAP = "_swap-target"

  private def fs = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Normalize + validate a key: '/'-separated non-empty segments, no
    * '.'/'..', no segment colliding with store-internal dirs.
    */
  def normalize(key: String): String = {
    val segs = key.split("/").filter(_.nonEmpty)
    require(segs.nonEmpty, s"empty key: '$key'")
    segs.foreach { s =>
      require(s != "." && s != "..", s"illegal segment '$s' in key '$key'")
      require(!s.startsWith("_"), s"segments may not start with '_' (reserved): '$key'")
      require(!s.contains("="), s"segments may not contain '=' (partition syntax): '$key'")
    }
    "/" + segs.mkString("/")
  }

  def dirOf(key: String): String = root + normalize(key)

  private def entryPath(key: String) = new org.apache.hadoop.fs.Path(s"${dirOf(key)}/$ENTRY")

  private def requireWritable(op: String): Unit =
    require(!readOnly, s"catalog is read-only: $op refused")

  def contains(key: String): Boolean = fs.exists(entryPath(key))

  /** Encode `df` as the table at `key` (resumable lineage store);
    * re-putting an existing key REPLACES it. Tables are LEAF keys:
    * a table may not live beneath another table (the parent store's
    * parquet scan would swallow the child's files) nor on an interior
    * node that already has children — a Spark-native tightening of the
    * reference's object-subtree rule. The leaf-key checks are
    * check-then-act filesystem reads, ADVISORY under concurrent
    * writers to overlapping keys (concurrent puts to nested keys can
    * both pass); puts to unrelated keys never conflict.
    *
    * Replacement is crash-safe: the new table is encoded into a hidden
    * temp sibling and swapped in AFTER its `_entry.json` is written, so
    * a crash mid-put leaves the previous version either live or parked
    * in a recoverable hidden `_put-old-*` directory — never deleted
    * before the replacement is complete.
    */
  def put(key: String, df: DataFrame, idCols: Seq[String], nShards: Int = 64,
          nBatches: Int = 8): Lineage.RunSummary = {
    requireWritable(s"put($key)")
    val k = normalize(key)
    val segs = k.split("/").filter(_.nonEmpty)
    (1 until segs.length).foreach { i =>
      val anc = "/" + segs.take(i).mkString("/")
      require(!contains(anc), s"cannot create $k beneath existing table $anc")
    }
    require(contains(k) || children(k).isEmpty,
      s"cannot create a table at interior node $k (it has children)")
    val target = new org.apache.hadoop.fs.Path(dirOf(k))
    val parent = target.getParent
    val tag = java.util.UUID.randomUUID().toString
    val tmp = new org.apache.hadoop.fs.Path(parent, s"_put-tmp-$tag")
    val summary = Lineage.encodeResumable(spark, df, tmp.toString, idCols,
      nShards = nShards, nBatches = nBatches)
    writeSmall(new org.apache.hadoop.fs.Path(tmp, SWAP), target.getName)
    val meta =
      s"""{"schemaDdl":${jsonStr(df.schema.json)},"idCols":[${idCols.map(jsonStr).mkString(",")}]}"""
    writeSmall(new org.apache.hadoop.fs.Path(tmp, ENTRY), meta)
    // swap: park the old version (hidden), promote the complete new one,
    // only then drop the old. Markers let reapTemp finish an interrupted
    // swap; they ride along into the live dir ('_'-prefixed → ignored by
    // every reader) rather than widening the crash window with a delete.
    val old = new org.apache.hadoop.fs.Path(parent, s"_put-old-$tag")
    if (fs.exists(target)) {
      require(fs.rename(target, old), s"put($k): could not park old version")
      writeSmall(new org.apache.hadoop.fs.Path(old, SWAP), target.getName)
    }
    require(fs.rename(tmp, target), s"put($k): could not promote new version")
    if (fs.exists(old)) { fs.delete(old, true); () }
    // the encode invalidated the TMP path's cache entries; the promoted
    // target needs its own explicit invalidation (the mtime-based cache
    // version is not reliable across a directory rename)
    graft.encode.QueryCache.invalidate(dirOf(k))
    summary
  }

  /** Reap hidden `_put-tmp-*` / `_put-old-*` directories left by
    * crashed `put` runs (full table copies — invisible to listings but
    * real disk). The debris lives in the crashed table's PARENT
    * directory, so call this on a parent path or the root ("/", the
    * default) — calling it on the table key itself finds nothing.
    * Call when NO put is in flight under `path`: a live put's temp
    * directory is indistinguishable from a dead one.
    *
    * A put that crashed MID-SWAP (old version parked, new one not yet
    * promoted) leaves the table ABSENT with its only copies in the
    * hidden dirs — each carries a `_swap-target` marker naming its
    * table, so the reaper FINISHES the swap instead of deleting the
    * sole survivors: a complete `_put-tmp` (entry written) is promoted
    * to the table; an incomplete one is dropped and the parked
    * `_put-old` restored. Debris is deleted only when its target table
    * is live (or it carries no marker — pre-marker legacy). Returns
    * the number of directories handled (removed or recovered).
    */
  def reapTemp(path: String = "/"): Long = {
    requireWritable(s"reapTemp($path)")
    val base = if (path == "/" || path.isEmpty) root else dirOf(path)
    val p = new org.apache.hadoop.fs.Path(base)
    if (!fs.exists(p)) return 0L
    var n = 0L
    val sts = fs.listStatus(p).filter(_.isDirectory)
    def target(d: org.apache.hadoop.fs.Path): Option[org.apache.hadoop.fs.Path] =
      readSmall(new org.apache.hadoop.fs.Path(d, SWAP))
        .map(name => new org.apache.hadoop.fs.Path(p, name.trim))
    // tmp dirs first: a complete one is the NEWEST finished version and
    // wins the interrupted swap; its parked old twin is then redundant
    sts.filter(_.getPath.getName.startsWith("_put-tmp-")).foreach { st =>
      val tag = st.getPath.getName.stripPrefix("_put-tmp-")
      val oldTwin = new org.apache.hadoop.fs.Path(p, s"_put-old-$tag")
      target(st.getPath) match {
        case Some(t) if !fs.exists(t) =>
          if (fs.exists(new org.apache.hadoop.fs.Path(st.getPath, ENTRY))) {
            require(fs.rename(st.getPath, t), s"reapTemp: could not promote ${st.getPath}")
            if (fs.exists(oldTwin)) { fs.delete(oldTwin, true); () }
          } else {
            if (fs.exists(oldTwin))
              require(fs.rename(oldTwin, t), s"reapTemp: could not restore $oldTwin")
            fs.delete(st.getPath, true); ()
          }
          graft.encode.QueryCache.invalidate(t.toString)
          n += 1
        case _ => if (fs.delete(st.getPath, true)) n += 1 // target live or legacy
      }
    }
    sts.filter(_.getPath.getName.startsWith("_put-old-")).foreach { st =>
      if (fs.exists(st.getPath)) target(st.getPath) match {
        case Some(t) if !fs.exists(t) =>
          // parked old with no (surviving) complete tmp: restore it
          require(fs.rename(st.getPath, t), s"reapTemp: could not restore ${st.getPath}")
          graft.encode.QueryCache.invalidate(t.toString)
          n += 1
        case _ => if (fs.delete(st.getPath, true)) n += 1
      }
    }
    sts.foreach { st =>
      val name = st.getPath.getName
      if (!name.startsWith("_") && !name.contains("="))
        n += reapTemp((if (path == "/" || path.isEmpty) "" else normalize(path)) + "/" + name)
    }
    n
  }

  private def writeSmall(p: org.apache.hadoop.fs.Path, text: String): Unit = {
    val out = fs.create(p, true)
    out.write(text.getBytes("UTF-8"))
    out.close()
  }

  private def readSmall(p: org.apache.hadoop.fs.Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }

  final case class Entry(key: String, schema: StructType, idCols: Seq[String])

  def entry(key: String): Entry = {
    val k = normalize(key)
    require(contains(k), s"no table at $k")
    val in = fs.open(entryPath(k))
    val text = new String(in.readAllBytes(), "UTF-8")
    in.close()
    val ddl = """"schemaDdl":\s*"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(text)
      .getOrElse(throw new IllegalStateException(s"bad $ENTRY at $k: $text")).group(1)
    // quoted-string extraction + unescape (a naive comma split would
    // corrupt id column names containing quotes, commas or backslashes)
    val ids = """"((?:[^"\\]|\\.)*)"""".r
      .findAllMatchIn(""""idCols":\s*\[([^\]]*)\]""".r.findFirstMatchIn(text)
        .getOrElse(throw new IllegalStateException(s"bad $ENTRY at $k: $text")).group(1))
      .map(m => unescape(m.group(1))).toSeq
    Entry(k, DataType.fromJson(unescape(ddl)).asInstanceOf[StructType], ids)
  }

  /** The decoded table at `key`. */
  def get(key: String): DataFrame = {
    val e = entry(key)
    TableCodec.decode(StoreLayout.readBlocks(spark, dirOf(e.key)), e.schema)
  }

  /** Direct children of `path`: (key, isTable). Tables are leaf keys
    * (enforced by put), so an interior node is never itself a table —
    * the isTable flag distinguishes table leaves from plain interior
    * directories.
    */
  def children(path: String): Seq[(String, Boolean)] = {
    val base = if (path == "/" || path.isEmpty) root else dirOf(path)
    val p = new org.apache.hadoop.fs.Path(base)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.contains("="))
      .map { st =>
        val rel = (if (path == "/" || path.isEmpty) "" else normalize(path)) + "/" + st.getPath.getName
        (rel, contains(rel))
      }.sortBy(_._1)
  }

  /** Every table key under `path` (depth-first). */
  def descendants(path: String = "/"): Seq[String] =
    children(path).flatMap { case (k, isTable) =>
      (if (isTable) Seq(k) else Nil) ++ descendants(k)
    }

  /** os.walk-style traversal: (dir, childDirs, tableChildren). */
  def walk(path: String = "/"): Seq[(String, Seq[String], Seq[String])] = {
    val cs = children(path)
    val here = (if (path.isEmpty) "/" else path, cs.map(_._1), cs.filter(_._2).map(_._1))
    here +: cs.flatMap { case (k, _) => if (children(k).nonEmpty) walk(k) else Nil }
  }

  /** Delete the table at `key` AND everything beneath it (the
    * reference's subtree delete, tree_store.py:625).
    */
  def delete(key: String): Boolean = {
    requireWritable(s"delete($key)")
    val p = new org.apache.hadoop.fs.Path(dirOf(key))
    fs.exists(p) && fs.delete(p, true)
  }

  /** User metadata on an entry or interior node — the vlmeta analog
    * (tree_store.py:961): an arbitrary string→string map persisted as
    * `_meta.json` beside the entry.
    */
  def setMeta(key: String, kv: Map[String, String]): Unit = {
    requireWritable(s"setMeta($key)")
    val merged = getMeta(key) ++ kv
    val p = new org.apache.hadoop.fs.Path(s"${dirOf(key)}/_meta.json")
    val out = fs.create(p, true)
    out.write(merged.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jsonStr(k)}:${jsonStr(v)}" }
      .mkString("{", ",", "}").getBytes("UTF-8"))
    out.close()
  }

  def getMeta(key: String): Map[String, String] = {
    val p = new org.apache.hadoop.fs.Path(s"${dirOf(key)}/_meta.json")
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val text = new String(in.readAllBytes(), "UTF-8")
    in.close()
    """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(text)
      .map(m => unescape(m.group(1)) -> unescape(m.group(2))).toMap
  }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""

  /** Single-pass, backslash-driven (sequential replace would corrupt a
    * literal backslash followed by n/r/t).
    */
  private def unescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b.append('\n')
          case 'r' => b.append('\r')
          case 't' => b.append('\t')
          case c => b.append(c)
        }
        i += 2
      } else { b.append(s.charAt(i)); i += 1 }
    }
    b.toString
  }
}
