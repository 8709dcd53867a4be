package graft.encode

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.types._

/** Conservative zone-map pruning for ARBITRARY `Column` predicates —
  * the index-assisted `where`-before-mutation of the reference
  * (python-blosc2 ctable_indexing.py:1408), lifted to the CoW paths:
  * a selective `deleteWhere`/`updateWhere` must not decode payload
  * bytes of chunks its predicate cannot touch.
  *
  * The predicate is ANALYZED against the table schema (Spark 4's
  * Column wraps unresolved ColumnNodes — `===` is just
  * UnresolvedFunction("="); only the analyzer turns it into typed
  * Catalyst comparisons), then split into AND-conjuncts; each conjunct
  * of the shape `column <op> literal` (op ∈ {=, <=>, <, <=, >, >=,
  * IN}) with a domain-compatible literal becomes a metadata filter
  * over that column's zone keys. Conjuncts that don't match the shape
  * (functions, OR at top level, cross-column compares, type
  * mismatches, NULL probes) are simply IGNORED — ignoring a conjunct
  * can only ADMIT extra chunks, never wrongly prune, because a row
  * satisfying the whole predicate satisfies every conjunct.
  */
object PredicatePrune {

  /** The predicate as a RESOLVED Catalyst expression: analyzed against
    * an empty relation of `schema` (no optimizer — it would collapse
    * the empty relation and lose the condition), with casts of
    * literals folded so comparisons expose plain typed literals.
    */
  def resolve(spark: SparkSession, schema: StructType, predicate: Column): Expression = {
    val dummy = spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    val cond = dummy.filter(predicate).queryExecution.analyzed.collectFirst {
      case f: logical.Filter => f.condition
    }.getOrElse(Literal.TrueLiteral)
    cond.transformUp {
      case c: Cast if c.child.isInstanceOf[Literal] => Literal.create(c.eval(null), c.dataType)
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def isPlainNumeric(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType | BooleanType => true
    case _ => false
  }

  /** True iff `Cast(from → to)` is value-preserving and
    * order-preserving — exactly the casts the analyzer inserts for
    * implicit numeric widening. Anything lossy (fractional→integral
    * truncation, integral narrowing/wraparound, →boolean, long→double
    * rounding past 2^53, int→float past 2^24) changes which rows
    * compare equal, so unwrapping it could WRONGLY PRUNE a chunk whose
    * rows match only after the cast's rounding.
    */
  private def isWideningCast(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (BooleanType, ByteType | ShortType | IntegerType | LongType |
                       FloatType | DoubleType) => true
    case (ByteType, ShortType | IntegerType | LongType | FloatType | DoubleType) => true
    case (ShortType, IntegerType | LongType | FloatType | DoubleType) => true
    case (IntegerType, LongType | DoubleType) => true // int→float is lossy past 2^24
    case (FloatType, DoubleType) => true
    case _ => false // long→double/float lossy past 2^53/2^24; all narrowing lossy
  }

  /** The underlying column behind an (optionally numerically-WIDENED)
    * attribute: `cast(int_col as bigint) = 3L` prunes on int_col —
    * sound because the widening is exact and numeric zone compares run
    * in the double domain either way. Narrowing / semantics-changing
    * casts (double→int truncation, long→int wraparound, →boolean,
    * string→int, date→ts) are NOT unwrapped: e.g.
    * `cast(price as int) = 100` matches rows in zone [100.2, 100.9]
    * after truncation, so pruning on the un-cast zone would skip them.
    * The conjunct is then simply ignored — always safe.
    */
  private def stripAttr(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case c: Cast =>
      c.child match {
        case a: AttributeReference if isWideningCast(a.dataType, c.dataType) => Some(a.name)
        case _ => None
      }
    case _ => None
  }

  /** The literal in the stored column's zone-key domain, iff the
    * literal's type is domain-compatible (same compare family as the
    * zone keys). Decimals are skipped (scale alignment is not worth
    * the risk — the conjunct is just ignored).
    */
  private def domainValue(l: Literal, colDt: DataType): Option[String] = {
    if (l.value == null) return None
    (colDt, l.dataType) match {
      case (StringType, StringType) => Some(l.value.toString)
      case (TimestampType | TimestampNTZType, TimestampType | TimestampNTZType) =>
        Some(l.value.toString) // catalyst value is epoch micros
      case (DateType, DateType) => Some(l.value.toString) // epoch days
      case (c, v) if isPlainNumeric(c) && isPlainNumeric(v) =>
        v match {
          case BooleanType => Some(if (l.value == true) "1" else "0")
          // float literals must be WIDENED before stringification: zone
          // keys of float columns are the double-widened values
          // ("0.1".toDouble < widen(0.1f)), so the float's short decimal
          // form would compare against the wrong point and wrongly prune
          case FloatType => Some(l.value.asInstanceOf[Float].toDouble.toString)
          case _ => Some(l.value.toString)
        }
      case _ => None
    }
  }

  private final case class ZonePred(colName: String, hit: Column)

  /** One conjunct → a zone filter over `zoneMetaFor(colName)` rows. */
  private def zonePred(e: Expression, flat: StructType): Option[ZonePred] = {
    def mk(attr: Expression, l: Literal)(f: String => Column): Option[ZonePred] =
      for {
        n <- stripAttr(attr)
        field <- flat.fields.find(_.name == n)
        d <- domainValue(l, field.dataType)
      } yield ZonePred(n, f(d))
    e match {
      case EqualTo(a, l: Literal) => mk(a, l)(d => MetaIndex.intersectsExpr(d, d))
      case EqualTo(l: Literal, a) => mk(a, l)(d => MetaIndex.intersectsExpr(d, d))
      // null-safe equality with a non-null literal prunes like equality
      // (NULL rows cannot equal a value); a null literal is not
      // extractable (zones don't track null presence)
      case EqualNullSafe(a, l: Literal) => mk(a, l)(d => MetaIndex.intersectsExpr(d, d))
      case EqualNullSafe(l: Literal, a) => mk(a, l)(d => MetaIndex.intersectsExpr(d, d))
      case GreaterThan(a, l: Literal) => mk(a, l)(MetaIndex.intersectsLoExpr)
      case GreaterThanOrEqual(a, l: Literal) => mk(a, l)(MetaIndex.intersectsLoExpr)
      case LessThan(l: Literal, a) => mk(a, l)(MetaIndex.intersectsLoExpr)
      case LessThanOrEqual(l: Literal, a) => mk(a, l)(MetaIndex.intersectsLoExpr)
      case LessThan(a, l: Literal) => mk(a, l)(MetaIndex.intersectsHiExpr)
      case LessThanOrEqual(a, l: Literal) => mk(a, l)(MetaIndex.intersectsHiExpr)
      case GreaterThan(l: Literal, a) => mk(a, l)(MetaIndex.intersectsHiExpr)
      case GreaterThanOrEqual(l: Literal, a) => mk(a, l)(MetaIndex.intersectsHiExpr)
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val hits = vs.map(v => mk(a, v.asInstanceOf[Literal])(d => MetaIndex.intersectsExpr(d, d)))
        // every IN value must be extractable, else the list is only
        // partially covered and pruning on it would be unsound
        if (hits.forall(_.isDefined)) Some(ZonePred(hits.head.get.colName,
          hits.map(_.get.hit).reduce(_ || _)))
        else None
      case _ => None
    }
  }

  /** Chunk keys (shard, partId, chunkId) that may contain a row
    * matching `predicate` — metadata-only (zone leaves, no payloads).
    * None when nothing in the predicate is zone-extractable (caller
    * falls back to a full pass).
    */
  def candidateChunks(spark: SparkSession, storeDir: String,
                      schema: StructType, predicate: Column): Option[DataFrame] = {
    val flat = MetaIndex.flatOf(schema)
    val preds = conjuncts(resolve(spark, schema, predicate)).flatMap(zonePred(_, flat))
    if (preds.isEmpty) None
    else Some(preds.map(p =>
        MetaIndex.zoneMetaFor(spark, storeDir, p.colName)
          .filter(p.hit).select("shard", "partId", "chunkId"))
      .reduce((a, b) => a.join(b, Seq("shard", "partId", "chunkId"))))
  }

  /** Top-level column names the predicate references, iff ALL of them
    * are plain top-level fields of `schema` — the discovery pass then
    * decodes only those columns (v2 layout: sibling payloads never
    * read). None → decode the full schema.
    */
  def referencedColumns(spark: SparkSession, schema: StructType,
                        predicate: Column): Option[Seq[String]] = {
    val refs = resolve(spark, schema, predicate).references.toSeq.map(_.name).distinct
    val top = schema.fieldNames.toSet
    if (refs.nonEmpty && refs.forall(top.contains)) Some(refs) else None
  }

  /** Blocks that may contain a predicate-matching row: candidate chunks
    * when the predicate is zone-extractable (few → pushed chunk keys,
    * many → left-semi join, mirroring MetaIndex.readCandidates), the
    * whole store otherwise. `names` restricts the columns read.
    */
  def candidateBlocks(spark: SparkSession, storeDir: String, schema: StructType,
                      predicate: Column, names: Seq[String]): Dataset[EncodedBlock] =
    candidateChunks(spark, storeDir, schema, predicate) match {
      case None => StoreLayout.readBlocks(spark, storeDir, names)
      case Some(cand) =>
        val keys = cand.limit(MetaIndex.MAX_PUSHDOWN_KEYS + 1).collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
        if (keys.length <= MetaIndex.MAX_PUSHDOWN_KEYS)
          StoreLayout.readBlocksByKeys(spark, storeDir, keys.toSeq, names)
        else {
          val df = Snapshots.storeDf(spark, storeDir)
          val fields = Option(names).map(_.map(StoreLayout.fieldName))
            .getOrElse(StoreLayout.storeColFields(df.schema))
          StoreLayout.assemble(
            df.join(cand, Seq("shard", "partId", "chunkId"), "left_semi"), fields)
        }
    }
}
