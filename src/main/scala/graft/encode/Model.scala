package graft.encode

/** The north-rule input shape (BASELINE.json input_hint): one row per
  * source file in the corpus Iceberg table.
  */
final case class CodeFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String
)

/** One encoded column chunk: self-describing payload + the metadata the
  * reference exposes per chunk via `iterchunks_info` (python-blosc2
  * `ndarray.py:4868-4927`: cratio, special, repeated_value) plus a
  * zone map (min/max) and a roundtrip digest.
  *
  * - `plan`    human-readable codec plan label (e.g. "fsst+zstd")
  * - `nBytes`  logical (uncompressed) size of the column slice
  * - `cBytes`  encoded payload size
  * - `minKey`/`maxKey` zone-map bounds (string form, truncated)
  * - `nNulls`  null count of the slice — COUNT(col) and the null group
  *             of a group-by are then pure metadata
  * - `sumKey`  exact sum of the non-null values in the zone domain
  *             ("" = undefined: float/double/binary columns, integral
  *             chunks whose running sum overflowed Long, or no non-null
  *             values) — serves exact SUM/AVG pushdown (MetaAgg)
  * - `hist`    value → count of the non-null values when the slice has
  *             ≤ HIST_MAX distinct in-zone-key-size values ("" keys are
  *             impossible: only non-null values enter); empty when the
  *             cardinality cap or key-size cap was exceeded. Alive iff
  *             sum(counts) == nRows − nNulls — a dead histogram can
  *             never masquerade as a valid one. Serves decode-free
  *             group-by counts on low-cardinality columns.
  * - `sha`     sha256 over the logical values of the slice — decode
  *             verification recomputes and compares (the bit-identity
  *             invariant, cf. reference tests/test_compress2.py:58-76)
  */
final case class EncodedCol(
    name: String,
    dt: String, // Spark catalogString of the original type
    plan: String,
    nBytes: Long,
    cBytes: Long,
    minKey: String,
    maxKey: String,
    nNulls: Int,
    sumKey: String,
    hist: Map[String, Long],
    sha: Array[Byte],
    payload: Array[Byte]
)

/** One encoded chunk of the table: all columns for the same row slice.
  * One Spark row per chunk — decode is a shuffle-free flatMap.
  */
final case class EncodedBlock(
    shard: Int, // lineage/resume unit (hash of row identity % nShards)
    partId: Int, // Spark partition that produced the block
    chunkId: Long, // index of the chunk within the partition
    nRows: Int,
    cols: Seq[EncodedCol]
) {
  def nBytes: Long = cols.map(_.nBytes).sum
  def cBytes: Long = cols.map(_.cBytes).sum
}

/** Result of re-decoding a block and checking each column's digest. */
final case class ChunkVerify(
    shard: Int,
    partId: Int,
    chunkId: Long,
    col: String,
    nRows: Int,
    ok: Boolean
)
