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
