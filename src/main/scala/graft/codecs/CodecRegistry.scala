package graft.codecs

import graft.core.Bytes

/** User-pluggable codec registry — the analog of the reference's
  * `register_codec` / `register_filter` user extension points
  * (python-blosc2 __init__.py: user-defined codec/filter ids live in a
  * reserved id range; the library dispatches to registered callables).
  *
  * Method ids [32, 63] are reserved for plugins. A registered kernel is
  * a full encode/decode pair over a binary column chunk — it plays both
  * the "filter" role (a transform ahead of the entropy stage, which
  * ChunkCodec still applies on top) and the "codec" role (the entropy
  * stage can be NONE in the plan). The Selector offers a plugin's plans
  * whenever its `offer` predicate accepts the chunk, competing in the
  * same trial-encode cost model as built-ins.
  *
  * Registration must happen before encode on every JVM (executors
  * included) — register from a static initializer or broadcast-safe
  * object, exactly like the reference requires import-time
  * registration. Decode of a block referencing an unregistered id
  * fails loudly with the id.
  */
object CodecRegistry {

  val USER_ID_MIN: Byte = 32
  val USER_ID_MAX: Byte = 63

  trait BinKernel extends Serializable {
    def name: String
    def encode(vec: BinVec, w: Bytes.Writer): Unit
    def decode(r: Bytes.Reader, n: Int, validity: Array[Boolean]): Array[Array[Byte]]
    /** Should the Selector offer this kernel for the chunk? */
    def offer(vec: BinVec): Boolean = true
    /** Plans to trial when offered (entropy stage on top is allowed). */
    def plans(id: Byte): Seq[Plan] = Seq(Plan(id, Entropy.NONE), Plan(id, Entropy.ZSTD, 3))
    /** Cost-model CPU price, ns per input byte (see Selector.nsPerByte). */
    def nsPerByte: Double = 8.0
  }

  private val bin = new java.util.concurrent.ConcurrentHashMap[Byte, BinKernel]()

  def registerBin(id: Byte, kernel: BinKernel): Unit = {
    require(id >= USER_ID_MIN && id <= USER_ID_MAX, s"plugin ids are [$USER_ID_MIN, $USER_ID_MAX], got $id")
    bin.put(id, kernel)
    ()
  }

  def binKernel(id: Byte): Option[BinKernel] = Option(bin.get(id))

  def binKernelOrThrow(id: Byte): BinKernel =
    binKernel(id).getOrElse(throw new IllegalArgumentException(
      s"method id $id is in the plugin range but no codec is registered " +
        s"(register via CodecRegistry.registerBin on every JVM before decode)"))

  /** All (id, kernel) pairs whose offer() accepts this chunk. */
  def offeredBin(vec: BinVec): Seq[(Byte, BinKernel)] = {
    val out = Seq.newBuilder[(Byte, BinKernel)]
    bin.forEach { (id, k) => if (k.offer(vec)) out += ((id, k)) }
    out.result()
  }

  def isPluginId(id: Byte): Boolean = id >= USER_ID_MIN && id <= USER_ID_MAX

  /** `register_filter`-style convenience (python-blosc2's filter
    * callables are plain per-block byte transforms): wrap a forward /
    * inverse VALUE transform as a full plugin kernel. The transform
    * runs per cell ahead of the entropy stage (the reference's
    * prefilter position); decode applies the inverse after it (the
    * postfilter position). The wrapped kernel competes in the
    * Selector's cost model like any plugin.
    *
    * `forward` MUST be total over arbitrary byte arrays (the Selector
    * validates plans only on a SAMPLE — a transform that throws on
    * full-chunk values it never sampled fails the encode job). Gate
    * domain-specific transforms with `offerIf` instead of relying on
    * forward to reject.
    */
  def registerFilter(id: Byte, filterName: String,
                     forward: Array[Byte] => Array[Byte],
                     inverse: Array[Byte] => Array[Byte],
                     offerIf: BinVec => Boolean = _ => true,
                     costNsPerByte: Double = 8.0): Unit =
    registerBin(id, new BinKernel {
      def name: String = filterName
      def encode(vec: BinVec, w: Bytes.Writer): Unit = {
        var i = 0
        while (i < vec.n) {
          val v = vec.values(i)
          if (v == null) w.putVarInt(0)
          else {
            val t = forward(v)
            w.putVarInt(t.length + 1)
            w.putBytes(t)
          }
          i += 1
        }
      }
      def decode(r: Bytes.Reader, n: Int, validity: Array[Boolean]): Array[Array[Byte]] = {
        val out = new Array[Array[Byte]](n)
        var i = 0
        while (i < n) {
          val len = r.getVarInt()
          if (len > 0) out(i) = inverse(r.getBytes(len - 1))
          i += 1
        }
        out
      }
      override def offer(vec: BinVec): Boolean = offerIf(vec)
      override def nsPerByte: Double = costNsPerByte
    })
}
