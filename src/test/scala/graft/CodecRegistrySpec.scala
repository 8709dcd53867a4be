package graft

import graft.codecs._
import graft.core.Bytes
import org.scalatest.funsuite.AnyFunSuite

/** User-pluggable codec registration (the reference's register_codec /
  * register_filter extension point).
  */
class CodecRegistrySpec extends AnyFunSuite {

  /** Toy plugin: XOR every byte with 0x5A (a "filter" ahead of the
    * entropy stage — lossless, order-preserving for the test).
    */
  private object XorKernel extends CodecRegistry.BinKernel {
    val name = "xor5a"
    def encode(vec: BinVec, w: Bytes.Writer): Unit = {
      var i = 0
      while (i < vec.n) {
        val v = if (vec.values(i) == null) Array.emptyByteArray else vec.values(i)
        w.putVarInt(v.length)
        var j = 0
        while (j < v.length) { w.putByte((v(j) ^ 0x5a) & 0xff); j += 1 }
        i += 1
      }
    }
    def decode(r: Bytes.Reader, n: Int, validity: Array[Boolean]): Array[Array[Byte]] = {
      val out = new Array[Array[Byte]](n)
      var i = 0
      while (i < n) {
        val len = r.getVarInt()
        val v = new Array[Byte](len)
        var j = 0
        while (j < len) { v(j) = (r.getByte() ^ 0x5a).toByte; j += 1 }
        out(i) = v
        i += 1
      }
      out
    }
  }

  private val ID: Byte = 40

  test("registered plugin roundtrips through ChunkCodec with entropy on top") {
    CodecRegistry.registerBin(ID, XorKernel)
    val vec = BinVec(Array.tabulate(500)(i => s"value-$i-${"x" * (i % 30)}".getBytes("UTF-8")))
    for (plan <- XorKernel.plans(ID)) {
      val block = ChunkCodec.encode(vec, plan)
      val back = ChunkCodec.decode(block).asInstanceOf[BinVec]
      assert(back.n == vec.n)
      (0 until vec.n).foreach(i => assert(java.util.Arrays.equals(back.values(i), vec.values(i))))
    }
    assert(Method.name(ID) == "xor5a")
  }

  test("selector offers registered plans alongside built-ins") {
    CodecRegistry.registerBin(ID, XorKernel)
    val vec = BinVec(Array.tabulate(300)(i => s"doc $i contents with words $i".getBytes("UTF-8")))
    val cands = graft.encode.Selector.candidatesFor(vec)
    assert(cands.exists(_.method == ID), s"plugin plans missing from $cands")
    // and the chosen plan (whatever wins the cost model) still roundtrips
    val plan = graft.encode.Selector.choose(vec)
    val back = ChunkCodec.decode(ChunkCodec.encode(vec, plan)).asInstanceOf[BinVec]
    (0 until vec.n).foreach(i => assert(java.util.Arrays.equals(back.values(i), vec.values(i))))
  }

  test("plugin id range is enforced and unregistered decode fails loudly") {
    intercept[IllegalArgumentException] {
      CodecRegistry.registerBin(10, XorKernel) // built-in range
    }
    val err = intercept[IllegalArgumentException] {
      CodecRegistry.binKernelOrThrow(55)
    }
    assert(err.getMessage.contains("no codec is registered"))
  }

  test("registerFilter wraps a plain byte transform incl. null and empty cells") {
    val FID: Byte = 41
    // rot13-ish reversible transform: add 13 mod 256 per byte
    CodecRegistry.registerFilter(FID, "add13",
      forward = v => v.map(b => ((b + 13) & 0xff).toByte),
      inverse = v => v.map(b => ((b - 13) & 0xff).toByte))
    val vec = BinVec(
      Array[Array[Byte]]("alpha".getBytes, null, Array.emptyByteArray, "omega-9".getBytes),
      Array(true, false, true, true))
    for (plan <- CodecRegistry.binKernelOrThrow(FID).plans(FID)) {
      val back = ChunkCodec.decode(ChunkCodec.encode(vec, plan)).asInstanceOf[BinVec]
      assert(back.n == 4)
      assert(java.util.Arrays.equals(back.values(0), "alpha".getBytes))
      assert(!back.isValid(1), "null cell must survive the filter")
      assert(back.values(2).length == 0, "empty cell must stay empty, not become null")
      assert(java.util.Arrays.equals(back.values(3), "omega-9".getBytes))
    }
  }
}

