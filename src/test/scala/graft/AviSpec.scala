package graft

import graft.ops.{Avi, Jpeg}

/** MJPEG-in-AVI container decode: RIFF walk + per-frame [[Jpeg]]. The
  * frame payloads come from the JDK's own JPEG encoder; the container
  * writer is [[Avi.encode]] (a fixture/export helper the decoder never
  * calls), so the decode path under test is container parse → frame
  * chunk discovery → keyframe pixel decode.
  */
class AviSpec extends SparkTestBase {

  import MediaFixtures.{grayJpeg => jpegFrame}

  test("MJPEG AVI roundtrips: frame count exact, keyframe pixels match direct JPEG decode") {
    val w = 24; val h = 16
    val frames = (0 until 3).map(f => jpegFrame(w, h, 1.0f)((x, y) => ((x / 8) * 37 + (y / 8) * 11 + f * 53) % 256))
    val avi = Avi.encode(frames, w, h)
    val v = Avi.decode(avi).getOrElse(fail("mjpeg avi did not parse"))
    assert(v.frameCount == 3 && v.width == w && v.height == h)
    val direct = Jpeg.decode(frames.head).getOrElse(fail("frame 0 direct decode"))
    assert(java.util.Arrays.equals(v.first.pixels, direct.pixels),
      "container-extracted keyframe must decode byte-identically to the raw JPEG")
    // constant-tile quality-1.0 regime: frame 0 pixels are formula-exact
    for (y <- 0 until h; x <- 0 until w)
      assert((v.first.pixels(y * w + x) & 0xff) == ((x / 8) * 37 + (y / 8) * 11) % 256)
  }

  test("fail-soft: dirty bytes, truncation, frameless AVI, non-JPEG frames return None") {
    assert(Avi.decode(null).isEmpty)
    assert(Avi.decode(Array[Byte](1, 2, 3)).isEmpty)
    val noise = Array.tabulate[Byte](300)(i => (i * 31 + 7).toByte)
    noise(0) = 'R'; noise(1) = 'I'; noise(2) = 'F'; noise(3) = 'F'
    noise(8) = 'A'; noise(9) = 'V'; noise(10) = 'I'; noise(11) = ' '
    assert(Avi.decode(noise).isEmpty, "RIFF magic + noise must fail soft")
    val ok = Avi.encode(Seq(jpegFrame(16, 16, 0.9f)((x, y) => (x + y) % 256)), 16, 16)
    assert(Avi.decode(ok).isDefined)
    assert(Avi.decode(java.util.Arrays.copyOf(ok, ok.length / 3)).isEmpty)
    // frames that are not JPEGs (e.g. raw '00db' DIB frames) → no
    // decodable keyframe → None, not garbage
    val raw = Avi.encode(Seq(Array.fill[Byte](64)(0x42)), 8, 8)
    assert(Avi.decode(raw).isEmpty)
  }

  test("featurize routes avi items: dims + frame count + keyframe grid-luma") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val good = Avi.encode((0 until 2).map(f =>
      jpegFrame(16, 8, 1.0f)((x, y) => (x * 3 + y * 5 + f * 11) % 256)), 16, 8)
    val junk = Array[Byte]('R', 'I', 'F', 'F', 0, 0, 0, 0, 'A', 'V', 'I', ' ', 9, 9, 9)
    val df = Seq((0L, good), (1L, junk)).toDF("media_id", "media")
    val feats = graft.ops.MultiModal.featurize(df, "media_id", "media").orderBy("id")
    val rows = feats.select("mediaType", "imgWidth", "imgHeight", "videoFrames").collect()
    assert(rows(0).getString(0) == "avi" && rows(0).getInt(1) == 16 &&
      rows(0).getInt(2) == 8 && rows(0).getInt(3) == 2)
    assert(rows(1).getString(0) == "avi" && rows(1).isNullAt(1) && rows(1).isNullAt(3),
      "undecodable avi keeps sniffed type but null decode fields")
    val emb = feats.where(col("id") === 0L).select("embedding").head().getSeq[Float](0)
    assert(emb.length == 16 && emb.forall(v => v >= 0f && v <= 1f))
  }
}
