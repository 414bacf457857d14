package graft.operators

import java.io.ByteArrayInputStream

import org.scalatest.funsuite.AnyFunSuite

import Multimodal.MediaAsset

/** Direct unit contracts for the media codec helpers the query-level
  * tests (`media_features`/`media_resize`/`media_frames` in OperatorSpec)
  * exercise only through the pipeline: decode determinism, resize-box
  * math, container demux fidelity, and the malformed zero-frame payload
  * posture (ADVICE r6: resize/frames must guard the empty container the
  * same way decode() does). */
class MultimodalSpec extends AnyFunSuite {

  test("synthesized WAV decodes to the contracted sample count, deterministically") {
    val a = Multimodal.synthesizeAsset(1L) // docId % 3 == 1 → audio
    assert(a.media_type == "audio")
    val s1 = Multimodal.decodeWav(a.content)
    val s2 = Multimodal.decodeWav(Multimodal.synthesizeAsset(1L).content)
    assert(s1.length == 257, s"expected 256 + (1 % 256) samples, got ${s1.length}")
    assert(s1.sameElements(s2), "WAV synthesis/decode is not deterministic")
  }

  test("header-parse dimsOnly agrees with the raster-level decode for every media type") {
    // the media_resize frozen artifact is produced by dimsOnly (IHDR/WAV-
    // header parse, no rasterization); its values must be IDENTICAL to
    // what full decode() reports or the driver hash gate would drift
    (0L until 12L).foreach { id =>
      val a = Multimodal.synthesizeAsset(id)
      val f = Multimodal.decode(a)
      val (aid, mt, w, h, nf) = Multimodal.dimsOnly(a)
      assert(aid == f.asset_id && mt == f.media_type, s"id $id identity")
      assert(w == f.width && h == f.height, s"id $id dims: header ($w,$h) vs raster (${f.width},${f.height})")
      assert(nf == f.n_frames_sampled, s"id $id frames: header $nf vs raster ${f.n_frames_sampled}")
    }
  }

  test("image resize fits the box, keeps aspect, and reports re-decoded dims") {
    val a = Multimodal.synthesizeAsset(24L) // image, bigger than the 320×240 box
    assert(a.media_type == "image" && (a.width > 320 || a.height > 240))
    val r = Multimodal.resizeAsset(a, 320, 240)
    assert(r.width <= 320 && r.height <= 240 && r.width > 0 && r.height > 0)
    // one scale factor on both axes: aspect preserved up to integer floor
    val s = math.min(320.0 / a.width, 240.0 / a.height)
    assert(r.width == math.max(1, (a.width * s).toInt))
    assert(r.height == math.max(1, (a.height * s).toInt))
    // the payload really is the resized image, and checksums are stable
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(r.content))
    assert(img.getWidth == r.width && img.getHeight == r.height)
    assert(Multimodal.rasterChecksum(img) ==
      Multimodal.rasterChecksum(javax.imageio.ImageIO.read(new ByteArrayInputStream(r.content))))
    // decode()'s checksum hashes the same decoded raster
    assert(Multimodal.decode(r).checksum == Multimodal.rasterChecksum(img))
  }

  test("video container demux round-trips the synthesized frame table") {
    val v = Multimodal.synthesizeAsset(2L) // docId % 3 == 2 → video
    assert(v.media_type == "video")
    val frames = Multimodal.videoFrames(v.content)
    assert(frames.length == v.n_frames)
    assert(frames.length == 1 + (2 % 5).toInt)
    val rows = Multimodal.frameRows(v, 2)
    assert(rows.map(_.frame_idx) == rows.map(_.frame_idx).sorted)
    assert(rows.forall(_.asset_id == v.asset_id))
  }

  test("corrupted video length prefixes stop the demux at the last whole frame") {
    val v = Multimodal.synthesizeAsset(5L) // video
    val good = Multimodal.videoFrames(v.content)
    // truncate mid-frame: the partial trailing frame must be dropped,
    // every complete frame before it kept
    val cut = v.content.take(v.content.length - good.last.length / 2)
    val truncated = Multimodal.videoFrames(cut)
    assert(truncated.length == good.length - 1)
    truncated.zip(good).foreach { case (t, g) => assert(t.sameElements(g)) }
    // a negative length prefix (flipped sign bit) must not allocate
    val bad = v.content.clone()
    bad(0) = (bad(0) | 0x80).toByte
    assert(Multimodal.videoFrames(bad).isEmpty)
  }

  test("zero-frame video containers pass through resize and yield no frame rows") {
    // ADVICE r6: decode() guards the empty container with headOption;
    // resizeAsset/frameRows previously threw on frames.head
    val z = MediaAsset(99L, "video", Array.emptyByteArray, 0, 0, 0)
    val r = Multimodal.resizeAsset(z, 320, 240)
    assert(r.asset_id == 99L && r.width == 0 && r.height == 0)
    assert(Multimodal.frameRows(z, 3).isEmpty)
    assert(Multimodal.decode(z).n_frames_sampled == 0)
  }
}
