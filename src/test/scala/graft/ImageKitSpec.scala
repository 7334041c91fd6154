package graft

import graft.images.ImageKit
import org.scalatest.funsuite.AnyFunSuite

class ImageKitSpec extends AnyFunSuite {

  private val ids = (0 until 40).map(i => f"img-$i%08d")

  test("generation is deterministic") {
    ids.foreach { id =>
      val (b1, w1, h1, f1) = ImageKit.generate(id)
      val (b2, w2, h2, f2) = ImageKit.generate(id)
      assert(java.util.Arrays.equals(b1, b2) && w1 == w2 && h1 == h2 && f1 == f2)
    }
  }

  test("dims within [8,64]; both png and jpeg occur") {
    val fmts = ids.map { id =>
      val (w, h) = ImageKit.dims(id)
      assert(w >= 8 && w <= 64 && h >= 8 && h <= 64)
      ImageKit.fmt(id)
    }
    assert(fmts.contains("png") && fmts.contains("jpeg"))
  }

  test("png roundtrip is lossless; jpeg roundtrip PSNR >= 40 dB") {
    ids.foreach { id =>
      val (w, h) = ImageKit.dims(id)
      val src = ImageKit.pixels(id, w, h)
      val f = ImageKit.fmt(id)
      val decoded = ImageKit.decode(ImageKit.encode(src, w, h, f))
      assert(decoded.w == w && decoded.h == h)
      val p = ImageKit.psnr(src, decoded.rgb)
      if (f == "png") assert(p == 999.0, s"png not lossless for $id (psnr=$p)")
      else assert(p >= 40.0, s"jpeg psnr $p < 40 for $id")
    }
  }

  test("phash is stable under jpeg re-encode and separates distinct images") {
    val id = ids.find(ImageKit.fmt(_) == "jpeg").get
    val (bytes, w, h, _) = ImageKit.generate(id)
    val d = ImageKit.decode(bytes)
    // re-encode the decoded pixels: hash must survive the lossy trip
    val reenc = ImageKit.encode(d.rgb, w, h, "jpeg")
    val h1 = ImageKit.phash(bytes)
    val h2 = ImageKit.phash(reenc)
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 4, "phash unstable under re-encode")
    // distinct ids should rarely collide exactly; check a handful differ
    val hashes = ids.take(10).map(i => ImageKit.phash(ImageKit.generate(i)._1))
    assert(hashes.distinct.size >= 8, s"phash collapsing: $hashes")
  }
}
