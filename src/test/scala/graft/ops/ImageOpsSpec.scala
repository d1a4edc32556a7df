package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

class ImageOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("synth→decode round-trip measures constructed dims and fill") {
    // ids chosen to cover gray wrap (>255), both dim cycles, and zero
    val ids = Seq(0L, 7L, 16L, 127L, 300L, 4095L)
    val docs = ids.map(i => (i, s"doc $i", "en", "s0", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = ImageOps.imageFeatures(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5))))
      .toMap
    ids.foreach { id =>
      val (w, h) = ((2 + id % 16).toInt, (2 + (id / 16) % 8).toInt)
      assert(out(id) == ((w, h, w.toLong * h, id % 256)),
        s"decoded features for doc $id")
    }
  }

  test("decoder reads pixels, not metadata: non-uniform image mean") {
    // 2×1 image: one black, one white pixel → integer mean 127. A
    // decoder that echoed header metadata could never produce this.
    val img = new BufferedImage(2, 1, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000)
    img.setRGB(1, 0, 0xffffff)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val payloads = Seq((99L, bos.toByteArray)).toDF("doc_id", "payload")
    val row = ImageOps.decodeFeatures(payloads).collect().head
    assert(row.getInt(2) == 2 && row.getInt(3) == 1)
    assert(row.getLong(5) == 127L, "mean from actual raster samples")
  }
}
