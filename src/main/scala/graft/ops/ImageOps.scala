package graft.ops

import org.apache.spark.sql.DataFrame
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** One decoded-image feature row (q33). `mean_luma` is exact: the
  * synthetic images are uniform-gray, so the pixel sum divides evenly.
  */
final case class ImageFeat(doc_id: Long, media_type: String, width: Int,
    height: Int, n_px: Long, mean_luma: Long)

/** REAL multimodal decode (closes the round-2 sanctioned stub): images
  * ride as opaque `binary` payload columns and are decoded on executors
  * with the JDK's built-in PNG codec (`javax.imageio` — no external
  * jars). The pipeline shape is the 100 TB one: a narrow per-row
  * synthesize stage (stand-in for reading blob storage), then a
  * mapPartitions decode stage over the binary column — per-partition
  * batches, no driver traffic, no shuffle.
  *
  * The synthetic PNGs are deterministic functions of `doc_id`
  * (dimensions and fill gray derived arithmetically), so the DECODED
  * width/height/mean are DuckDB-checkable: the oracle predicts them from
  * the construction formula while Spark measures them from the decoded
  * raster — a true encode→decode round-trip check, not a formula echo.
  */
object ImageOps {

  /** width 2..17, height 2..9, uniform gray fill `doc_id % 256`. */
  def synthPng(docId: Long): Array[Byte] = {
    val w = (2 + (docId % 16)).toInt
    val h = (2 + ((docId / 16) % 8)).toInt
    val g = (docId % 256).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (g << 16) | (g << 8) | g
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** (doc_id, payload, media_type) — the opaque-binary carrier schema. */
  def synthesizePayloads(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id").as[Long]
      .map(id => (id, synthPng(id), "image/png"))
      .toDF("doc_id", "payload", "media_type")
  }

  /** Decode each payload and measure features from the raster. */
  def decodeFeatures(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          val w = img.getWidth
          val h = img.getHeight
          val raster = img.getRaster
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
            y += 1
          }
          val n = w.toLong * h
          ImageFeat(id, "image/png", w, h, n, sum / n)
        }
      }
      .toDF()
  }

  /** q33: synthesize → decode, one row per document. */
  def imageFeatures(docs: DataFrame): DataFrame =
    decodeFeatures(synthesizePayloads(docs))
}
