package graft.tools

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRecord
import org.apache.spark.sql.{Dataset, SparkSession}

/** Measured media-family slope row (round 18, r17 verdict item 5): the
  * m1/m2/m3 registry fixtures are deliberately constant-size across
  * scale factors (they attest CODEC+PAIRING semantics), so the "pixels
  * never shuffle — the exchange carries 20-byte band rows" scale claim
  * had spec-level evidence only. This main times `imageNearDupPairs`
  * over an N-image and a 10N-image seed-pinned corpus on the same
  * machine and prints both, giving SCALE.md a measured 10× ratio for
  * the m family: decode+hash is map-only (linear in images), the
  * banded exchange carries (band, value, hash, id) only, and planted
  * copies keep the verify stage non-vacuous at both scales.
  *
  * Corpus: n distinct splitmix64-noise PNGs (the MediaQueries fixture
  * generator shape, 32×24) + n/4 pixel-exact copies — executor-
  * generated, nothing collected. Output volume is ∝ planted copies
  * (linear), so the end-to-end ratio isolates the pipeline's own slope.
  *
  * Usage: runMain graft.tools.MediaScaleProbe [n] — times n and 10n.
  */
object MediaScaleProbe {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def corpus(s: SparkSession, n: Int): Dataset[MediaRecord] = {
    import s.implicits._
    val nCopies = n / 4
    val ids = (0L until n.toLong) ++
      (1000000L until (1000000L + nCopies))
    s.createDataset(ids).repartition(s.sparkContext.defaultParallelism)
      .map { id =>
        val base = if (id >= 1000000L) id - 1000000L else id
        val (w, h) = (32, 24)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y,
              (mix(base * 1000003L + y * 131L + x) & 0xffffff).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRecord(id, "image", bos.toByteArray, w, h, 0L)
      }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(k: Int): (Long, Double) = {
      val media = corpus(spark, k)
      // warm the executor codepaths once so the 1× row doesn't carry
      // JIT/classload cost the 10× row amortizes
      val t0 = System.nanoTime()
      val rows = Multimodal.imageNearDupPairs(media, maxBits = 3).count()
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    run(math.max(64, n / 10)) // warmup, discarded
    val (r1, s1) = run(n)
    val (r10, s10) = run(n * 10)
    println(f"MEDIASCALE n=$n pairs=$r1 sec=$s1%.2f | n=${n * 10} " +
      f"pairs=$r10 sec=$s10%.2f | ratio=${s10 / s1}%.2f " +
      f"(images 10.0x, planted copies 10.0x)")
    spark.stop()
  }
}
