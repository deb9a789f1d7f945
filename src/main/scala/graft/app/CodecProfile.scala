package graft.app

import graft.{AudioQueries, ImageQueries, VideoQueries}
import graft.multimodal.{GifCodec, JpegCodec, Mp4Codec, PixelCodec, WavCodec}

/** Single-threaded microbenchmark of the per-document codec kernels that
  * dominate the media-tier bench queries (opt guide §1: measure first,
  * §1.2 step 2: per-task work). Times fixture ENCODE and production
  * DECODE separately so optimization effort lands on the right side.
  * Usage: runMain graft.app.CodecProfile [nDocs]
  */
object CodecProfile {
  private def time[A](name: String, n: Int)(f: Long => A): Unit = {
    // one warm pass for JIT, one timed pass
    var id = 0L
    while (id < math.min(n, 200)) { f(id); id += 1 }
    val t0 = System.nanoTime()
    id = 0
    while (id < n) { f(id); id += 1 }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"$name%-28s ${dt * 1000 / n}%8.3f ms/doc  (${dt}%6.2f s / $n)")
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val jpg = ImageQueries.plantedJpeg(7)
    val pjpg = ImageQueries.plantedJpegProgressive(7)
    val png = ImageQueries.plantedPng(7)
    val gif = ImageQueries.plantedGif(7)

    time("jpeg encode", n)(ImageQueries.plantedJpeg)
    time("jpeg decode", n)(_ => JpegCodec.decodeJpeg(jpg).get)
    time("jpeg prog encode", n)(ImageQueries.plantedJpegProgressive)
    time("jpeg prog decode", n)(_ => JpegCodec.decodeJpegProgressive(pjpg).get)
    time("png encode", n)(ImageQueries.plantedPng)
    time("png decode", n)(_ => PixelCodec.decodePng(png).get)
    time("gif encode", n)(ImageQueries.plantedGif)
    time("gif decode", n)(_ => GifCodec.decodeGif(gif).get)
    val dec = JpegCodec.decodeJpeg(jpg).get
    time("luma+resize+dhash", n) { _ =>
      val luma = PixelCodec.luminance(dec.pixels, dec.channels)
      val grid = PixelCodec.resizeArea(luma, dec.width, dec.height, 9, 8)
      PixelCodec.dhashBands(grid)
    }
    time("wav encode", n)(AudioQueries.plantedWav)
    val wav = AudioQueries.plantedWav(7)
    time("wav decode", n)(_ => WavCodec.decodeWav(wav).get)
    time("wav mixed encode", n)(AudioQueries.plantedWavMixedFormat)
    time("mp4 encode", n)(VideoQueries.plantedMp4)
    val mp4 = VideoQueries.plantedMp4(7)
    time("mp4 decode", n)(_ => Mp4Codec.decodeMp4(mp4).get)
    time("mp4 content encode", n)(VideoQueries.plantedContentMp4)
    time("mp4 scenes encode", n)(VideoQueries.plantedScenesMp4)
  }
}
