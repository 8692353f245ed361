package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded video clip: raw per-frame LUMA planes (unsigned bytes,
  * row-major) plus geometry and frame rate. Luma stays in byte units —
  * lossless and half the memory of floats; feature math normalizes in
  * double where a [0,1] scale is wanted. Chroma planes are parsed and
  * validated (sizes must match the colorspace) but not retained:
  * every downstream operator (features, fingerprint, near-dup join)
  * consumes luma. */
final case class VideoDecoded(
    width: Int, height: Int, fpsNum: Int, fpsDen: Int,
    frames: Array[Array[Byte]])

final case class VideoFeatures(
    id: Long, width: Int, height: Int, n_frames: Int,
    duration_sec: Double, mean_luma: Double, motion: Double)

/** REAL video codec for YUV4MPEG2 (Y4M) — the uncompressed container
  * every video toolchain can emit (`ffmpeg -f yuv4mpeg2`), parseable
  * with zero dependencies, so the whole pipeline (decode → frame
  * features → temporal fingerprint → near-dup join) runs on actual
  * video bytes offline — the same zero-dep pattern as [[ImageIoCodec]]
  * (javax.imageio) and [[WavCodec]] (javax.sound). Compressed codecs
  * (H.264/VP9/AV1) stay behind the pluggable boundary: no JDK decode
  * path exists without external libraries.
  *
  * Format: an ASCII stream header `YUV4MPEG2 W<w> H<h> F<num>:<den>
  * [I? A?:? C<cs> X...]\n`, then per frame `FRAME[ params]\n` followed
  * by raw planar data — Y (w×h bytes) and, per colorspace, U and V
  * planes (quarter-size for 4:2:0, full-size for 4:4:4, absent for
  * mono). Supported colorspaces: C420 and its siting variants
  * (`C420jpeg`/`C420mpeg2`/`C420paldv` — identical plane layout),
  * C444, and Cmono. */
object Y4mCodec extends Serializable {

  private val Magic = "YUV4MPEG2"

  /** Bytes of `payload` from `from` up to the next '\n' as ASCII; the
    * returned offset is PAST the newline. */
  private def readLine(payload: Array[Byte], from: Int): (String, Int) = {
    var i = from
    while (i < payload.length && payload(i) != '\n') i += 1
    require(i < payload.length, "truncated Y4M: unterminated header line")
    (new String(payload, from, i - from, java.nio.charset.StandardCharsets.US_ASCII),
      i + 1)
  }

  def decode(payload: Array[Byte]): VideoDecoded = {
    val (header, afterHeader) = readLine(payload, 0)
    val tokens = header.split(' ').filter(_.nonEmpty)
    require(tokens.nonEmpty && tokens.head == Magic,
      "not a YUV4MPEG2 stream (bad magic)")
    var w = -1; var h = -1; var fn = -1; var fd = -1
    var cs = "420" // the spec's default colorspace is 4:2:0
    tokens.tail.foreach { t =>
      t.head match {
        case 'W' => w = t.tail.toInt
        case 'H' => h = t.tail.toInt
        case 'F' =>
          val Array(n, d) = t.tail.split(':')
          fn = n.toInt; fd = d.toInt
        case 'C' => cs = t.tail
        case _ => () // I (interlacing), A (aspect), X (extensions): ignored
      }
    }
    require(w > 0 && h > 0, s"Y4M header missing/invalid W/H: '$header'")
    // guard the plane-size arithmetic: absurd header dimensions must
    // fail loudly here, not overflow Int and silently mis-parse (a
    // 65536x65536 mono header would make w*h wrap to 0 and decode as
    // zero-byte frames with claimed giant geometry). Header-only
    // streams (zero frames) are legal — the per-frame length check
    // below guards actual data against the payload.
    require(w.toLong * h <= Int.MaxValue - 8,
      s"Y4M geometry ${w}x$h overflows a JVM array")
    require(fn > 0 && fd > 0, s"Y4M header missing/invalid frame rate: '$header'")
    val chromaSize = cs match {
      case "444" => w * h
      case "mono" => 0
      case c if c.startsWith("420") =>
        require(w % 2 == 0 && h % 2 == 0,
          s"4:2:0 needs even dimensions, got ${w}x$h")
        (w / 2) * (h / 2)
      case other =>
        throw new IllegalArgumentException(s"unsupported Y4M colorspace C$other")
    }
    val ySize = w * h
    val frames = Array.newBuilder[Array[Byte]]
    var off = afterHeader
    while (off < payload.length) {
      val (fh, afterFh) = readLine(payload, off)
      require(fh == "FRAME" || fh.startsWith("FRAME "),
        s"expected FRAME marker, got '${fh.take(20)}'")
      // long arithmetic: offset + plane sizes can exceed Int range
      require(afterFh.toLong + ySize.toLong + 2L * chromaSize <= payload.length,
        "truncated Y4M: frame data shorter than the declared geometry")
      frames += java.util.Arrays.copyOfRange(payload, afterFh, afterFh + ySize)
      off = afterFh + ySize + 2 * chromaSize
    }
    VideoDecoded(w, h, fn, fd, frames.result())
  }

  /** Encode luma planes as a spec-conformant C420 stream (neutral
    * chroma, 128) — the encode leg for deterministic fixture synthesis
    * and sinks, mirroring [[WavCodec.encode]]. */
  def encode(frames: Array[Array[Byte]], w: Int, h: Int,
      fpsNum: Int, fpsDen: Int): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, "C420 needs even dimensions")
    val ySize = w * h
    frames.foreach(f => require(f.length == ySize,
      s"luma plane size ${f.length} != ${w}x$h"))
    val chromaSize = (w / 2) * (h / 2)
    val header = s"$Magic W$w H$h F$fpsNum:$fpsDen Ip A1:1 C420jpeg\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val frameMark = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = java.nio.ByteBuffer.allocate(
      header.length + frames.length * (frameMark.length + ySize + 2 * chromaSize))
    out.put(header)
    val neutral = Array.fill(2 * chromaSize)(128.toByte)
    frames.foreach { f => out.put(frameMark); out.put(f); out.put(neutral) }
    out.array()
  }

  private def frameMean(plane: Array[Byte]): Double = {
    var acc = 0L
    var i = 0
    while (i < plane.length) { acc += plane(i) & 0xff; i += 1 }
    if (plane.length == 0) 0.0 else acc.toDouble / plane.length
  }

  /** 64-bit temporal fingerprint: 64 equal windows over the frame
    * sequence, bit i = window mean luma above the clip's mean — the
    * video analog of [[WavCodec.fingerprint]]'s energy envelope. The
    * RELATIVE threshold makes the print invariant to uniform
    * brightness/contrast scaling and to chroma-only edits (luma
    * envelope unchanged); a different cut produces a different
    * envelope. Same banded-hamming near-dup contract
    * ([[MediaOps.nearDupMedia]]). */
  def fingerprint(d: VideoDecoded): Long = {
    val n = d.frames.length
    if (n == 0) return 0L
    val means = d.frames.map(frameMean)
    val win = math.max(1, n / 64)
    val env = Array.tabulate(64) { i =>
      val from = math.min(n, i * win)
      val until = math.min(n, if (i == 63) n else (i + 1) * win)
      if (until <= from) 0.0
      else { var acc = 0.0; var j = from; while (j < until) { acc += means(j); j += 1 }
        acc / (until - from) }
    }
    val mean = env.sum / 64.0
    var hsh = 0L
    var i = 0
    while (i < 64) { if (env(i) > mean) hsh |= (1L << i); i += 1 }
    hsh
  }
}

/** Batch operators over opaque-binary VIDEO columns — the video leg of
  * the multimodal pipeline, same 100 TB shape notes as [[MediaOps]]:
  * `mapPartitions` with bounded batches, repartition by id before the
  * decode, narrow outputs so the heavy binary column drops early. */
object VideoOps {

  /** Decode → per-clip scalar features (the curation signals a video
    * training-data pipeline filters on: geometry, duration, brightness,
    * a motion proxy via mean inter-frame luma delta). */
  def videoFeatures(
      media: DataFrame,
      batchSize: Int = MediaOps.defaultBatchSize): Dataset[VideoFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload"))
      .repartition(spark.sparkContext.defaultParallelism, col("id"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) =>
            val d = Y4mCodec.decode(payload)
            val n = d.frames.length
            var sumMeans = 0.0
            var sumAbsDiff = 0.0
            var prev = 0.0
            var i = 0
            while (i < n) {
              var acc = 0L
              var j = 0
              val f = d.frames(i)
              while (j < f.length) { acc += f(j) & 0xff; j += 1 }
              val m = if (f.length == 0) 0.0 else acc.toDouble / f.length
              sumMeans += m
              if (i > 0) sumAbsDiff += math.abs(m - prev)
              prev = m
              i += 1
            }
            VideoFeatures(id, d.width, d.height, n,
              if (d.fpsNum > 0) n.toDouble * d.fpsDen / d.fpsNum else 0.0,
              if (n > 0) sumMeans / n / 255.0 else 0.0,
              if (n > 1) sumAbsDiff / (n - 1) / 255.0 else 0.0)
          }
        }
      }
  }

  /** (id, phash) temporal-envelope fingerprints — feed
    * [[MediaOps.nearDupMedia]] for banded near-dup pairs. */
  def videoHash(
      media: DataFrame,
      batchSize: Int = MediaOps.defaultBatchSize): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload"))
      .repartition(spark.sparkContext.defaultParallelism, col("id"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) =>
            (id, Y4mCodec.fingerprint(Y4mCodec.decode(payload)))
          }
        }
      }.toDF("id", "phash")
  }
}
