package graft.multimodal

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded audio clip: mono-mixed PCM samples in [-1, 1]. */
final case class AudioDecoded(sampleRate: Float, channels: Int, samples: Array[Float])

final case class AudioFeatures(
    id: Long, sample_rate: Double, channels: Int, duration_sec: Double,
    rms: Double, zero_cross_rate: Double)

/** REAL audio codec over the JDK's own `javax.sound.sampled` — no
  * external libraries, works offline: WAV/AIFF/AU decode on every
  * standard JRE (the same zero-dependency pattern as [[ImageIoCodec]];
  * compressed containers like MP3/OGG stay behind the pluggable
  * boundary). Whatever the source encoding (8/16/24-bit PCM, mono or
  * multi-channel), samples convert to 16-bit signed PCM and mix down
  * to mono floats in [-1, 1] — the one contract every downstream
  * operator (features, fingerprint, near-dup join) consumes. */
object WavCodec extends Serializable {
  def decode(payload: Array[Byte]): AudioDecoded = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    try {
      val fmt = in.getFormat
      val target = new AudioFormat(
        AudioFormat.Encoding.PCM_SIGNED, fmt.getSampleRate, 16,
        fmt.getChannels, fmt.getChannels * 2, fmt.getSampleRate,
        /* bigEndian = */ false)
      val pcm = AudioSystem.getAudioInputStream(target, in)
      try {
        val bytes = pcm.readAllBytes()
        val ch = fmt.getChannels.max(1)
        val frames = bytes.length / (2 * ch)
        val mono = new Array[Float](frames)
        var f = 0
        while (f < frames) {
          var acc = 0f
          var c = 0
          while (c < ch) {
            val o = (f * ch + c) * 2
            val s = ((bytes(o + 1) << 8) | (bytes(o) & 0xff)).toShort
            acc += s / 32768f
            c += 1
          }
          mono(f) = acc / ch
          f += 1
        }
        AudioDecoded(fmt.getSampleRate, ch, mono)
      } finally pcm.close()
    } finally in.close()
  }

  /** Encode 16-bit PCM mono samples as a real RIFF/WAVE container via
    * the JDK's own writer — the encode leg of the audio pipeline
    * (deterministic payload synthesis for fixtures, re-encode for
    * sinks). `channels` duplicates the mono signal into an interleaved
    * multi-channel layout. */
  def encode(samples: Array[Short], sampleRate: Float, channels: Int = 1): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioInputStream}
    val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
    val data = new Array[Byte](samples.length * 2 * channels)
    var i = 0
    while (i < samples.length) {
      val v = samples(i)
      var c = 0
      while (c < channels) {
        val o = (i * channels + c) * 2
        data(o) = (v & 0xff).toByte
        data(o + 1) = ((v >> 8) & 0xff).toByte
        c += 1
      }
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** 64-bit audio fingerprint: 64 equal time windows, bit i = window
    * RMS above the clip's mean window RMS. The threshold is RELATIVE,
    * so the print is invariant to uniform volume change and to lossless
    * re-encodes (re-sampled channel layouts mix down to the same
    * envelope); a different signal produces a different energy
    * envelope. Same banded-hamming near-dup contract as the image
    * perceptual hash ([[MediaOps.nearDupMedia]]). */
  def fingerprint(d: AudioDecoded): Long = {
    val n = d.samples.length
    if (n == 0) return 0L
    val win = math.max(1, n / 64)
    val rms = Array.tabulate(64) { i =>
      val from = math.min(n, i * win)
      val until = math.min(n, if (i == 63) n else (i + 1) * win)
      if (until <= from) 0.0
      else {
        var acc = 0.0
        var j = from
        while (j < until) { val s = d.samples(j); acc += s * s; j += 1 }
        math.sqrt(acc / (until - from))
      }
    }
    val mean = rms.sum / 64.0
    var h = 0L
    var i = 0
    while (i < 64) { if (rms(i) > mean) h |= (1L << i); i += 1 }
    h
  }
}

/** Batch operators over opaque-binary AUDIO columns — the audio leg of
  * the multimodal pipeline, same 100 TB shape notes as [[MediaOps]]:
  * `mapPartitions` with bounded batches, repartition by id before the
  * decode, narrow outputs so the heavy binary column drops early. */
object AudioOps {

  /** Decode → per-clip scalar features (the curation signals an audio
    * training-data pipeline filters on: duration, loudness, voicedness
    * proxy via zero-crossing rate). */
  def audioFeatures(
      media: DataFrame,
      batchSize: Int = MediaOps.defaultBatchSize): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload"))
      .repartition(spark.sparkContext.defaultParallelism, col("id"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) =>
            val d = WavCodec.decode(payload)
            val n = d.samples.length
            var sq = 0.0
            var zc = 0
            var i = 0
            while (i < n) {
              val s = d.samples(i)
              sq += s * s
              if (i > 0 && (s >= 0) != (d.samples(i - 1) >= 0)) zc += 1
              i += 1
            }
            AudioFeatures(id, d.sampleRate.toDouble, d.channels,
              if (d.sampleRate > 0) n / d.sampleRate.toDouble else 0.0,
              if (n > 0) math.sqrt(sq / n) else 0.0,
              if (n > 1) zc.toDouble / (n - 1) else 0.0)
          }
        }
      }
  }

  /** (id, phash) energy-envelope fingerprints — feed
    * [[MediaOps.nearDupMedia]] for banded near-dup pairs. */
  def audioHash(
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
            (id, WavCodec.fingerprint(WavCodec.decode(payload)))
          }
        }
      }.toDF("id", "phash")
  }
}
