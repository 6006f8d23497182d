package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AudioCodec

/** RIFF/WAVE parse + windowed activity: header fields, chunk-order and
  * padding robustness, 8/16-bit paths, malformed-byte rejection. */
class AudioCodecSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def wav16(rate: Int, channels: Int, samples: Seq[Short],
                    extraChunkFirst: Boolean = false): Array[Byte] = {
    val dataLen = samples.length * 2
    val extra = if (extraChunkFirst) 8 + 4 else 0 // "LIST" chunk with 4 bytes
    val bb = ByteBuffer.allocate(44 + dataLen + extra).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952); bb.putInt(36 + dataLen + extra); bb.putInt(0x45564157)
    if (extraChunkFirst) { bb.putInt(0x5453494c); bb.putInt(4); bb.putInt(0) }
    bb.putInt(0x20746d66); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort)
    bb.putInt(rate); bb.putInt(rate * channels * 2)
    bb.putShort((channels * 2).toShort); bb.putShort(16)
    bb.putInt(0x61746164); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("parseWav reads rate/channels/bits/duration; tolerates leading chunks") {
    val w = wav16(8000, 2, Seq.fill(1600)(1000.toShort), extraChunkFirst = true)
    val info = AudioCodec.parseWav(w).get
    assert(info.sampleRate == 8000 && info.channels == 2 && info.bitsPerSample == 16)
    assert(info.nSamples == 800) // 1600 shorts / 2 channels
    assert(info.durationSec == 0.1)
  }

  test("parseWav rejects junk, truncated, and non-PCM bytes") {
    assert(AudioCodec.parseWav("nope".getBytes).isEmpty)
    assert(AudioCodec.parseWav(null).isEmpty)
    val good = wav16(8000, 1, Seq.fill(100)(5.toShort))
    assert(AudioCodec.parseWav(good.take(30)).isEmpty)
    // declare a float (fmt=3) encoding -> refused
    val f = good.clone(); f(20) = 3
    assert(AudioCodec.parseWav(f).isEmpty)
    // a data chunk whose declared length overruns the bytes -> refused
    val o = good.clone()
    ByteBuffer.wrap(o).order(ByteOrder.LITTLE_ENDIAN).putInt(40, 100000)
    assert(AudioCodec.parseWav(o).isEmpty)
  }

  test("activityWindows: exact integer means per window, silence flagged, junk dropped") {
    import spark.implicits._
    // doc 1: 2 windows at 4 samples/window -> means 100 and 0 (silent)
    val d1 = wav16(4, 1, Seq[Short](100, -100, 100, -100, 0, 0, 0, 0))
    // doc 2: stereo, one window, |200|+|50| avg = 125
    val d2 = wav16(4, 2, Seq[Short](200, 50, -200, -50, 200, 50, -200, -50))
    val df = Seq((1L, d1), (2L, d2), (3L, "junk".getBytes))
      .toDF("doc_id", "bytes")
    val got = AudioCodec.activityWindows(df, "doc_id", "bytes",
      windowSec = 1.0, silenceThreshold = 50L)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      (1L, 0L, 100L, false), (1L, 1L, 0L, true),
      (2L, 0L, 125L, false)))
  }

  test("clipLoudness: hand-computed RMS/peak/clip; silence gets NULL " +
    "gain; junk drops; parameter guard is loud") {
    import spark.implicits._
    // [1000,-1000,32767,0]: sum v^2 = 2e6 + 32767^2 = 1075676289, div 4 =
    // 268919072, rms = floor(sqrt) = 16398; 1 of 4 points clipped
    // (2500 bp >= 10)
    val rows = Seq(
      (1L, wav16(8000, 1, Seq[Short](1000, -1000, 32767, 0))),
      (2L, wav16(8000, 1, Seq[Short](0, 0, 0, 0))),
      (3L, "not-audio".getBytes("UTF-8"))
    ).toDF("id", "bytes")
    val out = graft.operators.AudioCodec
      .clipLoudness(rows, "id", "bytes", targetRms = 8000L)
      .as[(Long, Long, Long, Long, Long, Option[Long], String)]
      .collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L), "junk contributes no rows")
    assert(out(1L) == ((1L, 4L, 16398L, 32767L, 1L, Some(487L), "clipped")),
      "rms floor, peak, clip count, gain = 8000*1000 div 16398")
    assert(out(2L) == ((2L, 4L, 0L, 0L, 0L, None, "silent")),
      "zero RMS: silent, nothing to normalize")
    val e = intercept[IllegalArgumentException] {
      graft.operators.AudioCodec.clipLoudness(rows, "id", "bytes",
        maxGainMilli = 1L)
    }
    assert(e.getMessage.contains("maxGainMilli>=1000"))
  }

  test("audioNearDups: gain-invariant exact match, 1-window jitter within " +
    "Hamming, duration gate, envelope inversion rejected at verify, junk " +
    "dropped; hand-computed fingerprints") {
    import spark.implicits._
    // 17 windows of 4 samples each (68 samples); square wave +-A per
    // window so mean-abs == A exactly. Alternating envelope
    // [100,200,100,...] -> fp bits at even i -> 0x5555.
    def envWav(amps: Seq[Int], sPerWin: Int = 4): Array[Byte] =
      wav16(8000, 1, amps.zipWithIndex.flatMap { case (a, k) =>
        (0 until sPerWin).map { j =>
          val s = k * sPerWin + j
          (if ((s / 4) % 2 == 0) a else -a).toShort
        }
      })
    val alt = (0 until 17).map(k => if (k % 2 == 0) 100 else 200)
    val inv = alt.map(a => if (a == 100) 200 else 100)
    val jit = alt.updated(5, 90) // flips fp bits 4 and 5 -> Hamming 2
    val clips = Seq(
      (1L, envWav(alt)),
      (2L, envWav(alt.map(_ * 2))),       // gain x2: same ORDER, same fp
      (3L, envWav(jit)),
      (4L, envWav(alt, sPerWin = 8)),     // same fp, different duration
      (5L, "junk-bytes".getBytes("UTF-8")),
      (6L, envWav(inv))                   // fp 0xAAAA: candidate via the
                                          // zero upper blocks, Hamming 16
    ).toDF("clip_id", "bytes")
    val out = AudioCodec.audioNearDups(clips, "clip_id", "bytes",
        windows = 17, maxHamming = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"exactly the gain twin and the jitter pair match: ${out.keySet}")
    assert(out((1L, 2L)) == ((1L, 2L, 68L, 0L)),
      "gain preserves envelope ORDER -> identical fingerprint")
    assert(out((1L, 3L)) == ((1L, 3L, 68L, 2L)),
      s"one perturbed window flips exactly bits 4 and 5: ${out((1L, 3L))}")
    val e = intercept[IllegalArgumentException] {
      AudioCodec.audioNearDups(clips, "clip_id", "bytes", windows = 16)
    }
    assert(e.getMessage.contains("windows"))
    val e2 = intercept[IllegalArgumentException] {
      AudioCodec.audioNearDups(clips, "clip_id", "bytes", maxHamming = 4)
    }
    assert(e2.getMessage.contains("pigeonhole"))
  }
}
