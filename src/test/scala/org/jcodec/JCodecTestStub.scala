// TEST-SCOPE STUB of the JCodec 0.2.x API surface that
// graft.operators.JCodecDecoder binds via reflection. It exists so CI
// exercises the REAL binding chain — Class.forName lookups, name-based
// method resolution, the channel-wrap static, seek boxing, Picture→AWT
// crossing, ARGB→RGB repaint, ImageIO encode, blank-gate integration —
// without shipping the actual jars (this sandbox has no egress). The
// "container" is a trivial deterministic text format
// (`GRAFT-VID\n<durationSec>\n<label>`) and a "decoded frame" is a
// Graphics2D drawString of the label + timestamp; a deployment uses real
// JCodec, where JCodecDecoderSpec's same assertions hold against real
// MP4 seek-decode. NOT on the main classpath: production `available` is
// false unless a real JCodec jar is present.
package org.jcodec

package common {

  package io {
    class ByteBufferSeekableByteChannel(val buf: java.nio.ByteBuffer) {
      def close(): Unit = ()
    }
    object ByteBufferSeekableByteChannel {
      // Scala emits a static forwarder, matching the reflection lookup by name
      def readFromByteBuffer(buf: java.nio.ByteBuffer): ByteBufferSeekableByteChannel =
        new ByteBufferSeekableByteChannel(buf)
    }
  }

  class DemuxerTrackMeta(duration: Double) {
    def getTotalDuration: Double = duration
  }

  class SeekableDemuxerTrack(duration: Double) {
    def getMeta: DemuxerTrackMeta = new DemuxerTrackMeta(duration)
  }

  package model {
    import java.awt.image.BufferedImage
    class Picture(val img: BufferedImage)
  }
}

package api {

  import java.awt.image.BufferedImage
  import java.awt.{Color, Font}
  import java.nio.charset.StandardCharsets

  class FrameGrab private (duration: Double, label: String) {
    private var pendingTs: Double = 0.0

    def getVideoTrack: common.SeekableDemuxerTrack =
      new common.SeekableDemuxerTrack(duration)

    def seekToSecondPrecise(second: Double): FrameGrab = {
      if (second < 0 || second > duration)
        throw new java.io.IOException(s"seek $second outside [0, $duration]")
      pendingTs = second; this
    }

    def getNativeFrame: common.model.Picture = {
      // ARGB on purpose: the adapter must repaint to RGB before JPEG encode.
      // An empty label renders a solid-white frame -> blank-gated downstream.
      val img = new BufferedImage(320, 240, BufferedImage.TYPE_INT_ARGB)
      val g = img.createGraphics()
      try {
        g.setColor(Color.WHITE); g.fillRect(0, 0, 320, 240)
        if (label.nonEmpty) {
          g.setColor(Color.BLACK)
          g.setFont(new Font(Font.MONOSPACED, Font.BOLD, 24))
          g.drawString(f"$label @ $pendingTs%.1fs", 20, 120)
        }
      } finally g.dispose()
      new common.model.Picture(img)
    }
  }

  object FrameGrab {
    // test-only instrumentation: counts container opens so specs can assert
    // the per-document demux amortization (one open per doc, not per frame)
    val opens = new java.util.concurrent.atomic.AtomicInteger(0)

    def createFrameGrab(chan: common.io.ByteBufferSeekableByteChannel): FrameGrab = {
      opens.incrementAndGet()
      val bytes = new Array[Byte](chan.buf.remaining())
      chan.buf.duplicate().get(bytes)
      new String(bytes, StandardCharsets.UTF_8).split("\n", 3) match {
        case Array("GRAFT-VID", dur, label) => new FrameGrab(dur.toDouble, label)
        case _ => throw new java.io.IOException("not a GRAFT-VID container")
      }
    }
  }
}

package scale {
  object AWTUtil {
    def toBufferedImage(p: common.model.Picture): java.awt.image.BufferedImage = p.img
  }
}
