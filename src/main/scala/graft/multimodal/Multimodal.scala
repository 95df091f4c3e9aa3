package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2 #51): image/audio/video as
  * opaque binary columns with typed metadata, processed per-partition.
  *
  * The Spark-side design: stable schema, per-partition batch
  * processing (`mapPartitions` over Rows — the Scala analogue of a
  * Pandas-UDF batch), partitioning preserved, deterministic outputs.
  * IMAGE payloads decode for real via javax.imageio (PNG/BMP/GIF/JPEG
  * ship with the JDK): features are a luminance histogram over decoded
  * pixels and `resizeImages` transcodes the payload. AUDIO payloads
  * decode for real via javax.sound.sampled (WAV/AIFF/AU PCM ship with
  * the JDK): features are RMS + zero-crossing rate + an RMS envelope.
  * VIDEO frame-sampling decodes real frames for animated GIF (the one
  * multi-frame container the JDK ships a codec for), with per-frame
  * GraphicControlExtension timing and canvas compositing. Payloads no
  * installed reader recognizes (real video codecs, compressed audio —
  * absent from this container) fall back to the clearly-marked
  * deterministic stub / metadata-only path, so the pipeline shape is
  * identical either way.
  */
object Multimodal {

  /** Canonical multimodal schema: id + modality + opaque payload +
    * typed metadata. */
  val schema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Deterministic fake "decode" of a payload into `dim` features —
    * STUB used only when no installed ImageIO reader recognizes the
    * bytes (e.g. audio/video codecs absent from this container).
    * Deterministic: features depend only on the bytes. */
  private[multimodal] def decodeStub(content: Array[Byte], dim: Int): Array[Double] = {
    var h = 1125899906842597L
    content.foreach(b => h = 31 * h + b)
    Array.tabulate(dim) { i =>
      val x = h ^ (i.toLong * 0x9E3779B97F4A7C15L)
      val m = (x ^ (x >>> 33)) * 0xFF51AFD7ED558CCDL
      ((m >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
  }

  /** Real image decode — javax.imageio ships PNG/BMP/GIF/JPEG readers
    * with the JDK; format detection is magic-number-based. Returns null
    * when no reader recognizes the bytes. */
  private[multimodal] def decodeImage(content: Array[Byte]): java.awt.image.BufferedImage =
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    catch { case _: Exception => null }

  /** Real audio decode — javax.sound.sampled ships WAV/AIFF/AU PCM
    * readers with the JDK (same no-new-dependency argument that got
    * image decode done). Channels mono-mix; 8/16-bit signed/unsigned
    * PCM, either endianness. Returns null when no reader recognizes
    * the bytes or the encoding isn't plain PCM (compressed codecs are
    * not in this container — those fall back to the stub). Output:
    * samples normalized to [−1, 1]. */
  private[multimodal] def decodeAudio(content: Array[Byte]): Array[Double] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(content))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
        val unsigned = fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
        if ((!signed && !unsigned) || (bits != 8 && bits != 16)) return null
        val raw = in.readAllBytes()
        val ch = fmt.getChannels
        val bps = bits / 8
        val frames = raw.length / (bps * ch)
        val out = new Array[Double](frames)
        val big = fmt.isBigEndian
        var f = 0
        while (f < frames) {
          var acc = 0.0
          var c = 0
          while (c < ch) {
            val o = (f * ch + c) * bps
            val v =
              if (bits == 8) {
                if (unsigned) ((raw(o) & 0xFF) - 128) / 128.0 else raw(o) / 128.0
              } else {
                val lo = raw(o + (if (big) 1 else 0)) & 0xFF
                val hi = raw(o + (if (big) 0 else 1)).toInt
                val s = ((hi << 8) | lo).toShort
                (if (unsigned) (s & 0xFFFF) - 32768 else s.toInt) / 32768.0
              }
            acc += v
            c += 1
          }
          out(f) = acc / ch
          f += 1
        }
        out
      } finally in.close()
    } catch { case _: Exception => null }
  }

  /** Content-derived audio features: [global RMS, zero-crossing rate,
    * (dim−2)-window RMS envelope] — deterministic, O(samples). */
  private[multimodal] def audioFeatures(samples: Array[Double], dim: Int): Array[Double] = {
    require(dim >= 2, s"audio feature dim must be >= 2 (global RMS + ZCR), got $dim")
    val n = samples.length
    val out = new Array[Double](dim)
    if (n == 0) return out
    var sumSq = 0.0
    var zc = 0
    var i = 0
    while (i < n) {
      sumSq += samples(i) * samples(i)
      if (i > 0 && (samples(i) >= 0) != (samples(i - 1) >= 0)) zc += 1
      i += 1
    }
    out(0) = math.sqrt(sumSq / n)
    out(1) = zc.toDouble / math.max(1, n - 1)
    val env = dim - 2
    var w = 0
    while (w < env) {
      val lo = (w.toLong * n / env).toInt
      val hi = ((w + 1).toLong * n / env).toInt
      var s = 0.0
      var j = lo
      while (j < hi) { s += samples(j) * samples(j); j += 1 }
      out(2 + w) = if (hi > lo) math.sqrt(s / (hi - lo)) else 0.0
      w += 1
    }
    out
  }

  /** Content-derived features from decoded pixels: a `dim`-bin
    * luminance histogram (Rec.601 weights) normalized to sum 1. */
  private[multimodal] def imageFeatures(img: java.awt.image.BufferedImage, dim: Int): Array[Double] = {
    val bins = new Array[Double](dim)
    val w = img.getWidth; val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
        bins(math.min(dim - 1, (lum / 256.0 * dim).toInt)) += 1
        x += 1
      }
      y += 1
    }
    val total = (w.toLong * h).toDouble
    bins.map(_ / total)
  }

  /** Feature extraction over binary payloads: batch-shaped
    * per-partition processing, schema widened with `features`. Images
    * decode for real; unrecognized payloads fall back to the stub. */
  def extractFeatures(df: DataFrame, dim: Int = 16): DataFrame = {
    val outSchema = df.schema.add(StructField("features", ArrayType(DoubleType), nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val feats =
          if (bytes == null) null
          else decodeImage(bytes) match {
            case null =>
              decodeAudio(bytes) match {
                case null => decodeStub(bytes, dim)
                case samples => audioFeatures(samples, dim)
              }
            case img => imageFeatures(img, dim)
          }
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** Resize: image payloads that decode are area-average-scaled to
    * w×h and re-encoded as PNG (content + width/height replaced);
    * everything else keeps its payload with metadata-only updates.
    * Narrow per-partition transform — no shuffle, like a real kernel. */
  def resizeImages(df: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(df.schema)
    val ci = df.schema.fieldIndex("content")
    val mi = df.schema.fieldIndex("modality")
    val wi = df.schema.fieldIndex("width")
    val hi = df.schema.fieldIndex("height")
    df.mapPartitions { rows =>
      rows.map { r =>
        val isImage = !r.isNullAt(mi) && r.getString(mi) == "image"
        val bytes = if (!isImage || r.isNullAt(ci)) null else r.getAs[Array[Byte]](ci)
        val img = if (bytes == null) null else decodeImage(bytes)
        // non-decodable payloads pass through UNCHANGED — overwriting
        // width/height without transcoding would leave metadata that
        // contradicts the bytes
        if (img == null) r
        else {
          val scaled = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = scaled.createGraphics()
          // white matte under transparency (TYPE_INT_RGB has no alpha)
          g.setColor(java.awt.Color.WHITE)
          g.fillRect(0, 0, w, h)
          g.drawImage(img.getScaledInstance(w, h, java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(scaled, "png", bos)
          val vals = r.toSeq.toArray
          vals(ci) = bos.toByteArray
          vals(wi) = w
          vals(hi) = h
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    }(enc)
  }

  /** Real multi-frame decode — animated GIF via the JDK's ImageIO GIF
    * reader (the only multi-frame container with a built-in codec; the
    * same no-new-dependency rule as image/audio). Per-frame timestamps
    * come from each frame's GraphicControlExtension delay; frames are
    * composited onto the logical-screen canvas at their descriptor
    * offsets (disposal treated as "none", the common animation case).
    * Returns null unless the payload is a GIF with ≥1 frames — real
    * video codecs are absent from this container, so those payloads
    * take the metadata-only fallback in `sampleFrames`. */
  private[graft] def decodeVideoFrames(
      content: Array[Byte]): Array[(Long, java.awt.image.BufferedImage)] = {
    val timed = decodeVideoFramesTimed(content)
    if (timed == null) null else timed._1
  }

  /** As [[decodeVideoFrames]], also returning the total animation
    * duration (sum of clamped frame delays — the last frame's display
    * interval included, which frame starts alone cannot give). */
  private[graft] def decodeVideoFramesTimed(
      content: Array[Byte]): (Array[(Long, java.awt.image.BufferedImage)], Long) = {
    import javax.imageio.ImageIO
    import javax.imageio.metadata.IIOMetadataNode
    try {
      val iis = ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(content))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val reader = readers.next()
        if (!reader.getFormatName.equalsIgnoreCase("gif")) return null
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        if (n <= 0) return null
        def child(parent: IIOMetadataNode, name: String): IIOMetadataNode = {
          val cs = parent.getChildNodes
          var found: IIOMetadataNode = null
          var j = 0
          while (j < cs.getLength) {
            if (cs.item(j).getNodeName == name) found = cs.item(j).asInstanceOf[IIOMetadataNode]
            j += 1
          }
          found
        }
        // canvas size: the stream's logical screen descriptor (individual
        // frames can be smaller patches at an offset)
        val screen = child(reader.getStreamMetadata.getAsTree("javax_imageio_gif_stream_1.0")
          .asInstanceOf[IIOMetadataNode], "LogicalScreenDescriptor")
        var cw = if (screen == null) 0 else screen.getAttribute("logicalScreenWidth").toInt
        var ch = if (screen == null) 0 else screen.getAttribute("logicalScreenHeight").toInt
        var canvas: java.awt.image.BufferedImage = null
        var t = 0L
        val out = Array.newBuilder[(Long, java.awt.image.BufferedImage)]
        var i = 0
        while (i < n) {
          val frame = reader.read(i)
          val tree = reader.getImageMetadata(i).getAsTree("javax_imageio_gif_image_1.0")
            .asInstanceOf[IIOMetadataNode]
          val gce = child(tree, "GraphicControlExtension")
          val delayMs = if (gce == null) 100L else gce.getAttribute("delayTime").toLong * 10L
          val desc = child(tree, "ImageDescriptor")
          val ox = if (desc == null) 0 else desc.getAttribute("imageLeftPosition").toInt
          val oy = if (desc == null) 0 else desc.getAttribute("imageTopPosition").toInt
          if (cw == 0) { cw = ox + frame.getWidth; ch = oy + frame.getHeight }
          val next = new java.awt.image.BufferedImage(cw, ch,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = next.createGraphics()
          g.setColor(java.awt.Color.WHITE)
          g.fillRect(0, 0, cw, ch)
          if (canvas != null) g.drawImage(canvas, 0, 0, null)
          g.drawImage(frame, ox, oy, null)
          g.dispose()
          canvas = next
          out += ((t, next))
          t += math.max(10L, delayMs) // browsers clamp 0-delay frames the same way
          i += 1
        }
        (out.result(), t)
      } finally iis.close()
    } catch { case _: Exception => null }
  }

  /** Frame sampling for video: one row per `everyMs` tick over
    * [0, duration]. Payloads that decode as animated GIF yield REAL
    * frames — the composited frame active at each tick, re-encoded as
    * PNG, with true dimensions and frame index. Payloads no codec
    * recognizes fall back to metadata-only rows (null
    * frame/width/height). The tick set is the SAME either way: the
    * `duration_ms` metadata when present (decoded-duration fallback
    * otherwise), so whether the codec recognized the bytes changes
    * frame CONTENT, never row counts — the distributed explode shape
    * and everything downstream are identical. Narrow per-partition
    * transform, no shuffle. */
  def sampleFrames(df: DataFrame, everyMs: Long, maxTicksPerAsset: Int = 100000): DataFrame = {
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    require(maxTicksPerAsset > 0, s"maxTicksPerAsset must be positive, got $maxTicksPerAsset")
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_ms", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("frame", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val vids = df.filter(col("modality") === "video")
    val ii = vids.schema.fieldIndex("asset_id")
    val ci = vids.schema.fieldIndex("content")
    val di = vids.schema.fieldIndex("duration_ms")
    vids.mapPartitions { rows =>
      // duration_ms is UNTRUSTED metadata: a corrupt value (micro-
      // seconds, Long.MaxValue) must not turn one row into 10^17 ticks.
      // The cap applies to BOTH paths, preserving decode/fallback
      // tick-set identity.
      def ticks(total: Long): Iterator[Long] =
        (0L to math.min(math.max(total, 0L), everyMs * (maxTicksPerAsset - 1L))
          by everyMs).iterator
      rows.flatMap { r =>
        val id = r.getLong(ii)
        val bytes = if (r.isNullAt(ci)) null else r.getAs[Array[Byte]](ci)
        val timed = if (bytes == null) null else decodeVideoFramesTimed(bytes)
        if (timed != null && timed._1.nonEmpty) {
          val frames = timed._1
          // same tick range the metadata-only fallback would produce
          val total = if (!r.isNullAt(di)) r.getLong(di) else timed._2
          val pngs = new Array[Array[Byte]](frames.length)
          ticks(total).map { t =>
            // active frame = last whose start is <= t
            var f = frames.length - 1
            while (f > 0 && frames(f)._1 > t) f -= 1
            if (pngs(f) == null) {
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(frames(f)._2, "png", bos)
              pngs(f) = bos.toByteArray
            }
            Row(id, t, Integer.valueOf(f), Integer.valueOf(frames(f)._2.getWidth),
              Integer.valueOf(frames(f)._2.getHeight), pngs(f))
          }
        } else if (!r.isNullAt(di)) {
          ticks(r.getLong(di)).map(t => Row(id, t, null, null, null, null))
        } else Iterator.empty
      }
    }(enc)
  }

  /** Encode frames as an animated GIF (delay in centiseconds per
    * frame) — the write half of `decodeVideoFrames`, JDK-only. */
  def encodeAnimatedGif(frames: Seq[java.awt.image.BufferedImage], delayCs: Int): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { img =>
      val md = writer.getDefaultImageMetadata(
        ImageTypeSpecifier.createFromRenderedImage(img), writer.getDefaultWriteParam)
      val fmt = md.getNativeMetadataFormatName
      val root = md.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val existing = root.getElementsByTagName("GraphicControlExtension")
      val gce = if (existing.getLength > 0) existing.item(0).asInstanceOf[IIOMetadataNode]
        else { val n = new IIOMetadataNode("GraphicControlExtension"); root.appendChild(n); n }
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("transparentColorIndex", "0")
      gce.setAttribute("delayTime", delayCs.toString)
      md.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, md), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** Derive a REAL multimodal asset table from any (id, text) frame:
    * per row, the text bytes deterministically seed a genuine encoded
    * payload — PNG (id%3==0), WAV PCM (==1), or animated GIF (==2) —
    * so every downstream decode path (ImageIO, javax.sound, the GIF
    * frame reader) runs on real codec output at whatever scale the
    * source table has. Narrow per-partition transform; payloads are
    * small (8×8 pixels / 800 samples / 2 frames) so the synthesized
    * table stays proportional to the source row count. */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val src = df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        var h = 1125899906842597L
        r.getString(1).getBytes("UTF-8").foreach(b => h = 31 * h + b)
        def byteAt(i: Int): Int = ((h >>> ((i % 8) * 8)) & 0xFF).toInt
        (id % 3) match {
          case 0 => // PNG: 8×8 image whose pixels mix id-independent hash bytes
            val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
            for (y <- 0 until 8; x <- 0 until 8)
              img.setRGB(x, y, (byteAt(x) << 16) | (byteAt(y + 3) << 8) | byteAt(x + y))
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            Row(id, "image", bos.toByteArray, Integer.valueOf(8), Integer.valueOf(8), null, null)
          case 1 => // WAV: 0.1 s of a hash-pitched sine, 8 kHz 16-bit mono PCM
            import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
            val freq = 200.0 + (byteAt(0) * 4)
            val n = 800
            val pcm = new Array[Byte](n * 2)
            for (i <- 0 until n) {
              val s = (0.5 * math.sin(2 * math.Pi * freq * i / 8000.0) * 32767).toInt.toShort
              pcm(2 * i) = (s & 0xFF).toByte
              pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
            }
            val fmt = new AudioFormat(8000f, 16, 1, true, false)
            val in = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
            val bos = new java.io.ByteArrayOutputStream()
            AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
            Row(id, "audio", bos.toByteArray, null, null, Integer.valueOf(8000),
              java.lang.Long.valueOf(100L))
          case _ => // animated GIF: two solid hash-colored frames, 100 ms apart
            def solid(rgb: Int): java.awt.image.BufferedImage = {
              val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = img.createGraphics()
              g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, 8, 8); g.dispose()
              img
            }
            val gif = encodeAnimatedGif(Seq(
              solid((byteAt(0) << 16) | (byteAt(1) << 8) | byteAt(2)),
              solid((byteAt(3) << 16) | (byteAt(4) << 8) | byteAt(5))), delayCs = 10)
            Row(id, "video", gif, Integer.valueOf(8), Integer.valueOf(8), null,
              java.lang.Long.valueOf(200L))
        }
      }
    }(enc)
  }

  /** Synthetic deterministic asset table for tests/demos. */
  def syntheticAssets(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val modality = Seq("image", "audio", "video")(i % 3)
      val content = Array.tabulate[Byte](64)(j => ((i * 131 + j * 7) % 251).toByte)
      Row(i.toLong, modality, content,
        if (modality == "image") Integer.valueOf(640) else null,
        if (modality == "image") Integer.valueOf(480) else null,
        if (modality == "audio") Integer.valueOf(16000) else null,
        if (modality != "image") java.lang.Long.valueOf(1000L * (i % 30 + 1)) else null)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
  }
}
