package graft

import graft.multimodal.Multimodal
import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class MultimodalStreamingSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("multimodal: schema, deterministic stub features, partition shape") {
    val assets = Multimodal.syntheticAssets(spark, 12)
    assert(assets.schema == Multimodal.schema)
    val f1 = Multimodal.extractFeatures(assets, dim = 8)
    val f2 = Multimodal.extractFeatures(assets, dim = 8)
    assert(f1.rdd.getNumPartitions == assets.rdd.getNumPartitions) // narrow op
    val a = f1.select("asset_id", "features").as[(Long, Seq[Double])].collect().toMap
    val b = f2.select("asset_id", "features").as[(Long, Seq[Double])].collect().toMap
    assert(a == b) // deterministic
    assert(a.values.forall(v => v.length == 8 && v.forall(x => x >= -1 && x <= 1)))
    // synthetic payloads are not decodable images → resize passes them
    // through untouched (metadata must keep matching the bytes)
    val resized = Multimodal.resizeImages(assets, 224, 224)
    assert(resized.filter(col("modality") === "image" && col("width") =!= 640).count() == 0)
    val frames = Multimodal.sampleFrames(assets, everyMs = 500)
    assert(frames.count() > 0)
    assert(frames.groupBy("asset_id").count().filter(col("count") < 2).count() == 0)
  }

  test("real PNG decode: luminance-histogram features and payload resize") {
    // 8×8 PNG, left half black, right half white
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, if (x < 4) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val assets = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(
        1L, "image", png, Integer.valueOf(8), Integer.valueOf(8), null, null))),
      Multimodal.schema)
    val feats = Multimodal.extractFeatures(assets, dim = 8)
      .select("features").as[Seq[Double]].first()
    // half the pixels land in the darkest bin, half in the brightest
    assert(feats.head == 0.5 && feats.last == 0.5)
    assert(feats.slice(1, 7).forall(_ == 0.0))
    // resize: payload transcodes to a real 4×4 PNG
    val resized = Multimodal.resizeImages(assets, 4, 4).first()
    assert(resized.getAs[Int]("width") == 4 && resized.getAs[Int]("height") == 4)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized.getAs[Array[Byte]]("content")))
    assert(back.getWidth == 4 && back.getHeight == 4)
    // grey scaled image: left columns dark, right columns bright
    val leftLum = back.getRGB(0, 0) & 0xFF
    val rightLum = back.getRGB(3, 0) & 0xFF
    assert(leftLum < 64 && rightLum > 192)
  }

  test("real WAV decode: RMS and zero-crossing features from generated PCM audio") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 0.5 s of a 440 Hz sine at 8 kHz, 16-bit signed little-endian PCM
    def wav(amplitude: Double): Array[Byte] = {
      val rate = 8000
      val n = rate / 2
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val s = (amplitude * math.sin(2 * math.Pi * 440.0 * i / rate) * 32767).toInt.toShort
        pcm(2 * i) = (s & 0xFF).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      }
      val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
      val in = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val loud = wav(0.8)
    val quiet = wav(0.1)
    val assets = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "audio", loud, null, null, Integer.valueOf(8000), java.lang.Long.valueOf(500L)),
        org.apache.spark.sql.Row(2L, "audio", quiet, null, null, Integer.valueOf(8000), java.lang.Long.valueOf(500L)))),
      Multimodal.schema)
    val feats = Multimodal.extractFeatures(assets, dim = 8)
      .select("asset_id", "features").as[(Long, Seq[Double])].collect().toMap
    // REAL decode, not the stub: a sine's RMS is amplitude/√2 and its
    // zero-crossing rate is 2f/rate — the hash stub can't hit either
    assert(math.abs(feats(1L).head - 0.8 / math.sqrt(2)) < 0.01,
      s"rms ${feats(1L).head}")
    assert(math.abs(feats(1L)(1) - 2.0 * 440 / 8000) < 0.005,
      s"zcr ${feats(1L)(1)}")
    assert(math.abs(feats(2L).head - 0.1 / math.sqrt(2)) < 0.01)
    // constant-amplitude tone → flat RMS envelope at the global RMS
    assert(feats(1L).drop(2).forall(e => math.abs(e - feats(1L).head) < 0.01))
    // determinism
    val again = Multimodal.extractFeatures(assets, dim = 8)
      .select("asset_id", "features").as[(Long, Seq[Double])].collect().toMap
    assert(again == feats)
    // bytes no reader recognizes still flow through the stub path
    val junk = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(
        3L, "audio", Array.tabulate[Byte](32)(_.toByte), null, null, null, null))),
      Multimodal.schema)
    assert(Multimodal.extractFeatures(junk, dim = 8).select("features").first().getSeq[Double](0).length == 8)
  }

  test("real animated-GIF frame sampling: timing, compositing, fallback") {
    import javax.imageio.ImageIO
    // 3 solid 10×10 frames (red, green, blue), 50 cs = 500 ms apart —
    // encoded with the production encoder (also under test here)
    def solid(rgb: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(10, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics(); g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, 10, 10); g.dispose()
      img
    }
    val gif = Multimodal.encodeAnimatedGif(
      Seq(solid(0xFF0000), solid(0x00FF00), solid(0x0000FF)), delayCs = 50)

    val decoded = Multimodal.decodeVideoFrames(gif)
    assert(decoded != null && decoded.length == 3)
    assert(decoded.map(_._1).toSeq == Seq(0L, 500L, 1000L))

    val assets = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "video", gif, null, null, null, java.lang.Long.valueOf(1500L)),
        // undecodable payload → metadata-only fallback rows
        org.apache.spark.sql.Row(2L, "video", Array.tabulate[Byte](16)(_.toByte),
          null, null, null, java.lang.Long.valueOf(1000L)))),
      Multimodal.schema)
    val frames = Multimodal.sampleFrames(assets, everyMs = 400)
      .orderBy("asset_id", "frame_ms").collect()
    val real = frames.filter(_.getLong(0) == 1L)
    // ticks span [0, duration_ms=1500] — the SAME range the fallback
    // path would emit — active frames 0 (t<500), 0, 1 (500≤t<1000),
    // 2 (1000≤t)
    assert(real.map(_.getLong(1)).toSeq == Seq(0L, 400L, 800L, 1200L))
    assert(real.map(_.getInt(2)).toSeq == Seq(0, 0, 1, 2))
    assert(real.forall(r => r.getInt(3) == 10 && r.getInt(4) == 10))
    // the sampled frame is the REAL pixel content (GIF palette keeps
    // pure primaries exact)
    def center(r: org.apache.spark.sql.Row): Int = {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("frame")))
      img.getRGB(5, 5) & 0xFFFFFF
    }
    assert(center(real(0)) == 0xFF0000 && center(real(2)) == 0x00FF00 &&
      center(real(3)) == 0x0000FF)
    val fallback = frames.filter(_.getLong(0) == 2L)
    assert(fallback.map(_.getLong(1)).toSeq == Seq(0L, 400L, 800L))
    assert(fallback.forall(_.isNullAt(2)))
  }

  test("multimodal → features → ANN integration: nearest neighbor of identical payloads") {
    val assets = Multimodal.syntheticAssets(spark, 10)
    // duplicate asset 3's payload as asset 100 → features identical → cos 1
    val dup = assets.filter(col("asset_id") === 3)
      .withColumn("asset_id", lit(100L))
    val feats = Multimodal.extractFeatures(assets.unionByName(dup), dim = 8)
      .select(col("asset_id").as("vec_id"),
        expr("transform(features, x -> cast(x as float))").as("embedding"))
    val top = graft.similarity.Cosine.topK(feats, feats.filter(col("vec_id") === 100),
      "vec_id", "embedding", 1).first()
    assert(top.getAs[Long]("neighbor_id") == 3L)
    assert(top.getAs[Double]("cos") == 1.0)
  }

  test("sessionize cuts at gaps; matches window-based formulation") {
    val us = 1000000L
    val df = Seq(
      (1L, 0L * us, 1.0), (1L, 60L * us, 2.0),          // session 1
      (1L, 4000L * us, 3.0),                            // session 2 (gap > 600s)
      (2L, 0L * us, 5.0)
    ).toDF("user_id", "eps_us", "value")
    val s = EventStreams.sessionize(df, gapMs = 600000L).orderBy("user_id", "session_start_us").collect()
    assert(s.length == 3)
    assert(s.head.getAs[Int]("n_events") == 2 && s.head.getAs[Double]("sum_value") == 3.0)
    assert(s(1).getAs[Long]("session_start_us") == 4000L * us)
  }

  test("streaming windowed agg over MemoryStream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = EventStreams.windowedAgg(df, "10 minutes", "30 minutes")
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:01:00")
      val t1 = Timestamp.valueOf("2024-01-01 00:05:00")
      val late = Timestamp.valueOf("2024-01-01 02:00:00") // advances watermark, closes window
      mem.addData((t0, "click", 1.0), (t1, "click", 2.0), (t0, "view", 5.0))
      q.processAllAvailable()
      mem.addData((late, "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("win_agg").collect()
      val click = out.find(r => r.getAs[String]("event_type") == "click"
        && r.getAs[Timestamp]("win_start") == Timestamp.valueOf("2024-01-01 00:00:00")).get
      assert(click.getAs[Long]("cnt") == 2 && click.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("streaming exact dedup drops repeated content within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "text")
    val q = EventStreams.dedupStream(df, "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      val t1 = Timestamp.valueOf("2024-01-01 00:01:00")
      mem.addData((t0, "alpha"), (t0, "beta"), (t1, "alpha")) // dup alpha
      q.processAllAvailable()
      mem.addData((t1, "beta"), (t1, "gamma")) // dup beta crosses batches
      q.processAllAvailable()
      val texts = spark.table("dedup_stream").collect().map(_.getAs[String]("text")).sorted
      assert(texts.toSeq == Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("assetsFromText: real PNG/WAV/GIF payloads decode through the real paths") {
    val docs = spark.createDataFrame(
      (0L until 9L).map(i => (i, s"document text number $i with some words")))
      .toDF("doc_id", "text")
    val assets = Multimodal.assetsFromText(docs, "doc_id", "text")
    assert(assets.schema == Multimodal.schema)
    assert(assets.rdd.getNumPartitions == docs.rdd.getNumPartitions) // narrow
    val byMod = assets.groupBy("modality").count().as[(String, Long)].collect().toMap
    assert(byMod == Map("image" -> 3L, "audio" -> 3L, "video" -> 3L))

    // every payload is REAL codec output: images/videos decode via
    // ImageIO, audio via javax.sound — none may fall to the stub
    val rows = assets.collect()
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("content")
      r.getString(1) match {
        case "image" =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          assert(img != null && img.getWidth == 8 && img.getHeight == 8)
        case "audio" =>
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          assert(in.getFormat.getSampleRate == 8000f)
        case "video" =>
          val frames = Multimodal.decodeVideoFrames(bytes)
          assert(frames != null && frames.length == 2)
          assert(frames.map(_._1).toSeq == Seq(0L, 100L))
      }
    }

    // audio features come from the real decoder: the generated tone has
    // amplitude 0.5, so RMS ≈ 0.5/√2 — the hash stub cannot hit that
    val audioF = Multimodal.extractFeatures(assets, dim = 8)
      .filter(col("modality") === "audio")
      .select("features").as[Seq[Double]].collect()
    audioF.foreach(f => assert(math.abs(f.head - 0.5 / math.sqrt(2)) < 0.01, s"rms ${f.head}"))

    // deterministic: same text → byte-identical payloads
    val again = Multimodal.assetsFromText(docs, "doc_id", "text").collect()
    val a = rows.map(r => r.getLong(0) -> r.getAs[Array[Byte]]("content").toSeq).toMap
    val b = again.map(r => r.getLong(0) -> r.getAs[Array[Byte]]("content").toSeq).toMap
    assert(a == b)

    // video frame sampling returns the real solid-color frames
    val frames = Multimodal.sampleFrames(assets.filter(col("modality") === "video"), everyMs = 50)
    assert(frames.filter(col("frame").isNull).count() == 0)
  }

  test("streaming sessionization emits closed sessions on gaps") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val df = mem.toDF().toDF("user_id", "eps_us", "value")
    val q = EventStreams.sessionizeStream(df, gapMs = 5000)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      mem.addData((1L, 1000000L, 2.0), (1L, 2000000L, 3.0))
      q.processAllAvailable()
      assert(spark.table("sess").isEmpty) // session still running, nothing closed
      // next batch arrives far beyond the gap → first session closes
      mem.addData((1L, 100000000L, 7.0))
      q.processAllAvailable()
      val out = spark.table("sess").collect()
      assert(out.exists(r => r.getAs[Long]("user_id") == 1L &&
        r.getAs[Int]("n_events") == 2 && r.getAs[Double]("sum_value") == 5.0),
        s"rows: ${out.map(_.toString).mkString("; ")}")
    } finally q.stop()
  }
}
