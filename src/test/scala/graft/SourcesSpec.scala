package graft

import graft.sources.{CsvOps, Gpx, Jsonl, Layout, SqlSource, Tcx}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class SourcesSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("CSV roundtrip preserves values and NA convention") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val df = Seq((1, Some(1.5), "x"), (2, None, "y")).toDF("id", "v", "s")
    CsvOps.write(df, s"$dir/out", na = "NA")
    val back = CsvOps.read(spark, s"$dir/out", na = "NA")
    assert(back.count() == 2)
    assert(back.schema("v").dataType.typeName == "double")
    assert(back.filter(col("v").isNull).count() == 1)
  }

  private val gpxXml =
    """<?xml version="1.0"?>
      |<gpx version="1.1" creator="t" xmlns="http://www.topografix.com/GPX/1/1">
      |<trk><name>t</name><trkseg>
      |<trkpt lat="45.0" lon="25.0"><ele>100.0</ele><time>2024-01-01T00:00:00Z</time></trkpt>
      |<trkpt lat="45.001" lon="25.0"><ele>101.0</ele><time>2024-01-01T00:00:10Z</time></trkpt>
      |<trkpt lat="45.002" lon="25.0"><ele>102.0</ele><time>2024-01-01T00:00:20Z</time></trkpt>
      |</trkseg></trk></gpx>""".stripMargin

  test("GPX read: trackpoints with cumulative distance; write roundtrips") {
    val dir = Files.createTempDirectory("graft_gpx")
    Files.writeString(dir.resolve("a.gpx"), gpxXml)
    val df = Gpx.read(spark, dir.toString + "/*.gpx")
    assert(df.count() == 3)
    val rows = df.orderBy("idx").collect()
    assert(rows.head.getAs[Double]("dst") == 0.0)
    // ~111m per 0.001° latitude
    val d1 = rows(1).getAs[Double]("dst")
    assert(d1 > 100 && d1 < 125)
    assert(rows(2).getAs[Double]("dst") > d1)
    val out = dir.resolve("out.gpx").toString
    Gpx.write(df.select(col("lat"), col("lon"), col("ele"), col("timestamp")), out)
    val back = Gpx.read(spark, out)
    assert(back.count() == 3)
    assert(back.agg(max("ele")).first().getDouble(0) == 102.0)
  }

  // extension series in both gpxtpx (nested TrackPointExtension) and
  // gpxdata spellings, two track segments, file-provided distance
  private val gpxExtXml =
    """<?xml version="1.0"?>
      |<gpx version="1.1" creator="t" xmlns="http://www.topografix.com/GPX/1/1"
      | xmlns:gpxdata="http://www.cluetrust.com/XML/GPXDATA/1/0"
      | xmlns:gpxtpx="http://www.garmin.com/xmlschemas/TrackPointExtension/v1">
      |<trk><name>t</name><trkseg>
      |<trkpt lat="45.0" lon="25.0"><ele>100.0</ele><time>2024-01-01T00:00:00Z</time>
      | <extensions><gpxtpx:TrackPointExtension><gpxtpx:hr>120</gpxtpx:hr><gpxtpx:cad>80</gpxtpx:cad>
      | <gpxtpx:atemp>21.5</gpxtpx:atemp></gpxtpx:TrackPointExtension></extensions></trkpt>
      |<trkpt lat="45.001" lon="25.0"><ele>101.0</ele><time>2024-01-01T00:00:10Z</time>
      | <extensions><gpxdata:hr>125</gpxdata:hr><gpxdata:cadence>82</gpxdata:cadence>
      | <gpxdata:speed>3.1</gpxdata:speed><gpxdata:power>250</gpxdata:power>
      | <gpxdata:distance>111.0</gpxdata:distance></extensions></trkpt>
      |</trkseg><trkseg>
      |<trkpt lat="45.002" lon="25.0"><ele>102.0</ele><time>2024-01-01T00:01:00Z</time></trkpt>
      |</trkseg></trk></gpx>""".stripMargin

  test("GPX extension series: hr/cad/spd/pwr/temp in both tag spellings, file dst, multi-seg") {
    val dir = Files.createTempDirectory("graft_gpx_ext")
    Files.writeString(dir.resolve("a.gpx"), gpxExtXml)
    val rows = Gpx.read(spark, dir.toString + "/*.gpx").orderBy("idx").collect()
    assert(rows.map(_.getAs[Int]("seg")).toSeq == Seq(0, 0, 1))
    assert(rows(0).getAs[Double]("hr") == 120.0 && rows(1).getAs[Double]("hr") == 125.0)
    assert(rows(0).getAs[Double]("cad") == 80.0 && rows(1).getAs[Double]("cad") == 82.0)
    assert(rows(0).getAs[Double]("temp") == 21.5)
    assert(rows(1).getAs[Double]("spd") == 3.1 && rows(1).getAs[Double]("pwr") == 250.0)
    // the file provides a distance series → no synthesized haversine
    assert(rows(0).isNullAt(rows(0).fieldIndex("dst")))
    assert(rows(1).getAs[Double]("dst") == 111.0)
  }

  test("GPX write round-trips the default export series, segments, and waypoints") {
    val dir = Files.createTempDirectory("graft_gpx_rt")
    Files.writeString(dir.resolve("a.gpx"), gpxExtXml)
    val df = Gpx.read(spark, dir.toString + "/*.gpx").orderBy("idx")
    val out = dir.resolve("out.gpx").toString
    Gpx.write(df, out, name = "rt",
      waypoints = Seq((45.0005, 25.0, Some(100.5), 1704067205000L, "Summit")))
    val back = Gpx.read(spark, out).orderBy("idx").collect()
    assert(back.length == 3)
    assert(back.map(_.getAs[Int]("seg")).toSeq == Seq(0, 0, 1)) // segments preserved
    assert(back(0).getAs[Double]("hr") == 120.0 && back(0).getAs[Double]("cad") == 80.0)
    assert(back(1).getAs[Double]("spd") == 3.1 && back(1).getAs[Double]("pwr") == 250.0)
    assert(back(1).getAs[Double]("dst") == 111.0)
    val wpts = Gpx.readWaypoints(spark, out).collect()
    assert(wpts.length == 1 && wpts.head.getAs[String]("name") == "Summit")
    assert(wpts.head.getAs[Double]("ele") == 100.5)
  }

  private val tcxXml =
    """<?xml version="1.0"?>
      |<TrainingCenterDatabase xmlns="http://www.garmin.com/xmlschemas/TrainingCenterDatabase/v2">
      |<Activities><Activity Sport="Biking"><Id>2024-01-01T00:00:00Z</Id>
      |<Lap StartTime="2024-01-01T00:00:00Z"><Track>
      |<Trackpoint><Time>2024-01-01T00:00:00Z</Time>
      | <Position><LatitudeDegrees>45.0</LatitudeDegrees><LongitudeDegrees>25.0</LongitudeDegrees></Position>
      | <AltitudeMeters>100.0</AltitudeMeters><DistanceMeters>0.0</DistanceMeters>
      | <HeartRateBpm><Value>120</Value></HeartRateBpm><Cadence>80</Cadence></Trackpoint>
      |<Trackpoint><Time>2024-01-01T00:00:10Z</Time>
      | <Position><LatitudeDegrees>45.001</LatitudeDegrees><LongitudeDegrees>25.0</LongitudeDegrees></Position>
      | <AltitudeMeters>101.0</AltitudeMeters><DistanceMeters>111.0</DistanceMeters>
      | <HeartRateBpm><Value>125</Value></HeartRateBpm><Cadence>82</Cadence>
      | <Extensions><TPX xmlns="http://www.garmin.com/xmlschemas/ActivityExtension/v2">
      |  <Speed>3.2</Speed><Watts>240</Watts></TPX></Extensions></Trackpoint>
      |</Track></Lap></Activity></Activities></TrainingCenterDatabase>""".stripMargin

  test("TCX read: laps, hr, cadence, TPX speed/watts extensions") {
    val dir = Files.createTempDirectory("graft_tcx")
    Files.writeString(dir.resolve("a.tcx"), tcxXml)
    val df = Tcx.read(spark, dir.toString + "/*.tcx")
    assert(df.count() == 2)
    val r = df.orderBy("idx").collect()
    assert(r.head.getAs[Double]("hr") == 120.0)
    assert(r(1).getAs[Double]("cad") == 82.0)
    assert(r(1).getAs[Double]("spd") == 3.2)
    assert(r(1).getAs[Double]("watts") == 240.0)
    assert(r.head.isNullAt(r.head.fieldIndex("spd")))
    assert(r.forall(_.getAs[Int]("lap") == 0))
  }

  test("df-read/sql via in-memory Derby") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE t (id INT, name VARCHAR(20), v DOUBLE)")
    st.execute("INSERT INTO t VALUES (1, 'a', 1.5), (2, 'b', 2.5)")
    st.close()
    val df = SqlSource.read(spark, url, "SELECT id, name, v FROM t")
    assert(df.count() == 2)
    assert(df.agg(sum("v")).first().getDouble(0) == 4.0)
    conn.close()
  }

  test("layout: partitioned+sorted write prunes directories and bounds file counts") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val events = Tables.events(spark, sf)
      .withColumn("bucket", pmod(col("user_id"), lit(4)))
    Layout.writeSorted(events, tmp, partCols = Seq("bucket"),
      sortCols = Seq("user_id", "eps_us"), filesPerPartition = 2)

    // every directory holds at most filesPerPartition parquet files
    val dirs = new java.io.File(tmp).listFiles().filter(_.getName.startsWith("bucket="))
    assert(dirs.length == 4, dirs.map(_.getName).mkString(","))
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty && files.length <= 2, s"${d.getName}: ${files.length} files")
    }

    // a bucket filter reads ONLY that directory's files (planner-time
    // partition pruning), and the probe-column filter pushes to the scan
    val pruned = Layout.read(spark, tmp).filter(col("bucket") === 2 && col("user_id") > 10)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan.take(900))
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(user_id,10)"), plan.take(900))
    val filesRead = pruned.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(filesRead.nonEmpty && filesRead.forall(_.contains("bucket=2")), filesRead.mkString("\n"))
    assert(filesRead.length <= 2)

    // in-file ordering: along READ order (monotonically_increasing_id
    // within a scan partition × file), the sort key never decreases —
    // this is what gives row groups tight min/max bounds
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(spark_partition_id(), input_file_name()).orderBy("mid")
    val disordered = Layout.read(spark, tmp)
      .select(monotonically_increasing_id().as("mid"), col("user_id"), col("eps_us"))
      .withColumn("pu", lag("user_id", 1).over(w))
      .withColumn("pe", lag("eps_us", 1).over(w))
      .filter(col("pu") > col("user_id") ||
        (col("pu") === col("user_id") && col("pe") > col("eps_us")))
      .count()
    assert(disordered == 0)

    // content round-trips exactly
    val back = Layout.read(spark, tmp).select("user_id", "eps_us", "value")
    assert(back.count() == events.count())
    assert(back.exceptAll(events.select("user_id", "eps_us", "value")).isEmpty)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("layout: z-order bounds per-file spans on BOTH dimensions at once") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // 64×64 grid, shuffled — the adversarial case for single-key sorts
    val grid = rng.shuffle((for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toDouble, y.toDouble)).toVector)
      .toDF("x", "y")

    def fileSpans(path: String): Seq[(Double, Double)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .collect().map(r => (r.getDouble(1), r.getDouble(2))).toSeq

    val zTmp = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Layout.writeZOrdered(grid, zTmp, Seq("x", "y"), bits = 6, numFiles = 16)
    val lexTmp = java.nio.file.Files.createTempDirectory("graft_lex").toString
    grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y").write.mode("overwrite").parquet(lexTmp)

    val zSpans = fileSpans(zTmp)
    val lexSpans = fileSpans(lexTmp)
    assert(zSpans.size > 8 && zSpans.size <= 16, s"files: ${zSpans.size}")
    // lexicographic: x is tightly clustered but y spans the whole range
    // in (essentially) every file — a y-only filter prunes nothing
    assert(lexSpans.map(_._2).min > 55.0, s"lex y-spans: ${lexSpans.map(_._2)}")
    // z-order: files bound BOTH dimensions well below the full range on
    // average (a file straddling a Morton power-of-2 seam can span wide
    // on one dim — the curve's known discontinuities — so the mean is
    // the honest clustering signal)
    def avg(xs: Seq[Double]) = xs.sum / xs.size
    assert(avg(zSpans.map(_._1)) <= 34 && avg(zSpans.map(_._2)) <= 34,
      s"z spans: $zSpans")
    // and content round-trips exactly
    assert(spark.read.parquet(zTmp).count() == 4096)
    assert(spark.read.parquet(zTmp).exceptAll(grid).isEmpty)

    // END-TO-END skipping: a secondary-dim filter on the z-ordered
    // table reads strictly fewer rows out of the parquet reader
    // (row-group/page statistics skipping) than on the lex-sorted one,
    // where y's min/max spans every file
    def scannedRows(path: String): Long = {
      val q = spark.read.parquet(path).filter(col("y") === 7.0)
      q.collect()
      val scans = q.queryExecution.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty)
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val zRead = scannedRows(zTmp)
    val lexRead = scannedRows(lexTmp)
    assert(zRead < lexRead, s"z-ordered read $zRead rows, lex read $lexRead")
    assert(zRead <= 2048, s"y-filter should skip most z-ordered groups, read $zRead")

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(zTmp))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(lexTmp))
  }

  test("layout: compact collapses a small-file tail and swaps atomically") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val events = Tables.events(spark, sf)
      .withColumn("bucket", pmod(col("user_id"), lit(2)))
    // simulate a fragmented table with the very anti-pattern
    // writeSorted exists to avoid: a plain partitionBy write where
    // every task writes every directory (8 tasks × 2 dirs)
    events.repartition(8).write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    def filesPerDir(): Map[String, Int] =
      new java.io.File(tmp).listFiles().filter(_.getName.startsWith("bucket="))
        .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    assert(filesPerDir().values.exists(_ > 1))
    val before = Layout.read(spark, tmp).select("user_id", "eps_us", "value")
      .collect().map(_.toString).sorted

    Layout.compact(spark, tmp, partCols = Seq("bucket"),
      sortCols = Seq("user_id", "eps_us")) // default target >> data → 1 file/dir
    assert(filesPerDir().values.forall(_ == 1), filesPerDir().toString)
    // no temp/old residue from the swap
    assert(!new java.io.File(tmp + "__compact_tmp").exists())
    assert(!new java.io.File(tmp + "__compact_old").exists())
    // content identical
    val after = Layout.read(spark, tmp).select("user_id", "eps_us", "value")
      .collect().map(_.toString).sorted
    assert(after.sameElements(before))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("partitioned JDBC read fans out over range scans") {
    val url = "jdbc:derby:memory:graftdb2;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE big (id INT, v DOUBLE)")
    (1 to 10).foreach(i => st.execute(s"INSERT INTO big VALUES ($i, $i.5)"))
    st.close()
    val df = SqlSource.readPartitioned(spark, url, "big", "id", 1, 10, numPartitions = 3)
    assert(df.rdd.getNumPartitions == 3) // three parallel range scans
    assert(df.count() == 10)
    assert(df.agg(sum("id")).first().getLong(0) == 55)
    conn.close()
  }

  test("JSONL roundtrip: clean rows survive byte-identical, corrupt lines quarantine") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_jsonl").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val df = Seq((1L, "hello world", "en"), (2L, "bonjour", "fr"), (3L, null, "en"))
      .toDF("doc_id", "text", "lang")
    Jsonl.write(df, s"$dir/out", singleFile = true)
    val back = Jsonl.readQuarantine(spark, s"$dir/out", schema)
    assert(Jsonl.corrupt(back).count() == 0)
    val clean = Jsonl.clean(back).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSeq
    assert(clean == Seq((1L, Some("hello world"), "en"), (2L, Some("bonjour"), "fr"),
      (3L, None, "en")))
  }

  test("JSONL corrupt-line policy: quarantine captures, strict fails, none silently drops") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_jsonl_bad").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val lines = Seq(
      """{"doc_id": 1, "text": "ok"}""",
      """{"doc_id": not-json""",                // malformed JSON
      """{"doc_id": "oops", "text": "typed"}""", // schema violation: string in long
      """{"doc_id": 4, "text": "also ok"}""")
    Files.write(java.nio.file.Paths.get(dir, "part.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val back = Jsonl.readQuarantine(spark, s"$dir/part.jsonl", schema)
    assert(back.count() == 4) // every input line accounted for
    val bad = Jsonl.corrupt(back).collect().map(_.getString(0)).toSet
    assert(bad == Set(lines(1), lines(2)))
    val good = Jsonl.clean(back).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(good == Seq((1L, "ok"), (4L, "also ok")))
    intercept[Exception] {
      Jsonl.readStrict(spark, s"$dir/part.jsonl", schema).collect()
    }
  }

  test("JSONL blank and null lines: no phantom all-null rows in clean()") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_jsonl_blank").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val lines = Seq(
      """{"doc_id": 1, "text": "ok"}""",
      "",                       // blank: skipped (line noise, as native json)
      "   ",                    // whitespace-only: skipped
      "null",                   // literal null doc: quarantined, not admitted
      """{}""",                 // empty object: CLEAN all-null-fields row (as native)
      """{"doc_id": 2, "text": "ok2"}""")
    Files.write(java.nio.file.Paths.get(dir, "part.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val back = Jsonl.readQuarantine(spark, s"$dir/part.jsonl", schema)
    assert(back.count() == 4) // 2 clean + {} + quarantined null
    assert(Jsonl.corrupt(back).collect().map(_.getString(0)).toSeq == Seq("null"))
    val clean = Jsonl.clean(back).orderBy("doc_id").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        Option(r.getString(1)))).toSeq
    assert(clean == Seq((None, None), (Some(1L), Some("ok")), (Some(2L), Some("ok2"))))
  }
}
