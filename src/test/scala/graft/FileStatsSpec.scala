package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{FileStats, ManagedTable}

/** Manifest-level data skipping: the stats sidecar written at commit,
  * and readRange's file pruning — results must be row-identical to an
  * unpruned read + filter, while a clustered table's selective range
  * scans strictly fewer files.
  */
class FileStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType),
    StructField("score", DoubleType)))

  private def freshRoot(): String =
    Files.createTempDirectory("graft_fs").toString + "/t"

  private def rows(r: (Long, String, Double)*) =
    r.toSeq.toDF("id", "grp", "score")

  test("sidecar render/parse round-trips, including escapes and empties") {
    val stats: FileStats.Stats = Map(
      "data/u1/part-0.parquet" -> Map("id" -> ("0", "99"), "score" -> ("-1.5", "2.25")),
      "data/u2/a \"b\"\\c.parquet" -> Map.empty,
      "data/u3/part-1.parquet" -> Map("id" -> ("100", "100")))
    val text = FileStats.render(stats)
    assert(graft.util.Json.isValid(text), text)
    assert(FileStats.parse(text) == stats)
    assert(FileStats.parse(FileStats.render(Map.empty)) == Map.empty)
  }

  test("every commit writes a sidecar covering exactly the snapshot's files") {
    val root = freshRoot()
    ManagedTable.create(spark, root, schema)
    ManagedTable.insert(spark, root, rows((1L, "a", 1.0), (2L, "a", 2.0)))
    ManagedTable.insert(spark, root, rows((10L, "b", 3.0)))
    val h = ManagedTable.history(spark, root)
    h.foreach { s =>
      val st = FileStats.read(spark, root, s.version)
      assert(st.keySet == s.files.toSet, s"v${s.version}")
    }
    // ranges are the real min/max: id over all files spans 1..10
    val latest = FileStats.read(spark, root, h.last.version)
    val ids = latest.values.flatMap(_.get("id")).toSeq
    assert(ids.map(p => BigDecimal(p._1)).min == 1 &&
      ids.map(p => BigDecimal(p._2)).max == 10)
    // the string column never gets an entry (not a range type)
    assert(latest.values.forall(!_.contains("grp")))
  }

  test("readRange is row-identical to read+filter and prunes a clustered table") {
    val root = freshRoot()
    ManagedTable.create(spark, root, schema)
    ManagedTable.insert(spark, root,
      (1L to 400L).map(i => (i, s"g${i % 7}", i / 10.0)).toDF("id", "grp", "score"))
    // cluster on id into 8 files -> disjoint id ranges per file
    ManagedTable.compactTable(spark, root, numFiles = 8, clusterCols = Seq("id"))
    val pruned = ManagedTable.readRange(spark, root, "id", 90L, 110L)
    val full = ManagedTable.read(spark, root)
      .filter(col("id") >= 90 && col("id") <= 110)
    assert(pruned.as[(Long, String, Double)].collect().toSet ==
      full.as[(Long, String, Double)].collect().toSet)
    assert(pruned.count() == 21)
    // the scale claim: the pruned scan reads strictly fewer files
    val totalFiles = ManagedTable.history(spark, root).last.files.size
    assert(totalFiles == 8, s"expected 8 clustered files, got $totalFiles")
    assert(pruned.inputFiles.length < totalFiles,
      s"pruned scan reads ${pruned.inputFiles.length} of $totalFiles files")
    assert(pruned.inputFiles.length <= 2)
    // double columns prune too
    val byScore = ManagedTable.readRange(spark, root, "score", 0.0, 1.0)
    assert(byScore.count() == 10 && byScore.inputFiles.length < totalFiles)
  }

  test("an empty pruned set returns an empty frame, not an error") {
    val root = freshRoot()
    ManagedTable.create(spark, root, schema)
    ManagedTable.insert(spark, root, rows((1L, "a", 1.0), (2L, "a", 2.0)))
    val none = ManagedTable.readRange(spark, root, "id", 1000L, 2000L)
    assert(none.count() == 0 && none.inputFiles.isEmpty)
    assert(none.schema == ManagedTable.read(spark, root).schema)
  }

  test("missing stats degrade to an unpruned (still correct) scan") {
    val root = freshRoot()
    ManagedTable.create(spark, root, schema)
    ManagedTable.insert(spark, root, rows((1L, "a", 1.0), (50L, "b", 2.0)))
    val snap = ManagedTable.history(spark, root).last
    // simulate a pre-stats table / failed sidecar write
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(FileStats.statsPath(root, snap.version), false)
    val got = ManagedTable.readRange(spark, root, "id", 0L, 10L)
    assert(got.as[(Long, String, Double)].collect().toSeq == Seq((1L, "a", 1.0)))
  }

  test("all-null and NaN columns never produce a pruning entry") {
    val root = freshRoot()
    ManagedTable.create(spark, root, schema)
    val weird = Seq((null.asInstanceOf[java.lang.Long], "a", Double.NaN),
        (null.asInstanceOf[java.lang.Long], "b", Double.NaN))
      .toDF("id", "grp", "score")
      .select(col("id").cast("long"), col("grp"), col("score"))
    ManagedTable.insert(spark, root, weird)
    val snap = ManagedTable.history(spark, root).last
    val st = FileStats.read(spark, root, snap.version)
    // no usable range for either column -> no entry -> never pruned
    assert(st.values.forall(m => !m.contains("id") && !m.contains("score")))
    assert(ManagedTable.readRange(spark, root, "id", 0L, 10L).count() == 0)
  }

  test("time travel reads use the matching version's sidecar") {
    val root = freshRoot()
    ManagedTable.create(spark, root, schema)
    ManagedTable.insert(spark, root, rows((1L, "a", 1.0)))
    val v1 = ManagedTable.history(spark, root).last.version
    ManagedTable.insert(spark, root, rows((100L, "b", 2.0)))
    val old = ManagedTable.readRange(spark, root, "id", 0L, 10L, asOf = Some(v1))
    assert(old.as[(Long, String, Double)].collect().toSeq == Seq((1L, "a", 1.0)))
    // at v1 the high-id file does not exist; at latest it is pruned
    val cur = ManagedTable.readRange(spark, root, "id", 50L, 200L)
    assert(cur.count() == 1 && cur.inputFiles.length == 1)
  }

  test("metadata-only commits reuse previous entries (no re-harvest drift)") {
    val root = freshRoot()
    ManagedTable.create(spark, root, schema)
    ManagedTable.insert(spark, root, rows((1L, "a", 1.0), (9L, "a", 2.0)))
    val before = FileStats.read(spark, root,
      ManagedTable.history(spark, root).last.version)
    ManagedTable.addColumn(spark, root, "extra", IntegerType)
    val after = FileStats.read(spark, root,
      ManagedTable.history(spark, root).last.version)
    assert(after == before) // carried files, carried entries
    // and the evolved column simply has no stats -> readRange on it refuses
    // nothing (numeric type) but scans everything
    val got = ManagedTable.readRange(spark, root, "extra", 0, 5)
    assert(got.count() == 0) // all nulls in the evolved column
  }

  test("vacuum removes expired sidecars with their manifests") {
    val root = freshRoot()
    ManagedTable.create(spark, root, schema)
    (1 to 4).foreach(i => ManagedTable.insert(spark, root, rows((i.toLong, "a", 1.0))))
    ManagedTable.vacuum(spark, root, retainVersions = 2)
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val h = ManagedTable.history(spark, root)
    assert(h.size == 2)
    assert(h.forall(s => f.exists(FileStats.statsPath(root, s.version))))
    assert(!f.exists(FileStats.statsPath(root, 0)))
  }

  test("OPTIMIZE ZORDER: readRange prunes on BOTH z-ordered columns") {
    val root = freshRoot()
    ManagedTable.create(spark, root, schema)
    // a 20x20 grid: id and score are independent dimensions, so a 1-D
    // layout can only ever narrow one of them
    ManagedTable.insert(spark, root,
      (0L until 400L).map(i => (i % 20, "g", (i / 20).toDouble))
        .toDF("id", "grp", "score"))
    ManagedTable.compactTable(spark, root, numFiles = 16,
      zorderCols = Seq("id", "score"))
    val total = ManagedTable.history(spark, root).last.files.size
    val byId = ManagedTable.readRange(spark, root, "id", 0L, 4L)
    val bySc = ManagedTable.readRange(spark, root, "score", 0.0, 4.0)
    assert(byId.count() == 100 && bySc.count() == 100)
    assert(byId.inputFiles.length < total,
      s"id range scans ${byId.inputFiles.length}/$total")
    assert(bySc.inputFiles.length < total,
      s"score range scans ${bySc.inputFiles.length}/$total")
    // the 1-D control: clustering BY (id) leaves score spans global,
    // so the same score range prunes nothing
    val root2 = freshRoot()
    ManagedTable.create(spark, root2, schema)
    ManagedTable.insert(spark, root2,
      (0L until 400L).map(i => (i % 20, "g", (i / 20).toDouble))
        .toDF("id", "grp", "score"))
    ManagedTable.compactTable(spark, root2, numFiles = 16,
      clusterCols = Seq("id"))
    val t2 = ManagedTable.history(spark, root2).last.files.size
    val ctl = ManagedTable.readRange(spark, root2, "score", 0.0, 4.0)
    assert(ctl.count() == 100 && ctl.inputFiles.length == t2,
      s"1-D control should scan all $t2 files, scanned ${ctl.inputFiles.length}")
    // mutually exclusive layouts and too-few zorder columns are loud
    intercept[IllegalArgumentException] {
      ManagedTable.compactTable(spark, root, 4,
        clusterCols = Seq("id"), zorderCols = Seq("id", "score"))
    }
    intercept[IllegalArgumentException] {
      ManagedTable.compactTable(spark, root, 4, zorderCols = Seq("id"))
    }
  }

  test("bad column or non-numeric column fails loudly") {
    val root = freshRoot()
    ManagedTable.create(spark, root, schema)
    ManagedTable.insert(spark, root, rows((1L, "a", 1.0)))
    intercept[IllegalArgumentException] {
      ManagedTable.readRange(spark, root, "nope", 0L, 1L)
    }
    intercept[IllegalArgumentException] {
      ManagedTable.readRange(spark, root, "grp", 0L, 1L)
    }
    intercept[IllegalArgumentException] {
      ManagedTable.readRange(spark, root, "id", "a", "z")
    }
  }
}
