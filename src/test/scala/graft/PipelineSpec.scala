package graft

import java.nio.file.{Files, Paths}
import java.time.LocalDate
import org.apache.spark.sql.functions._
import graft.sources.{LakeIO, LakeZones}
import graft.types.Schemas

/** C1+C7 golden end-to-end: reference-shaped CSV landing files
  * (50 customers / 200 orders, mirroring `generate_jde_data.py`
  * defaults per `README.md:142`) → metadata-driven Bronze ingest →
  * CleanJde Silver → SCD2 dim → PIT fact load → star top-k. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def mkTmp(): String =
    Files.createTempDirectory("graft_pipe").toString

  /** Deterministic JDE-shaped fixture (seed-free: arithmetic series). */
  private def writeLanding(dir: String): Unit = {
    val customers = (0 until 50).map { i =>
      val id = 10000 + i
      val cat = Seq("100", "200", "300")(i % 3)
      val julian = 124001 + (i % 300)
      s"$id,Company $i,C,$cat,$julian"
    }
    Files.writeString(Paths.get(s"$dir/F0101.csv"),
      "ABAN8,ABALPH,ABAT1,ABAC01,ABUPMJ\n" + customers.mkString("\n"))
    val orders = (0 until 200).map { i =>
      val doco = 1 + i
      val an8 = 10000 + (i % 50)
      val julian = 124001 + (i % 300)
      val units = (1 + i % 100) * 100
      val priceCents = 1000 + (i * 245) % 49000
      val aexp = (units / 100) * priceCents
      s"$doco,SO,$an8,400638133393$i,$julian,$units,$aexp"
    }
    Files.writeString(Paths.get(s"$dir/F4211.csv"),
      "SDDOCO,SDDCTO,SDAN8,SDLITM,SDTRDJ,SDUORG,SDAEXP\n" + orders.mkString("\n"))
    Files.writeString(Paths.get(s"$dir/source_config.json"),
      """[
        {"sourceFile": "F0101.csv", "sinkPath": "jde/F0101", "description": "Address Book"},
        {"sourceFile": "F4211.csv", "sinkPath": "jde/F4211", "description": "Sales Detail"}
      ]""")
  }

  test("full medallion run: ingest → clean → scd2 → fact → star query") {
    val landing = mkTmp(); val lake = mkTmp()
    writeLanding(landing)
    val zones = LakeZones(lake)
    val now = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")

    val fact = Pipeline.run(spark, zones, landing,
      s"$landing/source_config.json", LocalDate.of(2024, 6, 1), now)

    assert(fact.count() == 200)
    // every order resolved to an active customer version
    assert(fact.filter($"CustomerKey".isNull).count() == 0)
    val dim = LakeIO.readGold(spark, zones, "dim_customer")
    assert(dim.count() == 50)
    assert(dim.filter($"IsActive").count() == 50)
    // bronze is time-partitioned
    assert(Files.exists(Paths.get(
      s"$lake/bronze/jde/F4211/ingest_year=2024/ingest_month=6/ingest_day=1")))
    // star query returns k rows with joined dim attributes
    val top = Pipeline.starTopK(spark, zones, 10).collect()
    assert(top.length == 10)
    assert(top.forall(_.getAs[String]("CustomerName").startsWith("Company")))
    // decimal money discipline survived end-to-end
    val fsch = fact.schema
    assert(fsch("ExtendedAmount").dataType.typeName == "decimal(18,2)")
  }

  test("second daily run is SCD2-correct: changed customers version") {
    val landing = mkTmp(); val lake = mkTmp()
    writeLanding(landing)
    val zones = LakeZones(lake)
    Pipeline.run(spark, zones, landing, s"$landing/source_config.json",
      LocalDate.of(2024, 6, 1), java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))

    // day 2: customer 10000 changes category
    val f0101v2 = (0 until 50).map { i =>
      val id = 10000 + i
      val cat = if (i == 0) "999" else Seq("100", "200", "300")(i % 3)
      s"$id,Company $i,C,$cat,124300"
    }
    Files.writeString(Paths.get(s"$landing/F0101.csv"),
      "ABAN8,ABALPH,ABAT1,ABAC01,ABUPMJ\n" + f0101v2.mkString("\n"))
    Pipeline.run(spark, zones, landing, s"$landing/source_config.json",
      LocalDate.of(2024, 6, 2), java.sql.Timestamp.valueOf("2024-06-02 00:00:00"))

    val dim = LakeIO.readGold(spark, zones, "dim_customer")
    assert(dim.count() == 51) // one expired + one new version
    val c0 = dim.filter($"CustomerID" === 10000).orderBy("CustomerKey").collect()
    assert(c0.length == 2)
    assert(!c0(0).getAs[Boolean]("IsActive") && c0(1).getAs[Boolean]("IsActive"))
    assert(c0(1).getAs[String]("CategoryCode") == "999")
    // fact appended twice, and SalesKey continues across loads
    // (IDENTITY(1,1) uniqueness — ADVICE r01)
    val facts = LakeIO.readGold(spark, zones, "fact_sales")
    assert(facts.count() == 400)
    assert(facts.select("SalesKey").distinct().count() == 400)
    assert(facts.agg(max($"SalesKey")).head().getLong(0) == 400L)

    // retrying the SAME logical run replaces its own load batch
    // instead of duplicating it (idempotent append — ADVICE r01)
    Pipeline.run(spark, zones, landing, s"$landing/source_config.json",
      LocalDate.of(2024, 6, 2), java.sql.Timestamp.valueOf("2024-06-02 00:00:00"))
    val facts2 = LakeIO.readGold(spark, zones, "fact_sales")
    assert(facts2.count() == 400)
    assert(facts2.select("SalesKey").distinct().count() == 400)
    // dimension unchanged by the no-op re-merge (SCD2 idempotence)
    assert(LakeIO.readGold(spark, zones, "dim_customer").count() == 51)
  }

  test("compaction collapses small files atomically, preserving rows") {
    val lake = mkTmp()
    val zones = LakeZones(lake)
    // accrete 8 tiny load batches → >= 8 files
    (0 until 8).foreach { i =>
      LakeIO.appendGoldRun(
        Seq((i.toLong, s"row$i")).toDF("id", "v"), zones, "tiny", s"b$i")
    }
    def dataFiles(): Int = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(Paths.get(s"$lake/gold/tiny")).iterator().asScala
        .count(_.toString.endsWith(".parquet"))
    }
    assert(dataFiles() >= 8)
    val before = LakeIO.readGold(spark, zones, "tiny")
      .orderBy("id").collect().map(_.toString).toSeq
    // default: hive layout preserved → one file per load_id partition,
    // and a later appendGoldRun still finds a partitioned table
    val n = LakeIO.compactGold(spark, zones, "tiny")
    assert(n == 1) // 8 tiny rows ≪ target file size → 1 shuffle task
    assert(dataFiles() == 8) // but still one file per partition dir
    val after = LakeIO.readGold(spark, zones, "tiny")
      .orderBy("id").collect().map(_.toString).toSeq
    assert(after == before) // rows and load_id column preserved
    LakeIO.appendGoldRun(
      Seq((99L, "row99")).toDF("id", "v"), zones, "tiny", "b99")
    assert(LakeIO.readGold(spark, zones, "tiny").count() == 9)

    // explicit flatten: load_id becomes a data column, one file total,
    // and appendGoldRun now REFUSES the mixed-layout write (ADVICE r02)
    LakeIO.compactGold(spark, zones, "tiny", preservePartitions = false)
    assert(dataFiles() == 1)
    assert(LakeIO.readGold(spark, zones, "tiny").count() == 9)
    val ex = intercept[IllegalArgumentException] {
      LakeIO.appendGoldRun(
        Seq((100L, "x")).toDF("id", "v"), zones, "tiny", "b100")
    }
    assert(ex.getMessage.contains("non-partitioned"))
  }

  test("compaction spreads a large partition over multiple files (review r03)") {
    val lake = mkTmp()
    val zones = LakeZones(lake)
    // one hot load_id partition with many rows
    LakeIO.appendGoldRun(
      spark.range(50000).selectExpr("id", "cast(id % 97 as string) AS v"),
      zones, "hot", "b0")
    // tiny target size forces several files; partition-col-only keying
    // would emit exactly one file for the single load_id
    LakeIO.compactGold(spark, zones, "hot", targetFileBytes = 64 * 1024)
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.walk(Paths.get(s"$lake/gold/hot")).iterator()
      .asScala.count(_.toString.endsWith(".parquet"))
    assert(files > 1, s"hot partition must split across files, got $files")
    val back = LakeIO.readGold(spark, zones, "hot")
    assert(back.count() == 50000)
    assert(back.select("load_id").distinct().count() == 1)
  }

  test("appendGoldRun rejects a foreign partition layout (review r03)") {
    val lake = mkTmp()
    val zones = LakeZones(lake)
    LakeIO.replaceGold(Seq((1L, "east", 1.0)).toDF("id", "region", "m"),
      zones, "t", partitionCols = Seq("region"))
    val ex = intercept[IllegalArgumentException] {
      LakeIO.appendGoldRun(Seq((2L, "west", 2.0)).toDF("id", "region", "m"),
        zones, "t", "b1")
    }
    assert(ex.getMessage.contains("partitioned by region"))
  }

  test("replaceGold recovers a dangling swap (crash between renames)") {
    val lake = mkTmp()
    val zones = LakeZones(lake)
    LakeIO.replaceGold(Seq((1L, "v1")).toDF("id", "v"), zones, "dim")
    // simulate a crash after rename(target → .old): live path missing
    val dir = Paths.get(s"$lake/gold/dim")
    val old = Paths.get(s"$lake/gold/dim.old")
    Files.move(dir, old)
    // a reader repairs the dangling state instead of failing
    val recovered = LakeIO.readGoldRecovering(spark, zones, "dim")
    assert(recovered.select("v").as[String].collect().toSeq == Seq("v1"))
    assert(Files.exists(dir) && !Files.exists(old))
    // crash with a COMPLETE staging dir: the new state wins
    val staging = Paths.get(s"$lake/gold/dim.staging")
    Seq((2L, "v2")).toDF("id", "v").write.parquet(staging.toString)
    Files.move(dir, old)
    LakeIO.replaceGold(Seq((3L, "v3")).toDF("id", "v"), zones, "dim")
    val fin = LakeIO.readGold(spark, zones, "dim")
      .select("v").as[String].collect().toSeq
    assert(fin == Seq("v3")) // the new call's state, built on recovery
    assert(!Files.exists(staging) && !Files.exists(old))
  }

  test("schema drift: evolving bronze batches merge by name (SURVEY §1.3)") {
    val lake = mkTmp()
    val zones = LakeZones(lake)
    // day 1: two columns; day 2 adds a column (allowSchemaDrift)
    LakeIO.writeBronze(Seq((1L, "a")).toDF("id", "v"),
      zones, "drift", LocalDate.of(2024, 6, 1))
    LakeIO.writeBronze(Seq((2L, "b", 9.5)).toDF("id", "v", "score"),
      zones, "drift", LocalDate.of(2024, 6, 2))
    val merged = LakeIO.readBronzeEvolving(spark, zones, "drift")
    assert(merged.columns.contains("score"))
    val rows = merged.select("id", "score").as[(Long, Option[Double])]
      .collect().toMap
    assert(rows(1L).isEmpty && rows(2L).contains(9.5)) // old rows null-fill
    // pruned read still drifts through the merged schema
    val d1 = LakeIO.readBronzeEvolving(spark, zones, "drift",
      Some(LocalDate.of(2024, 6, 1)))
    assert(d1.count() == 1 && d1.columns.contains("score"))
  }

  test("registerViews makes every zone table SQL-addressable") {
    val lake = mkTmp()
    val zones = LakeZones(lake)
    LakeIO.writeBronze(Seq((1L, "a")).toDF("id", "v"),
      zones, "raw", LocalDate.of(2024, 6, 1))
    LakeIO.overwriteSilver(Seq((1L, "A")).toDF("id", "v"), zones, "clean")
    LakeIO.replaceGold(Seq((1L, 10.0)).toDF("id", "m"), zones, "dim")
    val views = LakeIO.registerViews(spark, zones)
    assert(views.toSet == Set("bronze_raw", "silver_clean", "gold_dim"))
    assert(spark.sql("SELECT m FROM gold_dim WHERE id = 1").as[Double].head() == 10.0)
    assert(spark.sql(
      "SELECT silver_clean.v FROM bronze_raw JOIN silver_clean USING (id)")
      .count() == 1)
  }

  test("retry wrapper retries then alerts with stage context") {
    var calls = 0; var alerted: Option[String] = None
    intercept[RuntimeException] {
      Pipeline.withRetry("silver", attempts = 3,
        onFailure = (st, _) => alerted = Some(st)) {
        calls += 1; throw new RuntimeException("boom")
      }
    }
    assert(calls == 3)
    assert(alerted.contains("silver"))
  }

  test("jsonl and orc round-trip with schema and value fidelity") {
    val dir = mkTmp()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val expected = docs.select("doc_id", "text", "lang", "source", "n_chars")
      .collect().toSet

    LakeIO.writeJsonl(docs, s"$dir/docs_jsonl")
    val jl = LakeIO.readJsonl(spark, s"$dir/docs_jsonl", docs.schema)
    assert(jl.schema == docs.schema)
    assert(jl.select("doc_id", "text", "lang", "source", "n_chars")
      .collect().toSet == expected)
    // gzip-compressed part files landed
    val parts = new java.io.File(s"$dir/docs_jsonl").listFiles()
    assert(parts.exists(_.getName.endsWith(".json.gz")), parts.mkString(","))

    LakeIO.writeOrc(docs, s"$dir/docs_orc")
    val orc = LakeIO.readOrc(spark, s"$dir/docs_orc")
    assert(orc.select("doc_id", "text", "lang", "source", "n_chars")
      .collect().toSet == expected)
    // ORC scans push filters like parquet
    val plan = orc.filter($"doc_id" === 7L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("orc"),
      plan.take(400))
  }

  test("csv dialect: quoted fields with commas and escapes") {
    val dir = mkTmp()
    Files.writeString(Paths.get(s"$dir/F0101.csv"),
      "ABAN8,ABALPH,ABAT1,ABAC01,ABUPMJ\n" +
        "10001,\"Acme, Inc.\",C,100,124001\n" +
        "10002,\"Say \\\"hi\\\"\",C,200,124002")
    val df = LakeIO.readCsv(spark, s"$dir/F0101.csv", Schemas.F0101)
    val names = df.orderBy("ABAN8").select("ABALPH").as[String].collect()
    assert(names.toSeq == Seq("Acme, Inc.", "Say \"hi\""))
  }
}
