package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Sinks, Sources}

/** Sources/sinks round trips (SURVEY §2.G). */
class SinksSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-sinks").toString

  test("csv round trip with explicit schema; malformed cells null out") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,price,label\n1,10.5,a\n2,not_a_number,b\n3,,c\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("price", DoubleType),
      StructField("label", StringType)))
    val df = Sources.csv(spark, s"$dir/in.csv", schema)
    assert(df.count() == 3)
    assert(df.filter(col("price").isNull).count() == 2) // coerce, don't fail
  }

  test("json-lines with ragged keys resolves to null columns") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.json"),
      """{"id":1,"title":"x","alt_title":"y"}
        |{"id":2,"title":"z"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("title", StringType),
      StructField("alt_title", StringType)))
    val df = Sources.json(spark, s"$dir/in.json", schema)
    assert(df.count() == 2)
    assert(df.filter(col("alt_title").isNull).count() == 1)
  }

  test("partitioned parquet write creates partition directories and prunes") {
    val dir = tmp() + "/part"
    val df = Seq((1L, "O"), (2L, "F"), (3L, "O")).toDF("id", "status")
    Sinks.writePartitioned(df, dir, Seq("status"))
    assert(new java.io.File(s"$dir/status=O").exists())
    val back = Sources.parquet(spark, dir).filter(col("status") === "O")
    assert(back.count() == 2)
    // partition pruning visible in the scan
    val plan = back.queryExecution.executedPlan.toString
    assert(!plan.contains("status=F"))
  }

  test("chunked write bounds records per file (the 1M-row chunk analog)") {
    val dir = tmp() + "/chunk"
    Sinks.writeChunked((1 to 1000).toDF("id").coalesce(1), dir, 100L)
    val files = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files == 10, s"expected 10 chunk files, got $files")
    assert(Sources.parquet(spark, dir).count() == 1000)
  }

  test("append mode accumulates; overwrite replaces") {
    val dir = tmp() + "/modes"
    val df = Seq(1L, 2L).toDF("id")
    Sinks.writeChunked(df, dir, 1000L)
    Sinks.append(df, dir)
    assert(Sources.parquet(spark, dir).count() == 4)
    Sinks.writeChunked(df, dir, 1000L) // overwrite default
    assert(Sources.parquet(spark, dir).count() == 2)
  }
}
