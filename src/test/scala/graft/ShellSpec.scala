package graft

import graft.api.Shell
import graft.model.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The b6 shell-pipeline veneer (SURVEY.md §3.2): reference-style
  * expressions evaluate to the same results as the direct Dataset API. */
class ShellSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sfDir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("shell-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  lazy val images = Tables.images(spark, sfDir)

  test("find [#status=O] | take 10 matches the direct pipeline") {
    val got = Shell.run(images, "find [#status=O] | take 10")
      .select("image_id").collect().map(_.getLong(0)).toSeq
    val want = images.where(col("status") === "O")
      .orderBy("image_id").limit(10)
      .select("image_id").collect().map(_.getLong(0)).toSeq
    assert(got == want && got.length == 10)
  }

  test("find (and [#status=O] [#priority=1-URGENT]) | count") {
    val got = Shell.run(images, "find (and [#status=O] [#priority=1-URGENT]) | count")
      .collect()(0).getLong(0)
    val want = images.where(col("status") === "O" && col("priority") === "1-URGENT").count()
    assert(got == want && got > 0)
  }

  test("find (or [#status=F] [#status=P]) | count-values priority") {
    val got = Shell.run(images, "find (or [#status=F] [#status=P]) | count-values priority")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = images.where(col("status") === "F" || col("status") === "P")
      .groupBy("priority").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want && got.nonEmpty)
  }

  test("within-cap pipeline stage filters by the cap") {
    val n = Shell.run(images, "within-cap 51.5074 -0.1278 5000 | count")
      .collect()(0).getLong(0)
    assert(n > 0 && n < images.count())
  }

  test("top by column") {
    val got = Shell.run(images, "top price 5")
      .select("image_id").collect().map(_.getLong(0)).toSeq
    val want = images.orderBy(col("price").desc, col("image_id")).limit(5)
      .select("image_id").collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("keyed query [#status]") {
    val got = Shell.run(images, "find [#status] | count").collect()(0).getLong(0)
    assert(got == images.count())
  }

  test("lambda stages: filter + map-to-pair match manual Column pipeline") {
    val images = Tables.images(spark, sfDir)
    val got = Shell.run(images,
      "find [#status=O] | filter {x -> (gt (get x price) 50000)} | " +
        "map {x -> (pair (get x image_id) (divide (get x price) 2))} | take 20",
      idCol = "first")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = images.where(col("status") === "O" && col("price") > 50000.0)
      .select(col("image_id").as("first"), (col("price") / 2.0).as("second"))
      .orderBy("first").limit(20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("lambda map to a scalar yields a single value column") {
    val images = Tables.images(spark, sfDir)
    val out = Shell.run(images, "map {x -> (clamp (divide (get x price) 1000) 0 100)}")
    assert(out.columns.toSeq == Seq("value"))
    val vs = out.collect().map(_.getDouble(0))
    assert(vs.forall(v => v >= 0.0 && v <= 100.0))
  }
}
