package graft

import graft.ops.Sampling
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Geo-diversity cap (capPerTile) vs brute force: quota, survivor choice,
  * determinism. */
class GeoCapSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("geocap-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def md5hex8(id: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    d.take(4).map(b => f"${b & 0xff}%02x").mkString
  }

  test("capPerTile equals brute force on sf0.001 images (z15 quota 5, z12 quota 3)") {
    val pts = graft.model.Tables.images(spark, "/root/testdata/sf0.001")
      .select("image_id", "lat", "lng")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    for ((zoom, quota) <- Seq((15, 5), (12, 3))) {
      import spark.implicits._
      val got = Sampling.capPerTile(pts.toDF("image_id", "lat", "lng"), zoom, quota)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // independent: own tile math + own md5 ranking
      val want = pts.map { p =>
        val (x, y) = graft.core.Tiles.tileFromLatLng(p._2, p._3, zoom)
        (p._1, x, y)
      }.groupBy(t => (t._2, t._3)).flatMap { case (_, rows) =>
        rows.sortBy(r => (md5hex8(r._1), r._1)).take(quota)
      }.toSet
      assert(got === want, s"z=$zoom quota=$quota")
      // the hot-cap tiles must actually be capped
      assert(got.size < pts.size, s"z=$zoom quota=$quota: nothing capped — degenerate")
      assert(got.groupBy(t => (t._2, t._3)).values.map(_.size).max === quota,
        s"z=$zoom quota=$quota: no tile reached the quota — degenerate")
    }
  }

  test("survivors are the lowest md5 draws, not the lowest ids") {
    import spark.implicits._
    // 10 colocated points: one z12 tile; quota 4
    val pts = Seq.tabulate(10)(i => (100L + i, 51.5074, -0.1278)).toDF("image_id", "lat", "lng")
    val got = Sampling.capPerTile(pts, 12, 4).collect().map(_.getLong(0)).toSet
    val want = (100L to 109L).sortBy(id => (md5hex8(id), id)).take(4).toSet
    assert(got === want)
    assert(got !== (100L to 103L).toSet, "md5 ranking degenerated to id order")
  }
}
