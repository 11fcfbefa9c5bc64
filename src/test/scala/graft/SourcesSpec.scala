package graft

import graft.model.Tables
import graft.ops.Tiling
import graft.sources.{GeoJson, Mvt}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SourcesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("sources-test").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("GeoJSON: regions -> to-geojson -> parse round-trips rings") {
    val regions = Tables.regions(spark)
    val json = GeoJson.regionsToGeoJson(regions).select("geojson")
      .collect().map(_.getString(0))
    // wrap as a FeatureCollection document
    val fc = s"""{"type":"FeatureCollection","features":[${json.mkString(",")}]}"""
    import spark.implicits._
    val parsed = GeoJson.parseFeatureCollection(Seq(fc).toDF("json"), "json")
    val got = parsed.select("feature_id", "geom_type", "rings_lat", "rings_lng")
      .collect().map(r => (r.getString(0),
        (r.getSeq[scala.collection.Seq[Double]](2).map(_.toSeq),
          r.getSeq[scala.collection.Seq[Double]](3).map(_.toSeq)))).toMap
    val want = regions.select("region_id", "rings_lat", "rings_lng")
      .collect().map(r => (r.getString(0),
        (r.getSeq[scala.collection.Seq[Double]](1).map(_.toSeq),
          r.getSeq[scala.collection.Seq[Double]](2).map(_.toSeq)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(v == want(k), s"region $k") }
  }

  test("GeoJSON: GeometryCollection flattens to typed member rows; empty/nested honest") {
    import spark.implicits._
    val fc = """{"type":"FeatureCollection","features":[
      {"type":"Feature","id":"g1","properties":{},
       "geometry":{"type":"GeometryCollection","geometries":[
         {"type":"Point","coordinates":[1.0,2.0]},
         {"type":"LineString","coordinates":[[0.0,0.0],[1.0,1.0]]},
         {"type":"GeometryCollection","geometries":[]}]}},
      {"type":"Feature","id":"g2","properties":{},
       "geometry":{"type":"GeometryCollection","geometries":[]}},
      {"type":"Feature","id":"p1","properties":{},
       "geometry":{"type":"Point","coordinates":[3.0,4.0]}}]}"""
    val parsed = GeoJson.parseFeatureCollection(Seq(fc).toDF("json"), "json")
    val rows = parsed.select("feature_id", "geom_type", "member_idx", "lat", "lng")
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
    // g1 flattens to its 3 members in order; the nested collection member
    // keeps the honest null-geometry dispatch
    val g1 = rows.filter(_._1 == "g1").sortBy(_._3)
    assert(g1.map(r => (r._2, r._3)).toSeq ===
      Seq(("Point", 0), ("LineString", 1), ("GeometryCollection", 2)))
    assert(g1(0)._4 == 2.0) // [lng, lat] order
    assert(g1(2)._4.isNaN)  // nested member: null geometry
    // the EMPTY collection contributes no rows
    assert(!rows.exists(_._1 == "g2"))
    // plain features carry a null member_idx
    val p1 = rows.filter(_._1 == "p1")
    assert(p1.length == 1 && p1(0)._3 == -1 && p1(0)._4 == 4.0)
  }

  test("GeoJSON: point features parse with lng/lat order") {
    import spark.implicits._
    val fc = """{"type":"FeatureCollection","features":[
      {"type":"Feature","id":"p1","properties":{"kind":"bench"},
       "geometry":{"type":"Point","coordinates":[-0.12434,51.53531]}}]}"""
    val row = GeoJson.parseFeatureCollection(Seq(fc).toDF("json"), "json").collect()(0)
    assert(row.getAs[String]("feature_id") == "p1")
    assert(row.getAs[Double]("lat") == 51.53531)
    assert(row.getAs[Double]("lng") == -0.12434)
    assert(row.getAs[Map[String, String]]("properties")("kind") == "bench")
  }

  test("MVT: encoded point layer decodes to the same features") {
    val feats = Seq(
      Mvt.PointFeature(Mvt.featureId(0, "graft/image", 42L), 100, 200, Seq("kind" -> "img")),
      Mvt.PointFeature(Mvt.featureId(0, "graft/image", 43L), 4000, 10))
    val blob = Mvt.encodePointLayer("images", feats)

    // tile -> layer
    val tileFields = Mvt.decodeFields(blob)
    val layers = tileFields.collect { case (3, Right(b)) => b }
    assert(layers.length == 1)
    val lf = Mvt.decodeFields(layers.head)
    assert(lf.collect { case (1, Right(b)) => new String(b, "UTF-8") } == Seq("images"))
    assert(lf.collect { case (15, Left(v)) => v } == Seq(2L)) // version
    assert(lf.collect { case (5, Left(v)) => v } == Seq(4096L)) // extent
    val featureBlobs = lf.collect { case (2, Right(b)) => b }
    assert(featureBlobs.length == 2)
    val f0 = Mvt.decodeFields(featureBlobs.head)
    assert(f0.collect { case (1, Left(id)) => id } == Seq(Mvt.featureId(0, "graft/image", 42L)))
    assert(f0.collect { case (3, Left(t)) => t } == Seq(1L)) // POINT
    val geom = f0.collect { case (4, Right(b)) => b }.head
    // geometry: command varint then zigzag dx, dy
    val g = Mvt.decodeFields(Array[Byte]()) // not a message; decode manually:
    def varints(b: Array[Byte]): Seq[Long] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var i = 0
      while (i < b.length) {
        var v = 0L; var s = 0
        while ({ val x = b(i); i += 1; v |= (x & 0x7fL) << s; s += 7; (x & 0x80) != 0 }) ()
        out += v
      }
      out.toSeq
    }
    val vs = varints(geom)
    assert(vs(0) == ((1 << 3) | 1)) // MoveTo count 1
    def unzig(v: Long): Long = (v >>> 1) ^ -(v & 1)
    assert(unzig(vs(1)) == 100 && unzig(vs(2)) == 200)
  }

  test("MVT sink: per-tile blobs with deterministic ids and counts") {
    val images = Tables.images(spark, "/root/testdata/sf0.001")
    val tiles = Tiling.mvtPointTiles(images, 12, "images")
    val rows = tiles.collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_features")).sum
    assert(total == images.count())
    // blob parses and feature count matches n_features on the largest tile
    val big = rows.maxBy(_.getAs[Long]("n_features"))
    val layers = Mvt.decodeFields(big.getAs[Array[Byte]]("mvt")).collect { case (3, Right(b)) => b }
    val nFeats = Mvt.decodeFields(layers.head).count { case (2, Right(_)) => true; case _ => false }
    assert(nFeats == big.getAs[Long]("n_features"))
    // deterministic: re-encode equals
    val again = Tiling.mvtPointTiles(images, 12, "images").collect()
      .find(r => r.getAs[Long]("x") == big.getAs[Long]("x") &&
        r.getAs[Long]("y") == big.getAs[Long]("y")).get
    assert(java.util.Arrays.equals(
      again.getAs[Array[Byte]]("mvt"), big.getAs[Array[Byte]]("mvt")))
  }

  test("MVT line geometry: hand-computed command sequence") {
    // (1,2) -> (3,4): MoveTo(1,1) zz(1) zz(2), LineTo(1,2) zz(2) zz(2)
    val g = Mvt.lineGeometry(Array(1, 3), Array(2, 4))
    assert(g.toSeq == Seq[Byte](9, 2, 4, 10, 4, 4))
  }

  test("MVT polygon geometry: hand-computed command sequence with ClosePath") {
    // ring (0,0) (10,0) (10,10): MoveTo, LineTo x2, ClosePath
    val g = Mvt.polygonGeometry(Seq((Array(0, 10, 10), Array(0, 0, 10))))
    assert(g.toSeq == Seq[Byte](9, 0, 0, 18, 20, 0, 0, 20, 15))
  }

  test("MVT polygon cursor persists across rings within a feature") {
    val g = Mvt.polygonGeometry(Seq(
      (Array(0, 10), Array(0, 0)),
      (Array(12, 13), Array(1, 1))))
    // second ring's MoveTo is relative to (10,0): dx=2, dy=1
    def varints(b: Array[Byte]): Seq[Long] = {
      var i = 0
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (i < b.length) {
        var v = 0L; var s = 0
        while ({ val x = b(i); i += 1; v |= (x & 0x7fL) << s; s += 7; (x & 0x80) != 0 }) ()
        out += v
      }
      out.toSeq
    }
    def unzig(v: Long): Long = (v >>> 1) ^ -(v & 1)
    val vs = varints(g)
    // [MoveTo,0,0, LineTo(1),20,0, ClosePath, MoveTo,dx,dy, LineTo(1)...,ClosePath]
    assert(vs(6) == 15)                      // first ClosePath
    assert(unzig(vs(8)) == 2 && unzig(vs(9)) == 1)
  }

  test("GeoJSON breadth: LineString/MultiPoint/MultiPolygon parse + areas inversion") {
    import spark.implicits._
    val parsed = GeoJson.parseFeatureCollection(
      Seq(graft.model.Synth.geojsonFullFixture).toDF("json"), "json")
    val byId = parsed.collect().map(r => r.getAs[String]("feature_id") -> r).toMap
    assert(byId("line-path-0000").getAs[String]("geom_type") == "LineString")
    assert(byId("line-path-0000").getAs[scala.collection.Seq[Double]]("path_lat").length ==
      graft.model.Synth.paths(0).lats.length)
    assert(byId("mp-0").getAs[scala.collection.Seq[Double]]("points_lat").length == 3)
    assert(byId("mpoly-12").getAs[scala.collection.Seq[scala.collection.Seq[scala.collection.Seq[Double]]]]("polys_lat").length == 2)
    val areas = GeoJson.geojsonAreas(parsed).collect()
      .map(r => (r.getAs[String]("feature_id"), r.getAs[Int]("poly_idx")) -> r).toMap
    // the reversed region-0 shell must be flagged + normalized back
    val rev = areas(("poly-rev", 0))
    val r0 = graft.model.Synth.regions(0).rings(0)
    val expectCw = graft.core.Geo.shoelaceSigned(r0._1.reverse, r0._2.reverse) < 0
    assert(rev.getAs[Boolean]("inverted") == expectCw)
    if (expectCw)
      assert(rev.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("rings_lat")(0).toSeq == r0._1.toSeq)
    assert(areas(("mpoly-12", 1)) != null)
  }

  test("map-geometries: type-dispatched rewrite leaves other types untouched") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val parsed = GeoJson.parseFeatureCollection(
      Seq(graft.model.Synth.geojsonFullFixture).toDF("json"), "json")
    val shifted = GeoJson.mapGeometries(parsed,
      pointFn = Some((la, lo) => (la + 1.0, lo)),
      pathFn = Some((la, lo) => (reverse(la), reverse(lo))))
    val byId = shifted.collect().map(r => r.getAs[String]("feature_id") -> r).toMap
    // paths reversed
    val p0 = graft.model.Synth.paths(0)
    assert(byId("line-path-0000").getAs[scala.collection.Seq[Double]]("path_lat").head
      == p0.lats.last)
    // polygons untouched (no areaFn)
    val r0 = graft.model.Synth.regions(0).rings(0)
    assert(byId("poly-rev").getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("rings_lat")(0).length
      == r0._1.length)
  }

  test("map-geometries: areaFn rewrites Polygon AND each MultiPolygon part") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val parsed = GeoJson.parseFeatureCollection(
      Seq(graft.model.Synth.geojsonFullFixture).toDF("json"), "json")
    val shifted = GeoJson.mapGeometries(parsed,
      areaFn = Some((la, lo) =>
        (transform(la, r => transform(r, v => v + 10.0)), lo)))
    val byId = shifted.collect().map(r => r.getAs[String]("feature_id") -> r).toMap
    val r0 = graft.model.Synth.regions(0).rings(0)
    // Polygon path: first vertex of the (reversed-in-fixture) shell shifted
    assert(byId("poly-rev").getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("rings_lat")(0).head
      == r0._1.last + 10.0)
    // MultiPolygon path (ADVICE r02: was a silent no-op): both parts shifted
    val mp = byId("mpoly-12")
      .getAs[scala.collection.Seq[scala.collection.Seq[scala.collection.Seq[Double]]]]("polys_lat")
    assert(mp(0)(0).head == graft.model.Synth.regions(1).rings(0)._1.head + 10.0)
    assert(mp(1)(0).head == graft.model.Synth.regions(2).rings(0)._1.head + 10.0)
    // longitudes untouched
    val mpLng = byId("mpoly-12")
      .getAs[scala.collection.Seq[scala.collection.Seq[scala.collection.Seq[Double]]]]("polys_lng")
    assert(mpLng(0)(0).head == graft.model.Synth.regions(1).rings(0)._2.head)
    // non-area rows pass through
    assert(byId("line-path-0000").getAs[scala.collection.Seq[Double]]("path_lat").head
      == graft.model.Synth.paths(0).lats.head)
  }

  test("MultiLineString: parse + pathFn rewrites each part") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val parsed = GeoJson.parseFeatureCollection(
      Seq(graft.model.Synth.geojsonFullFixture).toDF("json"), "json")
    val byId = parsed.collect().map(r => r.getAs[String]("feature_id") -> r).toMap
    val ml = byId("mline-56")
    assert(ml.getAs[String]("geom_type") == "MultiLineString")
    val lats = ml.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("paths_lat")
    assert(lats.length == 2)
    assert(lats(0).toSeq == graft.model.Synth.paths(5).lats.toSeq)
    assert(lats(1).toSeq == graft.model.Synth.paths(6).lats.toSeq)
    // pathFn applies per part (the MultiPolygon-areaFn discipline)
    val shifted = GeoJson.mapGeometries(parsed,
      pathFn = Some((la, lo) => (reverse(la), lo)))
    val byId2 = shifted.collect().map(r => r.getAs[String]("feature_id") -> r).toMap
    val lats2 = byId2("mline-56")
      .getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("paths_lat")
    assert(lats2(0).head == graft.model.Synth.paths(5).lats.last)
    assert(lats2(1).head == graft.model.Synth.paths(6).lats.last)
    // longitudes untouched by this pathFn
    assert(byId2("mline-56")
      .getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("paths_lng")(0).toSeq
      == graft.model.Synth.paths(5).lngs.toSeq)
    // plain LineString rows also rewritten by the same call
    assert(byId2("line-path-0000").getAs[scala.collection.Seq[Double]]("path_lat").head
      == graft.model.Synth.paths(0).lats.last)
  }
}
