package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GeoJSON import/export (SURVEY.md §2.1 GeoJSON import, §2.3 to-geojson;
  * reference api/functions/geojson.go:18-145) as from_json/to_json over a
  * typed schema — fully declarative, no hand parser.
  *
  * Supported geometry: Point and Polygon (rings of [lng, lat] positions, as
  * the GeoJSON spec orders coordinates). Properties come through as a map. */
object GeoJson {

  /** Schema of a GeoJSON FeatureCollection with polygon/point geometry.
    * `coordinates` is kept as a JSON string and re-parsed per geometry type
    * (GeoJSON coordinates are heterogeneous by type, which a single static
    * struct cannot express). */
  val featureSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("features", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("id", StringType),
      StructField("properties", MapType(StringType, StringType)),
      StructField("geometry", StructType(Seq(
        StructField("type", StringType),
        StructField("coordinates", StringType))))))))))

  /** Parse a column of GeoJSON FeatureCollection documents into one row per
    * feature: (feature_id, geom_type, properties, rings_lat, rings_lng,
    * lat, lng). Polygon rings are converted from [lng,lat] order. */
  def parseFeatureCollection(df: DataFrame, jsonCol: String): DataFrame = {
    val parsed = df.withColumn("_fc",
        from_json(col(jsonCol), featureSchema, Map("allowUnquotedFieldNames" -> "false")))
      .withColumn("_f", explode(col("_fc.features")))
    val coords = col("_f.geometry.coordinates")
    val polyRings = from_json(coords, ArrayType(ArrayType(ArrayType(DoubleType))))
    val point = from_json(coords, ArrayType(DoubleType))
    parsed.select(
      col("_f.id").as("feature_id"),
      col("_f.geometry.type").as("geom_type"),
      col("_f.properties").as("properties"),
      when(col("_f.geometry.type") === "Polygon",
        transform(polyRings, ring => transform(ring, p => p(1)))).as("rings_lat"),
      when(col("_f.geometry.type") === "Polygon",
        transform(polyRings, ring => transform(ring, p => p(0)))).as("rings_lng"),
      when(col("_f.geometry.type") === "Point", point(1)).as("lat"),
      when(col("_f.geometry.type") === "Point", point(0)).as("lng"))
  }

  /** Render point rows as a GeoJSON Feature per row (to-geojson). */
  def pointsToGeoJson(df: DataFrame, idCol: String, latCol: String, lngCol: String): DataFrame =
    df.withColumn("geojson", to_json(struct(
      lit("Feature").as("type"),
      col(idCol).cast("string").as("id"),
      struct(lit("Point").as("type"),
        array(col(lngCol), col(latCol)).as("coordinates")).as("geometry"))))

  /** Render a regions table (rings_lat/rings_lng arrays) as Polygon
    * features. */
  def regionsToGeoJson(regions: DataFrame): DataFrame =
    regions.withColumn("geojson", to_json(struct(
      lit("Feature").as("type"),
      col("region_id").as("id"),
      struct(lit("Polygon").as("type"),
        zip_with(col("rings_lng"), col("rings_lat"),
          (lngs, lats) => zip_with(lngs, lats, (x, y) => array(x, y)))
          .as("coordinates")).as("geometry"))))

  /** Load a GeoJSON file as features (parse-geojson-file). */
  def readFile(spark: SparkSession, path: String): DataFrame =
    parseFeatureCollection(
      spark.read.option("wholetext", "true").text(path).toDF("json"), "json")
}
