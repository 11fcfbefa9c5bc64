package graft.ops

import graft.core.{PolyBool, S2}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** General polygon booleans as a distributed pairwise operator (SURVEY §2.8;
  * the reference's Foster booleans, geometry/foster.go — here the
  * Greiner-Hormann kernel in core/PolyBool over the planar chart).
  *
  * Candidate pairs come from a SOUND covering equi-join: two regions that
  * overlap share a point p, so the covering cell of one side containing p is
  * an ancestor-or-equal of the other side's cell containing p. Joining
  * ancestors-of-covering on ONE side against plain covering cells on the
  * other, unioned with the swapped orientation, catches both directions —
  * the same shape as the kNN ancestor stab. (Exploding full ancestor chains
  * on BOTH sides would be sound too, but every region then emits its level-0
  * face cell on both sides and the join degenerates to all same-face pairs;
  * review r03.) Refine = the boolean kernel itself (a disjoint candidate
  * pair yields an empty intersection and is filtered).
  */
object Booleans {

  /** All overlapping region pairs with their boolean areas (planar deg²,
    * signed-sum semantics — holes subtract):
    * (id_a, id_b, n_inter_rings, area_a, area_b, area_inter, area_union,
    * area_diff). Only pairs with area_inter > 0 are emitted.
    * @param regions (region_id, rings_lat, rings_lng) — shell rings. */
  def overlapBooleans(regions: DataFrame): DataFrame = {
    val ancUdf = udf((c: Long) => (0 to S2.level(c)).map(l => S2.parent(c, l)))
    def plainSide(idAs: String, latAs: String, lngAs: String) = regions
      .select(col("region_id").as(idAs),
        col("rings_lat")(0).as(latAs), col("rings_lng")(0).as(lngAs),
        explode(col("cells")).as("cell"))
    def ancSide(idAs: String, latAs: String, lngAs: String) = regions
      .select(col("region_id").as(idAs),
        col("rings_lat")(0).as(latAs), col("rings_lng")(0).as(lngAs),
        explode(col("cells")).as("c0"))
      .select(col(idAs), col(latAs), col(lngAs), explode(ancUdf(col("c0"))).as("cell"))
    val pairs = ancSide("id_a", "a_lat", "a_lng")
      .join(broadcast(plainSide("id_b", "b_lat", "b_lng")), "cell")
      .unionByName(plainSide("id_a", "a_lat", "a_lng")
        .join(broadcast(ancSide("id_b", "b_lat", "b_lng")), "cell"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val boolUdf = udf((aLat: Seq[Double], aLng: Seq[Double],
                       bLat: Seq[Double], bLng: Seq[Double]) => {
      val (al, ag) = (aLat.toArray, aLng.toArray)
      val (bl, bg) = (bLat.toArray, bLng.toArray)
      val inter = PolyBool.intersection(al, ag, bl, bg)
      if (inter.isEmpty) null
      else {
        val areaInter = PolyBool.totalArea(inter)
        if (areaInter <= 0) null
        else (inter.length,
          math.abs(PolyBool.signedArea(al, ag)),
          math.abs(PolyBool.signedArea(bl, bg)),
          areaInter,
          PolyBool.totalArea(PolyBool.union(al, ag, bl, bg)),
          PolyBool.totalArea(PolyBool.difference(al, ag, bl, bg)))
      }
    })
    pairs
      .withColumn("r", boolUdf(col("a_lat"), col("a_lng"), col("b_lat"), col("b_lng")))
      .where(col("r").isNotNull)
      .select(col("id_a"), col("id_b"),
        col("r._1").as("n_inter_rings"),
        col("r._2").as("area_a"), col("r._3").as("area_b"),
        col("r._4").as("area_inter"), col("r._5").as("area_union"),
        col("r._6").as("area_diff"))
  }
}
