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

  /** All overlapping region pairs with their boolean areas (planar deg²):
    * (id_a, id_b, n_inter_rings, area_a, area_b, area_inter, area_union,
    * area_diff). Only pairs with area_inter > 0 are emitted.
    *
    * HOLE-AWARE (round 4, VERDICT r03 #5): every ring of both regions
    * participates — areas come from PolyBool.areasWithHoles' inclusion-
    * exclusion over the shell kernel, so a courtyard inside the overlap
    * correctly subtracts (previously ring 0 alone was read and holes were
    * silently ignored). `n_inter_rings` reports the SHELL-pair intersection's
    * ring count (the ring-structure part of the output stays shell-level,
    * the documented Foster gap); an overlap lying entirely inside a hole
    * yields area_inter <= 0 and the pair is filtered like any disjoint one.
    * @param regions (region_id, rings_lat, rings_lng) — ring lists, head =
    *                shell, tail = holes. */
  /** The SOUND overlapping-pair candidate join shared by both boolean
    * gates (scaladoc above; extracted round 5 so a soundness fix cannot
    * drift between them): ancestors-of-covering on one side vs plain
    * covering cells on the other, both orientations unioned, one row per
    * unordered candidate pair with both ring sets attached. */
  private def overlapPairs(regions: DataFrame): DataFrame = {
    val ancUdf = udf((c: Long) => (0 to S2.level(c)).map(l => S2.parent(c, l)))
    def plainSide(idAs: String, latAs: String, lngAs: String) = regions
      .select(col("region_id").as(idAs),
        col("rings_lat").as(latAs), col("rings_lng").as(lngAs),
        explode(col("cells")).as("cell"))
    def ancSide(idAs: String, latAs: String, lngAs: String) = regions
      .select(col("region_id").as(idAs),
        col("rings_lat").as(latAs), col("rings_lng").as(lngAs),
        explode(col("cells")).as("c0"))
      .select(col(idAs), col(latAs), col(lngAs), explode(ancUdf(col("c0"))).as("cell"))
    ancSide("id_a", "a_lat", "a_lng")
      .join(broadcast(plainSide("id_b", "b_lat", "b_lng")), "cell")
      .unionByName(plainSide("id_a", "a_lat", "a_lng")
        .join(broadcast(ancSide("id_b", "b_lat", "b_lng")), "cell"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  def overlapBooleans(regions: DataFrame): DataFrame = {
    val pairs = overlapPairs(regions)
    val boolUdf = udf((aLat: Seq[Seq[Double]], aLng: Seq[Seq[Double]],
                       bLat: Seq[Seq[Double]], bLng: Seq[Seq[Double]]) => {
      val a = aLat.indices.map(i => (aLat(i).toArray, aLng(i).toArray))
      val b = bLat.indices.map(i => (bLat(i).toArray, bLng(i).toArray))
      val shellInter = PolyBool.intersection(a.head._1, a.head._2, b.head._1, b.head._2)
      if (shellInter.isEmpty) null
      else {
        val (areaA, areaB, inter, uni, diff) = PolyBool.areasWithHoles(a, b)
        if (inter <= 0) null
        else (shellInter.length, areaA, areaB, inter, uni, diff)
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

  /** RING-STRUCTURE output of the booleans (round 5, VERDICT r04 #4): for
    * every overlapping pair and each op (inter/union/diff), the assembled
    * shell+hole ring counts and the measure THROUGH the ring output —
    * [[graft.core.PolyBool.booleanRings]] emits the actual boundary, holes
    * as CW rings, for hole-bearing inputs too. Gated over the RECTILINEAR
    * fixture family, whose golden recomputes rings/holes/area from a
    * coordinate-compressed occupancy grid (flood-fill components — a fully
    * independent algorithm). Pairs are the same sound covering join as
    * [[overlapBooleans]]; only pairs with a nonempty intersection emit
    * (candidate supersets stay invisible).
    * @return (id_a, id_b, op, n_outer, n_hole, area_q) — area_q =
    *         rint(area x 1e9), exact for the decimal fixtures. */
  def booleanRingStats(regions: DataFrame): DataFrame = {
    val pairs = overlapPairs(regions)
    val statsUdf = udf((aLat: Seq[Seq[Double]], aLng: Seq[Seq[Double]],
                        bLat: Seq[Seq[Double]], bLng: Seq[Seq[Double]]) => {
      val a = aLat.indices.map(i => (aLat(i).toArray, aLng(i).toArray))
      val b = bLat.indices.map(i => (bLat(i).toArray, bLng(i).toArray))
      val inter = PolyBool.booleanRings(a, b, 0)
      if (PolyBool.totalArea(inter) <= 0) null
      else {
        val ops = Seq("inter" -> inter,
          "union" -> PolyBool.booleanRings(a, b, 1),
          "diff" -> PolyBool.booleanRings(a, b, 2))
        ops.map { case (op, rings) =>
          (op,
            rings.count(r => PolyBool.signedArea(r.lat, r.lng) > 0),
            rings.count(r => PolyBool.signedArea(r.lat, r.lng) < 0),
            math.rint(PolyBool.totalArea(rings) * 1e9).toLong)
        }
      }
    })
    pairs
      .withColumn("r", statsUdf(col("a_lat"), col("a_lng"), col("b_lat"), col("b_lng")))
      .where(col("r").isNotNull)
      .select(col("id_a"), col("id_b"), explode(col("r")).as("s"))
      .select(col("id_a"), col("id_b"), col("s._1").as("op"),
        col("s._2").as("n_outer"), col("s._3").as("n_hole"),
        col("s._4").as("area_q"))
  }
}
