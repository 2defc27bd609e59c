package graft

import org.apache.spark.sql.functions._
import graft.ops.Geo

class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def d2(a: (Long, Long), b: (Long, Long)): Long = {
    val dlat = a._1 - b._1
    val dl = math.abs(a._2 - b._2)
    val dlon = math.min(dl, Geo.LonSpanMicro - dl)
    dlat * dlat + dlon * dlon
  }

  test("withinRadiusPairs: matches brute force, each pair exactly once") {
    // deterministic scatter incl. cell-boundary and near-pole points
    val pts = (1L to 60L).map { i =>
      (i, (i * 7919L) % 180000000L - 90000000L,
        (i * 104729L) % 360000000L - 180000000L)
    }
    val df = pts.toDF("id", "lat", "lon")
    val r = 5000000L
    val got = Geo.withinRadiusPairs(df, "id", "lat", "lon", r)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val want = (for {
      a <- pts; b <- pts if a._1 < b._1
      dd = d2((a._2, a._3), (b._2, b._3)) if dd <= r * r
    } yield (a._1, b._1, dd)).sorted.toSeq
    assert(got == want)
    assert(got.size == got.distinct.size)
  }

  test("withinRadiusPairs: antimeridian wraparound pair is found") {
    val df = Seq(
      (1L, 0L, -179500000L), // 0.5 deg west of the antimeridian
      (2L, 0L, 179500000L),  // 0.5 deg east -> 1 deg apart across it
      (3L, 0L, 0L)
    ).toDF("id", "lat", "lon")
    val got = Geo.withinRadiusPairs(df, "id", "lat", "lon", 2000000L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1000000L * 1000000L)))
  }

  test("withinRadiusPairs: rejects a radius that does not divide 360 deg") {
    val df = Seq((1L, 0L, 0L)).toDF("id", "lat", "lon")
    intercept[IllegalArgumentException] {
      Geo.withinRadiusPairs(df, "id", "lat", "lon", 7000000L)
    }
  }

  test("knnWithinRadius: ranks by distance then id, caps at k") {
    val df = Seq(
      (1L, 0L, 0L), (2L, 0L, 1000000L), (3L, 0L, 2000000L),
      (4L, 1000000L, 0L), (5L, 3000000L, 3000000L) // 5 is isolated
    ).toDF("id", "lat", "lon")
    val got = Geo.knnWithinRadius(df, "id", "lat", "lon", 2000000L, 2)
      .select("id", "rank", "neighbor").as[(Long, Long, Long)]
      .collect().toSet
    // point 1: nearest are 2 and 4 at equal distance -> id tiebreak
    assert(got.contains((1L, 1L, 2L)) && got.contains((1L, 2L, 4L)))
    assert(!got.exists(_._1 == 5L)) // isolated point absent
    assert(got.count(_._1 == 2L) == 2) // capped at k=2
  }

  test("hotspotGiStar: clustered cell flags hot, pole rows clip W") {
    // 6 points stacked in one interior cell, 1 isolated far away,
    // 1 at the south-pole row (cy = -90 -> W = 6, not 9)
    val pts = (1L to 6L).map(i => (i, 500000L + i, 500000L + i)) ++
      Seq((7L, 80000000L, 80000000L), (8L, -89500000L, 0L))
    val df = pts.toDF("id", "lat", "lon")
    val got = graft.ops.Geo.hotspotGiStar(df, "lat", "lon", 1000000L)
      .select("cy", "x", "w", "hotspot", "gi_micro")
      .as[(Long, Long, Long, Long, Long)].collect()
    val cluster = got.find(_._2 == 6L).get
    assert(cluster._4 == 1L, s"stacked cell must be hot, got $cluster")
    // against a near-empty world ANY occupied cell is statistically
    // dense (that is Gi* doing its job) — the ordering is the check
    assert(got.filter(_._2 == 1L).forall(_._5 < cluster._5))
    assert(got.find(_._1 == -90L).get._3 == 6L) // clipped pole weight
    assert(got.filter(_._1 != -90L).forall(_._3 == 9L))
  }

  test("hotspotGiStar: odd latitude cell count keeps polar cells in play") {
    // cellMicro = 4e6 -> 180e6/cell = 45 (odd): cy truly spans [-23, 22]
    // (floor form), where the old -(ny/2)..ny/2-1 = [-22, 21] dropped the
    // polar rows from every neighborhood. Pin: the south-pole cell is
    // present, participates in its own neighborhood (nsum >= own count),
    // and its clipped weight is 6.
    val pts = (1L to 5L).map(i => (i, -89900000L + i, i)) ++ // cy = -23
      Seq((6L, -86100000L, 0L)) ++                           // cy = -22
      (7L to 9L).map(i => (i, 10000000L + i, 10000000L + i)) // interior
    val df = pts.toDF("id", "lat", "lon")
    val got = graft.ops.Geo.hotspotGiStar(df, "lat", "lon", 4000000L)
      .select("cy", "x", "nsum", "w").as[(Long, Long, Long, Long)]
      .collect()
    val pole = got.find(_._1 == -23L)
    assert(pole.isDefined, s"polar cell missing from ${got.toSeq}")
    assert(pole.get._3 == 6L, // own 5 + the cy=-22 neighbor
      s"polar neighborhood must include itself and cy=-22: ${pole.get}")
    assert(pole.get._4 == 6L) // clipped bottom-row weight
    val nearPole = got.find(_._1 == -22L).get
    assert(nearPole._3 == 6L) // sees the 5 polar points + itself
  }

  test("assignFences: half-open bounds, multi-assign on overlap") {
    val fences = Seq(
      ("a", 0L, 10L, 0L, 10L),
      ("b", 5L, 15L, 5L, 15L))
      .toDF("fence_id", "lat_lo", "lat_hi", "lon_lo", "lon_hi")
    val pts = Seq((1L, 0L, 0L), (2L, 7L, 7L), (3L, 10L, 10L), (4L, 20L, 20L))
      .toDF("id", "lat", "lon")
    val got = Geo.assignFences(pts, "id", "lat", "lon", fences)
      .select("id", "fence_id").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "a"), (2L, "b"), (3L, "b")))
  }
}
