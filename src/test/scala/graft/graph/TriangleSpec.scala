package graft.graph

import graft.SparkTestBase

class TriangleSpec extends SparkTestBase {
  import spark.implicits._

  test("K4 plus a pendant: exact triangle counts and lcc") {
    // K4 on a,b,c,d (each node in 3 triangles, lcc 1) + pendant p on d
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
      ("d", "p")
    ).toDF("src", "dst")
    val r = LinkGraph.triangleStats(edges, "src", "dst")
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r("a") == ((3L, 3L, 1.0)))
    assert(r("b") == ((3L, 3L, 1.0)))
    assert(r("c") == ((3L, 3L, 1.0)))
    assert(r("d") == ((4L, 3L, 0.5))) // 3 triangles over C(4,2)=6 wedges
    assert(r("p") == ((1L, 0L, 0.0)))
  }

  test("each triangle counted exactly once regardless of edge direction/duplication") {
    // same triangle given twice with reversed directions — symmetrize+distinct dedups
    val edges = Seq(("x", "y"), ("y", "z"), ("z", "x"), ("y", "x"), ("z", "y"), ("x", "z"))
      .toDF("src", "dst")
    val r = LinkGraph.triangleStats(edges, "src", "dst")
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getDouble(3))).toSet
    assert(r == Set((2L, 1L, 1.0)))
  }

  test("a triangle-free star has zero triangles everywhere") {
    val edges = (1 to 5).map(i => ("hub", s"leaf$i")).toDF("src", "dst")
    val r = LinkGraph.triangleStats(edges, "src", "dst").collect()
    assert(r.forall(_.getLong(2) == 0L))
    assert(r.forall(_.getDouble(3) == 0.0))
  }

  test("hub skew: oriented out-degree of the hub stays bounded by rank, not degree") {
    // a 50-leaf hub: every hub edge orients AWAY from leaves (deg 1 < deg 50),
    // so the hub contributes ZERO wedge fan-out — the scale property
    val edges = (1 to 50).map(i => (s"leaf$i", "hub")).toDF("src", "dst")
    val tri = LinkGraph.triangleStats(edges, "src", "dst")
    assert(tri.filter(tri("n_tri") > 0).count() == 0)
  }
}
