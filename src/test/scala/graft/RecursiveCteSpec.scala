package graft

import graft.queries.{GraphQueries, SqlSurface}

class RecursiveCteSpec extends SparkSpec {

  test("q143 recursive CTE executes and agrees with the join-unrolled BFS") {
    val reach = SqlSurface.queries("q143_recursive_reach")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val bfs = GraphQueries.queries("q86_bfs")(spark, sf)
      .collect().map { r =>
        val id = r.getLong(1)
        val node = if (r.getString(0) == "customer") id * 2 else id * 2 + 1
        (node, r.getInt(2))
      }.toSet
    assert(reach == bfs, s"recursive reach diverges from BFS: " +
      s"only-reach=${(reach -- bfs).take(5)} only-bfs=${(bfs -- reach).take(5)}")
  }
}
