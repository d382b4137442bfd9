package graft

/** Shared reference implementation for the component-closure specs —
  * ONE driver-side union-find used by both ComponentsSpec (random
  * graphs) and LshSpec's l28 case (the real near-dup graph), so the
  * cross-check algorithm cannot diverge between them. */
object TestGraphs {

  /** node → min id of its connected component, for every node
    * appearing in `edges`. */
  def unionFindLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val minOfRoot = nodes.groupBy(find).map { case (r, ns) => r -> ns.min }
    nodes.map(n => n -> minOfRoot(find(n))).toMap
  }
}
