package graft.tools

/** Dev tool: authoritative query census — sizes of the queries /
  * oracle maps and the bench tiers, plus any drift between them. */
object Census {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries
    val o = graft.SparkEntry.oracleSql
    println(s"queries=${q.size} oracled=${q.keySet.intersect(o.keySet).size}")
    println(s"missingOracle=${(q.keySet -- o.keySet).toSeq.sorted}")
    val seriesTiers = (graft.SparkEntry.benchQueries ++
      graft.SparkEntry.benchQueriesV2).toSet
    // v3 is DERIVED (queries ∖ series tiers) so the union is
    // census-complete by construction; report sizes + any stale names
    val v3 = graft.SparkEntry.benchQueriesV3.toSet
    val bench = seriesTiers ++ v3
    println(s"benchTier=${bench.size} (series=${seriesTiers.size} v3=${v3.size})")
    println(s"inQueriesNotBench=${(q.keySet -- bench).toSeq.sorted}")
    println(s"inBenchNotQueries=${(bench -- q.keySet).toSeq.sorted}")
    println(s"oracleNotQueries=${(o.keySet -- q.keySet).toSeq.sorted}")
  }
}
