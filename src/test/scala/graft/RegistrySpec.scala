package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry consistency — the driver contract's invariants, pinned so a
  * registration slip (a query without an oracle, an oracle for a
  * renamed query, a module colliding with another's name) fails the
  * suite instead of silently weakening the correctness gate.
  */
class RegistrySpec extends AnyFunSuite {

  test("every registered query has oracle SQL and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("module maps never collide on a query name") {
    // SparkEntry composes the module maps with ++, where a duplicate
    // key silently REPLACES the earlier registration — this spec makes
    // a cross-module name collision loud instead.
    val modules: Seq[(String, Map[String, _])] = Seq(
      "Pipeline" -> ops.Pipeline.queries,
      "TextAnalysis" -> ops.TextAnalysis.queries,
      "Dedup" -> ops.Dedup.queries,
      "Similarity" -> ops.Similarity.queries,
      "Relational" -> ops.Relational.queries,
      "Sessions" -> ops.Sessions.queries,
      "AsOf" -> ops.AsOf.queries,
      "AllTypes" -> ops.AllTypes.queries,
      "Multimodal" -> ops.Multimodal.queries,
      "SetOps" -> ops.SetOps.queries,
      "Layout" -> ops.Layout.queries)
    val owners = modules.flatMap { case (m, qs) => qs.keys.map(_ -> m) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val dups = owners.filter(_._2.size > 1)
    assert(dups.isEmpty, s"query names registered by multiple modules: $dups")
    assert(modules.map(_._2.size).sum == SparkEntry.queries.size)
  }

  test("registry size matches the documented count") {
    // SURVEY.md §2.0 claims the registry size; keep the claim honest.
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val m = """(\d+) registered queries, (\d+) with\s*\noracle SQL""".r
      .findFirstMatchIn(survey)
    assert(m.isDefined, "SURVEY.md registry-count claim not found")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"SURVEY.md claims ${m.get.group(1)} queries, registry has ${SparkEntry.queries.size}")
    assert(m.get.group(2).toInt == SparkEntry.oracleSql.size)
  }
}
