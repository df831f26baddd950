package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 is the coverage checklist the audit reads line by line —
  * it and the live `SparkEntry.queries` registry must never drift (round 5
  * shipped rw_report in the registry but not the checklist). This spec
  * pins the two lists to exact set equality, so adding an operator without
  * its §2 row (or a §2 claim without an implementation) fails the build.
  */
class SurveyDriftSpec extends AnyFunSuite {

  /** §2 keys = backticked first-column cells of the three §2 tables
    * (between the "## §2" heading and the next "## §" heading; the
    * streaming section lists components as prose bullets, not keys). */
  private def surveyKeys: Set[String] = {
    val lines = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get("SURVEY.md")).asScala
    val s2 = lines
      .dropWhile(l => !l.startsWith("## §2"))
      .drop(1)
      .takeWhile(l => !l.startsWith("## §"))
    val key = """^\|\s*`([a-z0-9_]+)`\s*\|""".r
    s2.flatMap(l => key.findFirstMatchIn(l).map(_.group(1))).toSet
  }

  test("SparkEntry.queries keys == SURVEY.md §2 rows") {
    val registry = SparkEntry.queries.keySet
    val survey = surveyKeys
    assert(survey.nonEmpty, "SURVEY.md §2 parse came back empty")
    val unlisted = registry -- survey
    val unimplemented = survey -- registry
    assert(unlisted.isEmpty,
      s"registry keys missing a SURVEY §2 row: ${unlisted.toSeq.sorted.mkString(", ")}")
    assert(unimplemented.isEmpty,
      s"SURVEY §2 rows without an implementation: ${unimplemented.toSeq.sorted.mkString(", ")}")
  }

  test("every oracleSql key has a queries entry") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty,
      s"oracleSql keys without a query: ${dangling.toSeq.sorted.mkString(", ")}")
  }
}
