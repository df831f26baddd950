package graft

import org.apache.spark.sql.functions._

import graft.operators.{Datasets, Entities}

/** rw_entities — the deterministic re-expression of the reference's
  * name/org detection (prompt_parsing.py:165-187). The fixture pins the
  * adjacent-cap-pair heuristic's edges; the corpus test proves the
  * inject→detect round trip: every name the p24 violation injector
  * plants (and that survives the length-violation truncation) is found
  * by the detection side, and no name is "detected" where none fully
  * survives.
  */
class EntitiesSpec extends SparkSpec {
  import spark.implicits._

  private def detect(texts: (Long, String)*) =
    Entities.withEntityCols(texts.toDF("doc_id", "text"), col("text"))
      .select("doc_id", "n_person", "person_first", "injected_name",
        "n_honorific", "honorific_first", "n_org", "org_first")
      .as[(Long, Long, String, String, Long, String, Long, String)]
      .collect().sortBy(_._1)

  test("adjacent-cap pairs, honorifics, org suffixes, punctuation strip") {
    val rows = detect(
      1L -> "Dr. Alice met Mr. Bob Stone at Acme Corp. and Beta LLC",
      2L -> "Shout out to John Doe!",
      3L -> "the sky is blue and X Y are single letters",
      4L -> "",
      5L -> "Solo")
    val r1 = rows(0)
    // persons: (Dr Alice)(Mr Bob)(Bob Stone)(Acme Corp)(Beta LLC)
    assert(r1._2 == 5L && r1._3 == "Dr Alice")
    assert(r1._5 == 2L && r1._6 == "Dr Alice") // dr→Alice, mr→Bob
    assert(r1._7 == 2L && r1._8 == "Acme Corp")
    val r2 = rows(1)
    assert(r2._2 == 1L && r2._3 == "John Doe" && r2._4 == "John Doe")
    val r3 = rows(2)
    assert(r3._2 == 0L && r3._3 == "" && r3._4 == "")
    assert(rows(3)._2 == 0L && rows(4)._2 == 0L)
  }

  test("every surviving p24 injected name is detected, none invented") {
    val neg = Datasets.p24Negatives(spark, sfDir)
    val det = Entities.rwEntities(spark, sfDir)
    val joined = neg.join(det, "doc_id")
      .select(col("doc_id"), col("rejected"), col("injected_name"))
      .as[(Long, String, String)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (id, rejected, inj) =>
      // no trailing "!" in the probe: truncation may cut between the
      // name and the bang, and the full name alone is detectable
      val survived = Datasets.Names
        .find(n => rejected.contains(s"Shout out to $n"))
      survived match {
        case Some(name) =>
          assert(inj == name, s"doc $id: planted '$name' not detected ('$inj')")
        case None =>
          assert(inj.isEmpty, s"doc $id: detected '$inj' with no surviving name")
      }
    }
  }
}
