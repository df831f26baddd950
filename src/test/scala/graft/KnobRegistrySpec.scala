package graft

import org.scalatest.funsuite.AnyFunSuite

/** The session-knob registry ([[SessionTuning.Knobs]]) is the deployment
  * surface README.md's "Cluster deployment" section documents — this
  * spec pins the three together: every conf key the code reads is in
  * the registry, and every registry key appears literally in README.md,
  * so a new knob cannot ship undocumented (r13 verdict task 9).
  */
class KnobRegistrySpec extends AnyFunSuite {

  private val codeKeys = Set(
    graft.operators.Sampling.PresentationKey,
    graft.functions.Quantiles.ApproxKey,
    graft.operators.Similarity.MaxCentroidsKey,
    graft.operators.Curation.ClassifierGateKey,
    graft.operators.Dedup.BloomMinScanBytesKey)

  test("registry covers exactly the conf keys the code declares") {
    assert(SessionTuning.Knobs.keySet == codeKeys)
  }

  test("every registry knob is documented in README.md") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val undocumented = SessionTuning.Knobs.keySet.filterNot(readme.contains)
    assert(undocumented.isEmpty,
      s"knobs missing from README.md: ${undocumented.toSeq.sorted.mkString(", ")}")
    assert(readme.contains("## Cluster deployment"))
  }

  test("every registry knob carries a non-empty deployment description") {
    assert(SessionTuning.Knobs.values.forall(_.trim.nonEmpty))
  }
}
