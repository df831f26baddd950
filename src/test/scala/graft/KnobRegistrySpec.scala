package graft

import org.scalatest.funsuite.AnyFunSuite

/** The session-knob registry ([[SessionTuning.Knobs]]) is the deployment
  * surface README.md's "Cluster deployment" section documents — this
  * spec pins the three together: the registry equals the declared key
  * constants, every registry key appears literally in README.md, AND a
  * source scan asserts no knob-convention key literal (graft.* /
  * spark.graft.*) exists outside the registry — so a new conf read
  * added anywhere in main source cannot ship undocumented (r13 verdict
  * task 9; scan added per r14 advice).
  */
class KnobRegistrySpec extends AnyFunSuite {

  private val codeKeys = Set(
    graft.operators.Sampling.PresentationKey,
    graft.functions.Quantiles.ApproxKey,
    graft.operators.Similarity.MaxCentroidsKey,
    graft.operators.Curation.ClassifierGateKey,
    graft.operators.Dedup.BloomMinScanBytesKey,
    graft.operators.Sampling.BroadcastMaxRowsKey,
    graft.operators.Sampling.PreRangeMinPairsKey)

  test("registry covers exactly the conf keys the code declares") {
    assert(SessionTuning.Knobs.keySet == codeKeys)
  }

  test("no knob-convention key literal exists outside the registry") {
    // The constants above are a hand-maintained list — this scan closes
    // the gap (r14 advice): every string literal in main source that
    // follows the knob naming convention (graft.* / spark.graft.*) must
    // be a registry key, so a new spark.conf read added anywhere ships
    // documented or fails here.
    import scala.jdk.CollectionConverters._
    // Segments start lowercase — excludes class-path literals like
    // "graft.functions.Kernels" (the codegen call target).
    val knobRe = """"((?:spark\.)?graft\.(?:[a-z][A-Za-z0-9]*\.)*[a-z][A-Za-z0-9]*)"""".r
    // Files.walk is documented must-close (it holds directory handles
    // open until the stream is closed) — r15 advice.
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get("src/main/scala"))
    val src =
      try walk.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .flatMap { p =>
          val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          knobRe.findAllMatchIn(text).map(_.group(1))
        }.toSet
      finally walk.close()
    // `graft.presentation` etc. — exclude non-conf literals if any ever
    // appear by requiring at least the full registry to be found...
    assert(codeKeys.subsetOf(src),
      s"registry keys missing from source scan: ${codeKeys -- src}")
    // ...and no convention-shaped literal outside it.
    val stray = src -- codeKeys
    assert(stray.isEmpty,
      s"knob-convention keys not in SessionTuning.Knobs: ${stray.toSeq.sorted}")
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
