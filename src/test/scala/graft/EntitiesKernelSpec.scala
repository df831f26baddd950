package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Datasets, Entities}

/** Differential pin for the rw_entities native kernel
  * (Kernels.entityStats) against the original HOF formulation it
  * replaced (Entities.withEntityColsHof) — the dd_winnow/synonymAug
  * precedent: the HOF form is what the DuckDB oracle mirrors, so
  * kernel == HOF on every input keeps kernel and oracle in lockstep. */
class EntitiesKernelSpec extends SparkSpec {
  import spark.implicits._

  private val outCols = Seq("n_person", "person_first", "injected_name",
    "n_honorific", "honorific_first", "n_org", "org_first")

  private def both(df: DataFrame): (Seq[Seq[Any]], Seq[Seq[Any]]) = {
    def run(f: (DataFrame, org.apache.spark.sql.Column) => DataFrame) =
      f(df, col("text")).select(("text" +: outCols).map(col): _*)
        .collect().toSeq.map(_.toSeq).sortBy(_.head.toString)
    (run(Entities.withEntityCols), run(Entities.withEntityColsHof))
  }

  test("kernel is bit-identical to the HOF form on the real corpus") {
    // (the synthetic docs are lowercase — zero-candidate rows are the
    // EXPECTED result here; the negatives test below covers firing)
    val docs = Tables.documents(spark, sfDir).select(col("text"))
    val (k, h) = both(docs)
    assert(k.nonEmpty && k == h)
  }

  test("kernel matches HOF on the negatives frame incl. injected names") {
    val neg = Datasets.negativesFrame(spark, sfDir)
      .select(col("rejected").as("text"))
    val (k, h) = both(neg)
    assert(k.nonEmpty && k == h)
    // injection detection fires somewhere (the operator's whole point)
    assert(k.exists(_(3).toString.nonEmpty))
  }

  test("kernel matches HOF on adversarial edge strings") {
    val edge = Seq(
      "",                                   // no tokens
      "   \t  ",                            // whitespace only
      "— !! (()) ..",                       // every token strips to ''
      "Dr. Alice met Mr. Bob Stone at Acme Corp. and Beta LLC",
      "The Sky is blue. I Saw X Y and A. B. Cd today — Really!",
      "MR SMITH mr smith Mr smith mr Smith", // case ladder on the table
      "((John)) ((Doe)) trailing Inc",       // outer strips on both sides
      "Ab\u2028cd Ef\u0085gh Ij\u2029kl Mn Op", // '.'-excluded line terminators
      "A B C D",                             // single-letter caps chain
      "Émile Zola États Unis",               // non-ASCII first chars (not [A-Z])
      "KÉvin LÉon Inc",                      // ASCII cap + non-ASCII tail
      "İstanbul Ltd STRASSE Gmbh",           // unicode lowercase paths
      "Mr\u00a0Jones NonBreaking\u00a0Space")  // NBSP inside a token
      .toDF("text")
    val (k, h) = both(edge)
    assert(k == h)
  }

  test("kernel stays inside whole-stage codegen (no fallback)") {
    // Probe the entity projection itself (rwEntities' final plan is a
    // scan of the presentation checkpoint, which hides the map stage).
    val df = Entities.withEntityCols(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      col("text")).select(("doc_id" +: outCols).map(col): _*)
    val exec = df.queryExecution.executedPlan
    // the `*(n)` prefix is the whole-stage-codegen marker in toString
    val plan = exec.toString
    assert(plan.contains("*(1) Project"))
    // ONE kernel evaluation feeding all seven fields (subexpression
    // elimination on the shared __es struct)
    assert("entity_stats".r.findAllIn(plan).size == 1)
    // the interpreted-HOF markers must be gone from the gated path
    assert(!plan.contains("lambdafunction"))
  }
}
