package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deterministic entity detection — the name/org side of the reference's
  * GRPO fabrication loop (training/grpo/prompt_parsing.py:165-187,
  * `detect_potential_people_names` / `detect_organization_names`).
  *
  * The reference's no-spaCy fallback flags every adjacent pair of
  * capitalized tokens (first char uppercase alpha, length > 1) as a
  * potential person name; its spaCy path additionally recognizes
  * honorific-led names and suffix-marked organizations. Re-expressed here
  * as the house pattern: ONE embedded table ([[Honorifics]],
  * [[OrgSuffixes]], the cap-token regex) generates BOTH engines' forms —
  * the Spark HOF pipeline and the DuckDB list-comprehension SQL compute
  * identical candidates, so the row is hash-gated, not rows-only.
  *
  * The gated query runs over [[Datasets.p24Negatives]]' `rejected` text —
  * the corpus where the pipeline's own violation injector plants
  * "Shout out to <Name>!" shout-outs (utils/violations.py:34-36, mirrored
  * at Datasets.scala) — so the detection side provably finds what the
  * injection side planted: `injected_name` is the candidate that matches
  * the violations name pool. Truncated negatives ("between" length
  * buckets cut the text in half) lose the shout-out, so both detection
  * outcomes occur at every SF.
  *
  * Scale shape: map-only, shuffle-free (the only shuffle is the
  * presentation ORDER BY) — a pure linear scan at 100 TB. Since r15 the
  * per-row work is ONE native codegen'd pass
  * ([[graft.functions.Kernels.entityStats]]); the original HOF pipeline
  * is kept as [[withEntityColsHof]] solely as the differential
  * reference (EntitiesKernelSpec). tx_pattern_canary pins the kernel
  * family's edge cases (honorific periods, org suffixes, sentence-start
  * false positives, single-letter tokens) cross-engine per round.
  */
object Entities {

  /** Honorific tokens that lead a person name (matched on the
    * punctuation-stripped, lowercased token — "Dr." → "dr"). */
  private[operators] val Honorifics =
    Seq("mr", "mrs", "ms", "dr", "prof", "sir", "madam")

  /** Corporate suffixes that close an organization name. */
  private[operators] val OrgSuffixes =
    Seq("inc", "corp", "llc", "ltd", "co", "gmbh", "plc")

  /** A capitalized token: first char uppercase A-Z, at least 2 chars —
    * prompt_parsing.py:171-175's isalpha/isupper/len>1 test on the
    * punctuation-stripped token. */
  private val CapRe = "^[A-Z]."

  /** Outer-punctuation strip — the re-expression of nltk word_tokenize's
    * punctuation splitting: "Doe!" and "(Acme" test as "Doe" / "Acme". */
  private val StripRe = "^[^A-Za-z0-9]+|[^A-Za-z0-9]+$"

  private def inSet(x: String, xs: Seq[String]): String =
    xs.map(s => "'" + s.replace("'", "''") + "'").mkString(s"$x IN (", ", ", ")")

  // ---- Spark side (expression fragments over the cleaned-token array
  // column `__ct`) ----

  private def capAt(i: String) = s"element_at(__ct, $i) rlike '$CapRe'"

  /** Adjacent-pair candidates "tok_i tok_{i+1}" for 1-based positions i
    * where `pred` holds. The sequence starts at 0 so it is ascending for
    * every array size (Spark's sequence(1, 0) would DESCEND); position 0
    * and the final position are filtered out by the bounds guard, which
    * also keeps ANSI element_at in range. */
  private def pairs(pred: String): String =
    "transform(filter(sequence(0, size(__ct)), i -> i >= 1 AND i < size(__ct)" +
      s" AND ($pred)), i -> concat(element_at(__ct, i), ' ', element_at(__ct, i+1)))"

  private def firstOrEmpty(arr: String): String =
    s"if(size($arr) > 0, element_at($arr, 1), '')"

  private val personPred = s"${capAt("i")} AND ${capAt("i+1")}"
  private val honorPred =
    s"${inSet("lower(element_at(__ct, i))", Honorifics)} AND ${capAt("i+1")}"
  private val orgPred =
    s"${capAt("i")} AND ${inSet("lower(element_at(__ct, i+1))", OrgSuffixes)}"

  /** Adds the full entity-candidate column set over `text`:
    * n_person/person_first (adjacent capitalized pairs), injected_name
    * (the candidate matching the violations name pool, '' if none),
    * n_honorific/honorific_first, n_org/org_first.
    *
    * Runs as ONE native pass ([[graft.functions.Kernels.entityStats]])
    * since r15 — the HOF form below ran interpreted transform/filter
    * lambdas with a per-token rlike, the exact anti-pattern SURVEY §6
    * bans (66.7 s at the 100× corpus for a map-only stage).
    * [[withEntityColsHof]] is retained as the differential reference
    * (EntitiesKernelSpec), the dd_winnow/synonymAug precedent. */
  private[graft] def withEntityCols(df: DataFrame, text: Column): DataFrame = {
    val es = graft.functions.NativeExpressions.entityStats(
      text, Honorifics, OrgSuffixes, Datasets.Names)
    df.withColumn("__es", es)
      .withColumn("n_person", col("__es").getField("n_person"))
      .withColumn("person_first", col("__es").getField("person_first"))
      .withColumn("injected_name", col("__es").getField("injected_name"))
      .withColumn("n_honorific", col("__es").getField("n_honorific"))
      .withColumn("honorific_first", col("__es").getField("honorific_first"))
      .withColumn("n_org", col("__es").getField("n_org"))
      .withColumn("org_first", col("__es").getField("org_first"))
      .drop("__es")
  }

  /** The original HOF formulation — differential reference ONLY (it is
    * what the DuckDB oracle SQL below mirrors structurally; the kernel
    * must match it bit-for-bit on any input). */
  private[graft] def withEntityColsHof(df: DataFrame, text: Column): DataFrame =
    df.withColumn("__toks", tokens(text))
      .withColumn("__ct",
        expr(s"transform(__toks, x -> regexp_replace(x, '$StripRe', ''))"))
      .withColumn("__persons", expr(pairs(personPred)))
      .withColumn("__honor", expr(pairs(honorPred)))
      .withColumn("__orgs", expr(pairs(orgPred)))
      .withColumn("__inj",
        expr(s"filter(__persons, p -> ${inSet("p", Datasets.Names)})"))
      .withColumn("n_person", size(col("__persons")).cast("long"))
      .withColumn("person_first", expr(firstOrEmpty("__persons")))
      .withColumn("injected_name", expr(firstOrEmpty("__inj")))
      .withColumn("n_honorific", size(col("__honor")).cast("long"))
      .withColumn("honorific_first", expr(firstOrEmpty("__honor")))
      .withColumn("n_org", size(col("__orgs")).cast("long"))
      .withColumn("org_first", expr(firstOrEmpty("__orgs")))
      .drop("__toks", "__ct", "__persons", "__honor", "__orgs", "__inj")

  private val OutCols = Seq("n_person", "person_first", "injected_name",
    "n_honorific", "honorific_first", "n_org", "org_first")

  /** rw_entities: deterministic person/org candidate detection over the
    * DPO negatives' rejected text — closes prompt_parsing.py:165-187. */
  def rwEntities(spark: SparkSession, sfDir: String): DataFrame =
    withEntityCols(
      Datasets.negativesFrame(spark, sfDir).select(col("doc_id"), col("rejected")),
      col("rejected"))
      .select(("doc_id" +: OutCols).map(col): _*)
      .transform(Sampling.presentSorted(_, col("doc_id")))

  // ---- DuckDB side (generated from the SAME tables/regexes) ----

  private def sqlCapAt(ct: String, i: String) =
    s"regexp_matches($ct[$i], '$CapRe')"

  /** DuckDB list comprehension over 1-based positions: range(1, len) is
    * [1 .. len-1] (empty when len <= 1), so ct[i+1] is always in range. */
  private def sqlPairs(ct: String, pred: String): String =
    s"[concat($ct[i], ' ', $ct[i+1]) FOR i IN range(1, len($ct)) IF $pred]"

  private def sqlPersons(ct: String) =
    sqlPairs(ct, s"${sqlCapAt(ct, "i")} AND ${sqlCapAt(ct, "i+1")}")
  private def sqlHonor(ct: String) =
    sqlPairs(ct, s"${inSet(s"lower($ct[i])", Honorifics)} AND ${sqlCapAt(ct, "i+1")}")
  private def sqlOrgs(ct: String) =
    sqlPairs(ct, s"${sqlCapAt(ct, "i")} AND ${inSet(s"lower($ct[i+1])", OrgSuffixes)}")

  /** Cleaned-token list from a text expression (whitespace split, outer
    * punctuation stripped — mirror of the Spark `__ct` column). */
  private[operators] def sqlCleanToks(textExpr: String): String =
    "list_transform(list_filter(regexp_split_to_array(" + textExpr +
      s", '\\s+'), x -> x != ''), x -> regexp_replace(x, '$StripRe', '', 'g'))"

  /** The candidate-array CTE body over a cleaned-token column `ct`
    * (shared by the rw_entities oracle and the canary's entity family). */
  private[operators] def sqlCandidates(ct: String): String =
    s"${sqlPersons(ct)} AS persons, ${sqlHonor(ct)} AS honor, ${sqlOrgs(ct)} AS orgs"

  private val entitiesSql: String =
    s"""WITH neg AS (${Datasets.oracle("p24_negatives")}),
       |tk AS (SELECT doc_id, ${sqlCleanToks("rejected")} AS ct FROM neg),
       |e AS (SELECT doc_id, ${sqlCandidates("ct")} FROM tk)
       |SELECT doc_id,
       |  CAST(len(persons) AS BIGINT) AS n_person,
       |  coalesce(persons[1], '') AS person_first,
       |  coalesce([p FOR p IN persons IF ${inSet("p", Datasets.Names)}][1], '')
       |    AS injected_name,
       |  CAST(len(honor) AS BIGINT) AS n_honorific,
       |  coalesce(honor[1], '') AS honorific_first,
       |  CAST(len(orgs) AS BIGINT) AS n_org,
       |  coalesce(orgs[1], '') AS org_first
       |FROM e ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rw_entities" -> (rwEntities _))

  val oracle: Map[String, String] = Map(
    "rw_entities" -> entitiesSql)
}
