package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariants of [[SparkEntry]]: every oracle belongs
  * to a registered query, and every registered query is either oracled or
  * carries a declared rows-only manifest entry naming its twin/bound test
  * (VERDICT r6 task 8 — `no_oracle` in the correctness artifact must be
  * distinguishable from not-implemented). */
class EntryContractSpec extends AnyFunSuite {

  test("every oracleSql key is a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("rowsOnly manifest covers exactly the queries without an oracle") {
    val expected = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val declared = SparkEntry.rowsOnly.keySet
    assert(declared == expected,
      s"undeclared rows-only: ${expected -- declared}; stale manifest entries: ${declared -- expected}")
  }

  test("rowsOnly reasons are substantive (name a twin or a bound test)")  {
    SparkEntry.rowsOnly.foreach { case (k, reason) =>
      assert(reason.length > 20, s"$k: reason too thin: '$reason'")
    }
  }

  test("every artifact path in oracle SQL is producible by a path helper " +
    "(writer and oracle can never point at different locations)") {
    // r10 ADVICE: a raw '/tmp/graft-…' literal in oracle SQL silently
    // desynchronizes from the Spark writer when a path helper changes.
    // Every artifact reference must round-trip through the SAME helper
    // the writer uses — unknown families or stale formats fail here.
    import graft.operators.{Curation, Dedup, Multimodal, Overlap, Relational, Similarity, TextOps}
    val sf = "/root/testdata/sf0.01"
    val Pat = "(/tmp/graft-[A-Za-z0-9-]+/sf[0-9.]+)".r
    def rebuild(fam: String): Option[String] = fam match {
      case f if f.startsWith("ann-")      => Some(Similarity.annArtifactPath(sf, f.stripPrefix("ann-")))
      case f if f.startsWith("sketch-")   => Some(Relational.sketchArtifactPath(sf, f.stripPrefix("sketch-")))
      case f if f.startsWith("dedup-")    => Some(Dedup.dedupArtifactPath(sf, f.stripPrefix("dedup-")))
      case f if f.startsWith("text-")     => Some(TextOps.textArtifactPath(sf, f.stripPrefix("text-")))
      case f if f.startsWith("media-")    => Some(Multimodal.mediaArtifactPath(sf, f.stripPrefix("media-")))
      case f if f.startsWith("ppl-cuts-") => Some(Curation.pplCutsPath(sf, f.stripPrefix("ppl-cuts-")))
      case "bpe-segs"                     => Some(TextOps.bpeSegsPath(sf))
      case "overlap-hashes"               => Some(Overlap.overlapArtifactPath(sf))
      case "overlap-purge-hashes"         => Some(Overlap.overlapPurgeArtifactPath(sf))
      case _                              => None
    }
    val bad = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      Pat.findAllMatchIn(sql).map(_.group(1)).toSeq.distinct.flatMap { path =>
        val fam = path.stripPrefix("/tmp/graft-").takeWhile(_ != '/')
        rebuild(fam) match {
          case Some(expected) if expected == path => None
          case Some(expected) => Some(s"$name: $path != helper's $expected")
          case None => Some(s"$name: $path has no known path helper")
        }
      }
    }
    assert(bad.isEmpty, "artifact-path lint failures:\n" + bad.mkString("\n"))
  }

  test("no oracle SQL uses a NOT IN subquery (NULL-semantics footgun)") {
    // `x NOT IN (SELECT ...)` yields NULL (not true) whenever the subquery
    // produces a NULL, silently dropping rows — the dq_audit r9 lesson.
    // Anti-joins in oracle SQL must be spelled NOT EXISTS, whose semantics
    // match Spark's left_anti join for nullable columns.
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if sql.toUpperCase.replaceAll("\\s+", " ")
        .contains("NOT IN (SELECT") => name
    }
    assert(offenders.isEmpty, s"oracle SQL with NOT IN subqueries: $offenders")
  }
}
