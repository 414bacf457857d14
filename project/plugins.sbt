// Statement-level coverage gate (reference parity: JaCoCo >=90%,
// /root/reference/README.md:60). The sbt-scoverage artifact is not in the
// pre-warmed offline cache and cannot resolve in the zero-egress sandbox,
// so it loads only on request — in an environment with network access run:
//   GRAFT_COVERAGE=1 sbt coverage test coverageReport
// The always-on offline floor is CoverageGateSpec (API-surface >=90%,
// enforced on every `sbt test`).
libraryDependencies ++= (
  if (sys.env.contains("GRAFT_COVERAGE"))
    Seq(Defaults.sbtPluginExtra(
      "org.scoverage" % "sbt-scoverage" % "2.3.0",
      (pluginCrossBuild / sbtBinaryVersion).value,
      (pluginCrossBuild / scalaBinaryVersion).value))
  else Seq.empty)
