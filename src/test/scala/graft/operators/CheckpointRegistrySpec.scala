package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Every lineage truncation in the operator library must go through the
  * [[Ckpt]] registry and declare a size class (VERDICT r17 item 8) — a raw
  * `.localCheckpoint()` bypasses both the full-plan lint view
  * (PlanLintSpec) and the docs/CHECKPOINTS.md 100 TB story. Source-level gate:
  * cheap, and it catches the mistake at the call site instead of three
  * rounds later as an unexplained blind spot. */
class CheckpointRegistrySpec extends AnyFunSuite {

  test("no raw localCheckpoint outside the Ckpt registry in graft/operators") {
    val dir = java.nio.file.Paths.get("src/main/scala/graft/operators")
    val offenders = java.nio.file.Files.list(dir).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.endsWith(".scala"))
      .filterNot(_.getFileName.toString == "Ckpt.scala")
      .flatMap { p =>
        java.nio.file.Files.readString(p).linesIterator.zipWithIndex.collect {
          // comments may cite the API name; only a call is an offence
          case (line, i) if line.contains(".localCheckpoint(") =>
            s"${p.getFileName}:${i + 1}: $line"
        }
      }
    assert(offenders.isEmpty,
      "raw .localCheckpoint() outside Ckpt — declare the site via " +
        "Ckpt.local/Ckpt.state with a SizeClass (and record the 100 TB " +
        "story in docs/CHECKPOINTS.md):\n" + offenders.mkString("\n"))
  }
}
