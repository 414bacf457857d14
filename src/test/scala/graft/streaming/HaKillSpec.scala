package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Process-kill HA twin (r11 VERDICT task 2) of the reference's nightly
  * chaos spec (test/nightly/flink_validation_passthrough_high_availability
  * _spec.rb:101-181): the reference SIGKILLs taskmanager/jobmanager pods
  * mid-batch and requires the batch to complete with every record exactly
  * once. RecoverySpec already injects crashes in-process; this suite runs
  * the REAL job ([[HaChaosJob]] — ValidationJob.pipeline + writeOutputs +
  * EpochCommitLog over a file source and file-backed TxOutputSink) in a
  * SEPARATE JVM and `kill -9`s it mid-epoch (inside the dwell between the
  * sink steps and the epoch commit), then restarts from the same
  * checkpoint — covering the fault class in-process injection cannot
  * reach: no shutdown hooks run, page cache and in-flight checkpoint
  * writes are simply gone. */
class HaKillSpec extends AnyFunSuite {

  private val sparkJars = "/opt/spark/jars"

  /** The compiled main-classes dir this test run is using. */
  private def classesDir: String =
    classOf[BatchTracker].getProtectionDomain.getCodeSource.getLocation.getPath

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def forkJob(inputDir: String, ckpt: String, commitDir: String,
      outDir: String, sleepMs: Long, log: String): Process = {
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", s"$classesDir:$sparkJars/*",
      "graft.streaming.HaChaosJob",
      inputDir, ckpt, commitDir, outDir, sleepMs.toString)).toArray
    new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(new java.io.File(log))
      .start()
  }

  private def jsonLine(kind: String, key: Int, seq: Long, expected: Int): String =
    s"""{"kind":"$kind","key":$key,"seq":$seq,"expected":$expected}"""

  private def writeInput(dir: String, name: String, lines: Seq[String]): Unit = {
    // temp-write + atomic rename so the file source never lists a torn file
    val tmp = Paths.get(dir, s".$name.tmp")
    Files.write(tmp, lines.mkString("\n").getBytes(UTF_8))
    Files.move(tmp, Paths.get(dir, name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  test("kill -9 mid-epoch in a separate JVM, restart from checkpoint: " +
    "all 15 records delivered exactly once and the batch completes") {
    val base = Files.createTempDirectory("graft-hakill").toString
    val inputDir = s"$base/input"; Files.createDirectories(Paths.get(inputDir))
    val ckpt = s"$base/ckpt"
    val commitDir = s"$base/sink-commits"
    val outDir = s"$base/out"; Files.createDirectories(Paths.get(outDir))
    val topics = Topics(HaChaosJob.Topic)

    // Phase 1: batch starts + 8 records; the job dwells 1500 ms inside
    // every record-bearing epoch (steps written, epoch uncommitted).
    writeInput(inputDir, "chunk1.json",
      jsonLine("started", 0, 0L, 0) +: (1 to 8).map(i => jsonLine("record", i, i.toLong, 0)))
    val p1 = forkJob(inputDir, ckpt, commitDir, outDir, 1500L, s"$base/jvm1.log")
    try {
      // wait for the first valid-record step to become visible, then
      // SIGKILL immediately — inside the dwell of that same epoch
      val deadline = System.currentTimeMillis() + 120000
      while (HaChaosJob.topicLines(outDir, topics.out).isEmpty
          && System.currentTimeMillis() < deadline && p1.isAlive)
        Thread.sleep(50)
      assert(HaChaosJob.topicLines(outDir, topics.out).nonEmpty,
        s"forked job produced no output; log:\n${Files.readString(Paths.get(s"$base/jvm1.log"))}")
      p1.destroyForcibly() // SIGKILL — no shutdown hooks, no flush
      assert(p1.waitFor(30, java.util.concurrent.TimeUnit.SECONDS), "SIGKILL did not stick")
    } finally if (p1.isAlive) p1.destroyForcibly()

    // Phase 2: the rest of the batch arrives while the job is DOWN, then a
    // fresh JVM restarts from the same checkpoint + commit log.
    writeInput(inputDir, "chunk2.json",
      (9 to 15).map(i => jsonLine("record", i, i.toLong, 0)) :+
        jsonLine("sendCompleted", 0, 16L, 15))
    val p2 = forkJob(inputDir, ckpt, commitDir, outDir, 0L, s"$base/jvm2.log")
    try {
      assert(p2.waitFor(150, java.util.concurrent.TimeUnit.SECONDS),
        s"restarted job did not finish; log:\n${Files.readString(Paths.get(s"$base/jvm2.log"))}")
      assert(p2.exitValue() == 0,
        s"restarted job exit ${p2.exitValue()}; log:\n${Files.readString(Paths.get(s"$base/jvm2.log"))}")

      // exactly-once: every key 1..15 EXACTLY once on the out topic —
      // counted, not set-compared (the reference's no-dup bar)
      val keys = HaChaosJob.topicLines(outDir, topics.out)
        .map(_.split("\t")(0).toInt).sorted
      assert(keys == (1 to 15).toList, s"lost/duplicated records: $keys")
      assert(HaChaosJob.topicLines(outDir, topics.invalid).isEmpty)

      // and the batch completed with the FULL restored count
      val completed = HaChaosJob.topicLines(outDir, topics.notification)
        .filter(_.contains("\"status\":\"completed\""))
      assert(completed.nonEmpty, "no completed notification")
      assert(completed.exists(_.contains("\"recordCount\":15")),
        s"completed without full count: $completed")
      assert(Files.exists(Paths.get(outDir, "DONE")))
    } finally if (p2.isAlive) p2.destroyForcibly()
  }
}
