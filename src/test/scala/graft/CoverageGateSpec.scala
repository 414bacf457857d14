package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Enforceable coverage gate — the sandbox substitute for the reference's
  * JaCoCo ≥90% requirement (`/root/reference/README.md:60`, report wiring
  * `/root/reference/build.gradle:226-237`). Bytecode line coverage needs a
  * scalac plugin (scoverage) or a JVM agent (JaCoCo); neither artifact
  * exists in this zero-egress image and offline resolution of new
  * dependencies fails by design (COVERAGE.md documents the find). What CAN
  * be enforced without new artifacts, and is enforced here on every
  * `sbt test`, is API-surface coverage: every public method of every
  * compiled `graft.*` class must be referenced from the test suite or from
  * the driver-executed harness (`SparkEntry`/`Verify`/`Bench`, which the
  * round driver runs against the DuckDB oracle every round — a harness
  * reference is an executed path, not a dead one). The gate fails the
  * build below 90%, the reference's threshold.
  *
  * For an environment WITH network access, `project/plugins.sbt` loads
  * sbt-scoverage when `GRAFT_COVERAGE=1`, restoring the real
  * statement-level gate; this spec is the always-on floor beneath it.
  */
class CoverageGateSpec extends AnyFunSuite {

  private val Threshold = 0.90

  /** Directory of compiled main classes, located from a loaded class so
    * the gate needs no hard-coded target path. */
  private def classesDir: Path =
    Paths.get(SparkEntry.getClass.getProtectionDomain.getCodeSource.getLocation.toURI)

  /** Method names that exist for the JVM, not for callers: lambdas,
    * accessors for module fields, default-arg suppliers, serialization
    * plumbing, and the universal Object/Product surface. */
  private def isInternal(name: String): Boolean =
    name.contains("$") ||
      Set("apply", "unapply", "copy", "toString", "hashCode", "equals",
        "canEqual", "productArity", "productElement", "productPrefix",
        "productIterator", "productElementName", "productElementNames",
        "main", "readResolve", "writeReplace", "compose", "andThen",
        "curried", "tupled").contains(name)

  /** A `val`/`lazy val` accessor (backing field of the same name) or an
    * UpperCamel 0-arg constant (`final val` literals constant-fold and
    * leave no field). Constants and case-class fields are state, not
    * behavior — the gate targets methods a caller invokes. */
  private def isValAccessor(c: Class[_], m: java.lang.reflect.Method): Boolean =
    m.getParameterCount == 0 &&
      (m.getName.head.isUpper ||
        (try { c.getDeclaredField(m.getName); true }
         catch { case _: NoSuchFieldException => false }))

  /** A framework callback: overrides (or implements) a method declared by
    * a non-graft supertype — Catalyst's `doGenCode`, a listener's
    * `onQueryTerminated`, an Aggregator's encoders. The framework invokes
    * these when the operator runs; their execution is evidenced by the
    * operator's own tests, never by a by-name call. */
  private def isFrameworkOverride(c: Class[_], m: java.lang.reflect.Method): Boolean = {
    def supers(k: Class[_]): Seq[Class[_]] = {
      val direct = Option(k.getSuperclass).toSeq ++ k.getInterfaces.toSeq
      direct ++ direct.flatMap(supers)
    }
    // name-only match: trait type params erase differently in the
    // override (e.g. BinaryLike[T].withNewChildrenInternal erases T to
    // TreeNode, the override to Expression)
    supers(c).distinct.filterNot(_.getName.startsWith("graft"))
      .exists(_.getDeclaredMethods.exists(_.getName == m.getName))
  }

  private def publicApi(): Seq[(String, String)] = {
    val dir = classesDir
    val loader = SparkEntry.getClass.getClassLoader
    Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".class"))
      .map(p => dir.relativize(p).toString.stripSuffix(".class").replace('/', '.'))
      .filter(_.startsWith("graft"))
      .filterNot(_.contains("$$"))     // anonfun/lambda carrier classes
      .flatMap { cn =>
        // init = false: loading must not run object constructors
        val cls = try Some(Class.forName(cn, false, loader)) catch {
          case _: Throwable => None
        }
        cls.toSeq.flatMap { c =>
          c.getDeclaredMethods.toSeq
            .filter(m => java.lang.reflect.Modifier.isPublic(m.getModifiers))
            .filterNot(m => m.isSynthetic || m.isBridge)
            .filterNot(m => isValAccessor(c, m) || isFrameworkOverride(c, m))
            .map(m => (cn.stripSuffix("$"), m.getName))
            .filterNot { case (_, n) => isInternal(n) }
        }
      }.toSeq.distinct
  }

  /** Every .scala file under a root, concatenated. */
  private def sources(root: String): String = {
    val p = Paths.get(root)
    if (!Files.exists(p)) "" else
      Files.walk(p).iterator().asScala
        .filter(f => f.toString.endsWith(".scala"))
        .map(f => new String(Files.readAllBytes(f)))
        .mkString("\n")
  }

  test("every public graft.* method is exercised by the test suite or the driver harness (>=90%)") {
    val api = publicApi()
    assert(api.nonEmpty, "no compiled graft classes found — classpath layout changed?")
    val tests = sources("src/test/scala")
    // The driver runs Verify (every SparkEntry.queries entry vs DuckDB)
    // and Bench every round — a reference from the harness is executed
    // code. Only these three files count; a reference from arbitrary main
    // code would not evidence execution.
    val harness = Seq("src/main/scala/graft/SparkEntry.scala",
      "src/main/scala/graft/Verify.scala", "src/main/scala/graft/Bench.scala")
      .map(f => new String(Files.readAllBytes(Paths.get(f)))).mkString("\n")
    // exact-identifier matching: tokenize the corpus on non-identifier
    // characters and test set membership, so `decode` is NOT covered by
    // `decodePng` or by prose containing the substring — a raw
    // corpus.contains would make short names unfalsifiable
    val identifiers: Set[String] =
      (tests + harness).split("[^A-Za-z0-9_]+").toSet
    val (covered, missed) = api.partition { case (_, m) => identifiers.contains(m) }
    val frac = covered.size.toDouble / api.size
    val missedByClass = missed.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.mkString(", ")).toSeq.sortBy(_._1)
      .map { case (c, ms) => s"  $c: $ms" }.mkString("\n")
    info(f"API coverage: ${covered.size}/${api.size} = ${frac * 100}%.1f%% (gate ${Threshold * 100}%.0f%%)")
    if (missed.nonEmpty) info(s"unreferenced public methods:\n$missedByClass")
    assert(frac >= Threshold,
      f"API coverage ${frac * 100}%.1f%% below ${Threshold * 100}%.0f%% gate; unreferenced:\n$missedByClass")
  }
}
