package graft.streaming

import org.apache.spark.sql.SparkSession

/** CLI surface — flag-for-flag parity with the reference `validate` command
  * (PassthroughStreamingJob.java:31-86):
  *   -b/--brokers (required, comma-split), -p/--password,
  *   -i/--input (required), -d/--batch-completion-delay (default 300000),
  *   and EXCLUSIVELY either --standalone or the full mgmt group
  *   (-m/--mgmt-url, -c/--client-id, -s/--client-secret, -a/--audience,
  *   -o/--oauth-url — all five required together).
  * Topic-name validation aborts before the job starts (parity:
  * PassthroughStreamingJobTest.java:104-121). */
object Main {

  final case class Config(
      brokers: Seq[String] = Nil,
      password: Option[String] = None,
      input: String = "",
      batchCompletionDelayMs: Long = 300000L,
      standalone: Boolean = false,
      mgmtUrl: Option[String] = None,
      clientId: Option[String] = None,
      clientSecret: Option[String] = None,
      audience: Option[String] = None,
      oauthUrl: Option[String] = None)

  /** Pure parse+validate, returns Left(errorMessage) on any violation so
    * tests cover the whole matrix without spawning JVMs. Accepts both
    * `--flag value` and picocli-style `--flag=value` (the form the
    * reference's own tests use). */
  def parse(rawArgs: Array[String]): Either[String, Config] = {
    var c = Config()
    // split --flag=value into (--flag, value); a bare token that is not a
    // flag is an unmatched argument (picocli parity)
    val args = rawArgs.flatMap { a =>
      if (a.startsWith("-") && a.contains('=')) {
        val Array(f, v) = a.split("=", 2)
        Seq(f, v)
      } else Seq(a)
    }
    var i = 0
    while (i < args.length) {
      def value(flag: String): Either[String, String] =
        if (i + 1 < args.length) { i += 1; Right(args(i)) }
        else Left(s"Missing value for $flag")
      val r: Either[String, Unit] = args(i) match {
        case f @ ("-b" | "--brokers")  => value(f).map(v => c = c.copy(brokers = v.split(',').toSeq))
        case f @ ("-p" | "--password") => value(f).map(v => c = c.copy(password = Some(v)))
        case f @ ("-i" | "--input")    => value(f).map(v => c = c.copy(input = v))
        case f @ ("-d" | "--batch-completion-delay") =>
          value(f).flatMap(v => v.toLongOption.toRight(s"Invalid value for $f: $v")
            .map(ms => c = c.copy(batchCompletionDelayMs = ms)))
        case "--standalone"            => c = c.copy(standalone = true); Right(())
        case f @ ("-m" | "--mgmt-url")      => value(f).map(v => c = c.copy(mgmtUrl = Some(v)))
        case f @ ("-c" | "--client-id")     => value(f).map(v => c = c.copy(clientId = Some(v)))
        case f @ ("-s" | "--client-secret") => value(f).map(v => c = c.copy(clientSecret = Some(v)))
        case f @ ("-a" | "--audience")      => value(f).map(v => c = c.copy(audience = Some(v)))
        case f @ ("-o" | "--oauth-url")     => value(f).map(v => c = c.copy(oauthUrl = Some(v)))
        case other if other.startsWith("-") => Left(s"Unknown option: $other")
        case other => Left(s"Unmatched argument at index $i: '$other'")
      }
      r match { case Left(e) => return Left(e); case Right(_) => () }
      i += 1
    }
    validate(c)
  }

  private def validate(c: Config): Either[String, Config] = {
    if (c.brokers.isEmpty) return Left("Missing required option: '--brokers=<brokers>'")
    if (c.input.isEmpty) return Left("Missing required option: '--input=<inputTopic>'")
    val mgmt = Seq(
      "--mgmt-url=<mgmtUrl>" -> c.mgmtUrl,
      "--client-id=<mgmtClientId>" -> c.clientId,
      "--client-secret=<mgmtClientSecret>" -> c.clientSecret,
      "--audience=<mgmtAudience>" -> c.audience,
      "--oauth-url=<oauthServiceBaseUrl>" -> c.oauthUrl)
    val nMgmt = mgmt.count(_._2.isDefined)
    if (c.standalone && nMgmt > 0)
      return Left("--standalone and the Management API options are mutually exclusive")
    if (!c.standalone && nMgmt == 0)
      return Left("Missing required argument (specify one of these): (--standalone | (-m=<mgmtUrl> -c=<mgmtClientId> -s=<mgmtClientSecret> -a=<mgmtAudience> -o=<oauthServiceBaseUrl>))")
    if (!c.standalone && nMgmt < 5) // name the first missing one, like picocli
      return Left(s"Missing required option: '${mgmt.find(_._2.isEmpty).get._1}'")
    Topics.validate(c.input).map(_ => c)
  }

  /** Production mode looks unknown batches up in the Management API
    * (reference getBatchId path, PassthroughStreamingJob.java:114-117);
    * standalone mode has no external source of truth, so unknown batches
    * 404 via the empty map (parity with the reference, where standalone is
    * test-only). Factored out so CliSpec can pin the wiring. */
  def lookupFor(c: Config): BatchLookup =
    if (c.standalone) new MapBatchLookup(Seq.empty)
    else new HttpBatchLookup(c.mgmtUrl.get, c.clientId.get,
      c.clientSecret.get, c.audience.get, c.oauthUrl.get)

  def main(args: Array[String]): Unit = {
    parse(args) match {
      case Left(err) =>
        System.err.println(err)
        sys.exit(2)
      case Right(c) =>
        val topics = Topics(c.input)
        val spark = SparkSession.builder()
          .appName("hri-validation-passthrough")
          .config("spark.sql.session.timeZone", "UTC")
          .getOrCreate()
        val mgmt: Option[MgmtClient] =
          if (c.standalone) None
          else Some(new HttpMgmtClient(c.mgmtUrl.get, c.clientId.get,
            c.clientSecret.get, c.audience.get, c.oauthUrl.get))
        val lookup: BatchLookup = lookupFor(c)
        val query = ValidationJob.startKafka(
          spark, topics, c.brokers, c.password, PassthroughValidator, lookup,
          c.batchCompletionDelayMs, mgmt,
          checkpointLocation = s"/tmp/hri-checkpoint-${topics.base.replace('.', '-')}",
          // a query death (checkpoint failure included) is fatal: exit
          // non-zero so the orchestrator restarts from the checkpoint
          onFatal = OpsMonitor.exitOnFatal)
        query.awaitTermination()
    }
  }
}
