package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition pruning: at 100 TB the events table would be written
  * date-partitioned so a one-day query touches one directory, not the
  * corpus. Proves the layout→plan contract: a filter on the partition
  * column appears as PartitionFilters on the scan and the non-matching
  * partitions are never read. */
class PartitionPruningSpec extends AnyFunSuite {

  test("date-partitioned layout prunes non-matching partitions at the scan") {
    val spark = graft.streaming.StreamFixture.spark
    val dir = Files.createTempDirectory("graft-part").toString
    graft.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.partitionBy("day").mode("overwrite").parquet(dir)

    val days = spark.read.parquet(dir).select("day").distinct().count()
    assert(days > 5, s"fixture too small: $days day partitions")

    val oneDay = spark.read.parquet(dir).filter(col("day") === "2024-01-03")
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"partition filter not pushed:\n$plan")
    // the pruned scan reads exactly the one partition's rows
    val expected = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-03").count()
    assert(oneDay.count() == expected && expected > 0)
  }
}
