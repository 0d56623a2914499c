package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `q13_custdist` (outer-join count distribution) and `table_checksum`
  * (order-independent snapshot fingerprint). Values are oracle-checked;
  * these pin the semantics the oracle compare can't see: zero-order
  * customers surviving the outer join, and the checksum's independence
  * from partitioning and row order.
  */
class ChecksumQ13Spec extends SparkSpec {

  test("q13: the distribution partitions ALL customers") {
    val out = Relational.q13CustDist(spark, sf).collect()
    val total = out.map(_.getLong(1)).sum
    val customers = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(total == customers)
  }

  test("q13: zero-order customers survive into the c_count=0 bucket") {
    // Every sf0.001 customer has ≥2 non-urgent orders, so the outer
    // join's defining case needs a constructed fixture: one customer
    // with no orders at all, one with ONLY urgent orders (the join
    // predicate must drop the order without dropping the customer),
    // one with a mix.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q13").toString
    Seq((1L, "a", 0L, 1.0, "m"), (2L, "b", 0L, 1.0, "m"), (3L, "c", 0L, 1.0, "m"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq((10L, 2L, "O", 5.0, "2024-01-01", "1-URGENT"),
        (11L, 3L, "O", 5.0, "2024-01-01", "1-URGENT"),
        (12L, 3L, "O", 5.0, "2024-01-01", "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val out = Relational.q13CustDist(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // customers 1 (no orders) and 2 (only urgent) → c_count 0;
    // customer 3 → c_count 1
    assert(out == Map(0L -> 2L, 1L -> 1L))
  }

  test("q13: per-customer count reuses the join's partitioning (no extra exchange)") {
    val plan = Relational.q13CustDist(spark, sf).queryExecution.executedPlan.toString
    // one exchange per join side + one for the final tiny distribution
    // + the orderBy range exchange; a 5th would mean the first aggregate
    // re-shuffled the joined rows on the key they already have
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 4, s"expected <= 4 exchanges, got $exchanges:\n$plan")
  }

  test("table_checksum is invariant to partitioning and row order") {
    val base = Relational.tableChecksum(spark, sf).head()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    // scrambled: different partition count AND different intra-partition
    // order must produce the identical fingerprint
    val scrambled = li.repartition(7, col("l_suppkey"))
      .sortWithinPartitions(col("l_shipdate"), col("l_partkey"))
    val dir = java.nio.file.Files.createTempDirectory("graft-cksum").toString
    scrambled.write.parquet(s"$dir/lineitem.parquet")
    val again = Relational.tableChecksum(spark, dir).head()
    assert(again == base)
  }

  test("group checksums XOR together to the global fingerprint") {
    // the cross-check that makes the drill-down trustworthy: the
    // per-month rows carry exactly the information of the global row
    val global = Relational.tableChecksum(spark, sf).head()
    val groups = Relational.tableChecksumGroups(spark, sf).collect()
    assert(groups.map(_.getLong(1)).sum == global.getLong(0))
    assert(groups.map(_.getLong(2)).reduce(_ ^ _) == global.getLong(1))
  }

  test("group wrapping sums combine to the global checksum_sum (mod 2^60)") {
    val global = Relational.tableChecksum(spark, sf).head()
    val groups = Relational.tableChecksumGroups(spark, sf).collect()
    val mod = BigInt(1) << 60
    val combined = groups.map(r => BigInt(r.getLong(3))).sum.mod(mod)
    assert(combined == BigInt(global.getLong(2)))
  }

  test("checksum_sum catches the even-multiplicity swap XOR is blind to") {
    // Replace two copies of row X with two copies of row Y: n_rows and
    // the XOR are both unchanged (the pair cancels either way) — the
    // r19 wrapping sum must move by 2·(vY−vX) mod 2^60.
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val x = li.orderBy("l_orderkey", "l_linenumber").limit(1)
    val y = x.withColumn("l_quantity", col("l_quantity") + 5)
    val dirA = java.nio.file.Files.createTempDirectory("graft-cksum-evA").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-cksum-evB").toString
    li.union(x).union(x).write.parquet(s"$dirA/lineitem.parquet")
    li.union(y).union(y).write.parquet(s"$dirB/lineitem.parquet")
    val a = Relational.tableChecksum(spark, dirA).head()
    val b = Relational.tableChecksum(spark, dirB).head()
    assert(a.getLong(0) == b.getLong(0), "row counts must agree")
    assert(a.getLong(1) == b.getLong(1), "XOR is expected to be blind here")
    assert(a.getLong(2) != b.getLong(2),
      "checksum_sum missed the even-multiplicity difference")
  }

  test("q22 plans an anti join, never a nested loop") {
    val df = Relational.q22IdleBalance(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in q22:\n$plan")
    assert(plan.contains("LeftAnti"), "NOT EXISTS did not plan as an anti join")
    // threshold non-trivial on the fixture: some but not all customers survive
    val survivors = df.collect().map(_.getLong(1)).sum
    val total = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(survivors > 0 && survivors < total)
  }

  test("table_checksum detects a single-row mutation") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-cksum-mut").toString
    li.withColumn("l_quantity",
        when(col("l_orderkey") === li.select(min("l_orderkey")).head().getLong(0),
          col("l_quantity") + 1).otherwise(col("l_quantity")))
      .write.parquet(s"$dir/lineitem.parquet")
    val base = Relational.tableChecksum(spark, sf).head()
    val mutated = Relational.tableChecksum(spark, dir).head()
    assert(mutated.getLong(0) == base.getLong(0), "row count must be unchanged")
    assert(mutated.getLong(1) != base.getLong(1), "checksum missed a mutation")
  }
}
