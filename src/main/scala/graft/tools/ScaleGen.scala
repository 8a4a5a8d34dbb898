package graft.tools

import graft.{Sessions, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10× scale-up of the sf0.1 fixture tables → a
  * derived `sf1` directory, used ONLY for the scale checkpoint bench
  * (BENCH_sf1): correctness stays graded on the driver-generated
  * fixtures. Replica i (0..9) shifts every key by i × its domain
  * stride so referential joins stay consistent (lineitem↔orders↔
  * customer, lineitem↔part/supplier) and group cardinalities grow
  * 10× like a real corpus. Content columns are perturbed
  * deterministically where sameness would change an algorithm's
  * complexity class rather than its scale:
  *  - documents: a per-replica tag replaces the 2 leading chars, so
  *    near-dup cluster SIZES stay fixture-like while the corpus
  *    grows 10× (identical replicas would grow every LSH bucket 10×
  *    and the pair count 100× — a different workload, not a bigger
  *    one);
  *  - embeddings: each replica rotates the vector by i positions
  *    (norm- and distribution-preserving), keeping ANN bucket
  *    occupancy fixture-like.
  * nation/region stay fixed (TPC-H dimension semantics).
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else new java.io.File("testdata_sf1").getAbsolutePath
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))

    val reps = spark.range(0, factor.toLong).toDF("rep")
    def scaled(df: DataFrame)(shift: (DataFrame, org.apache.spark.sql.Column) => DataFrame): DataFrame =
      shift(df.crossJoin(reps), col("rep"))

    def write(df: DataFrame, name: String): Unit = {
      df.drop("rep").repartition(16)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"$name: ${spark.read.parquet(s"$outDir/$name.parquet").count()} rows")
    }

    // key strides (fixture maxima at sf0.1, rounded up)
    val OK = 200000L; val PK = 20000L; val SK = 1000L; val CK = 15000L
    val EV = 100000L; val U = 1500L; val DOC = 5000L; val VEC = 2000L

    write(scaled(Tables.lineitem(spark, srcDir)) { (d, r) =>
      d.withColumn("l_orderkey", col("l_orderkey") + r * OK)
        .withColumn("l_partkey", col("l_partkey") + r * PK)
        .withColumn("l_suppkey", col("l_suppkey") + r * SK)
    }, "lineitem")

    write(scaled(Tables.orders(spark, srcDir)) { (d, r) =>
      d.withColumn("o_orderkey", col("o_orderkey") + r * OK)
        .withColumn("o_custkey", col("o_custkey") + r * CK)
    }, "orders")

    write(scaled(Tables.customer(spark, srcDir)) { (d, r) =>
      d.withColumn("c_custkey", col("c_custkey") + r * CK)
    }, "customer")

    write(scaled(Tables.part(spark, srcDir)) { (d, r) =>
      d.withColumn("p_partkey", col("p_partkey") + r * PK)
    }, "part")

    write(scaled(Tables.supplier(spark, srcDir)) { (d, r) =>
      d.withColumn("s_suppkey", col("s_suppkey") + r * SK)
    }, "supplier")

    Tables.nation(spark, srcDir).write.mode("overwrite")
      .parquet(s"$outDir/nation.parquet")
    Tables.region(spark, srcDir).write.mode("overwrite")
      .parquet(s"$outDir/region.parquet")

    write(scaled(Tables.events(spark, srcDir)) { (d, r) =>
      d.withColumn("event_id", col("event_id") + r * EV)
        .withColumn("user_id", col("user_id") + r * U)
    }, "events")

    write(scaled(Tables.documents(spark, srcDir)) { (d, r) =>
      d.withColumn("doc_id", col("doc_id") + r * DOC)
        // per-replica leading tag, length-preserving (ASCII 'a'+i):
        // shifts the dedup prefix and the leading shingles without
        // changing length/token statistics materially
        .withColumn("text", expr(
          "concat(char(97 + CAST(rep AS INT)), char(97 + CAST(rep AS INT)), " +
            "substring(text, 3))"))
    }, "documents")

    write(scaled(Tables.embeddings(spark, srcDir)) { (d, r) =>
      d.withColumn("vec_id", col("vec_id") + r * VEC)
        .withColumn("embedding", expr(
          "concat(slice(embedding, CAST(rep AS INT) + 1, 64 - CAST(rep AS INT)), " +
            "slice(embedding, 1, CAST(rep AS INT)))"))
    }, "embeddings")

    spark.stop()
  }
}
