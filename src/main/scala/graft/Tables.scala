package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * At cluster scale these would be catalog tables (partitioned/bucketed
  * parquet); here each is a single parquet file per scale factor. All
  * queries go through these helpers so a future catalog/bucketing change
  * is one edit.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet's `ts` physical type has drifted across testdata
    * generations: TIMESTAMP(NANOS) (read as long under the nanosAsLong
    * legacy flag), TIMESTAMP_NTZ(us), or plain TIMESTAMP(us). Branch on the
    * loaded dtype so a regeneration never breaks the query surface: longs
    * get the ns→us truncation (integral `div`, not `/` — fp division of an
    * ns epoch ~1.7e18 exceeds double precision), NTZ is cast to
    * TimestampType under the UTC session (wall clock preserved, matching
    * DuckDB's naive-timestamp read), TimestampType passes through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"$d/events.parquet: unsupported dtype for ts: $other " +
          "(expected TIMESTAMP(NANOS)-as-long, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Expected column set per table. Time/timestamp columns may legitimately
    * drift in physical type across testdata regenerations (the loaders
    * adapt), so validate checks names only for those and exact dtypes
    * elsewhere.
    */
  private val expectedCols: Map[String, Seq[String]] = Map(
    "region"     -> Seq("r_regionkey", "r_name"),
    "nation"     -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer"   -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier"   -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"       -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders"     -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
                        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
    "events"     -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents"  -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  /** Fail fast (one clear line) if the driver regenerated testdata with a
    * different shape, instead of surfacing as dozens of downstream analysis
    * errors. Schema reads are metadata-only — this costs milliseconds.
    * Additionally forces the `events` loader branch to resolve, so an
    * unsupported ts dtype fails here, not mid-query.
    */
  def validate(s: SparkSession, dir: String): Unit = {
    val problems = names.flatMap { t =>
      try {
        val got = load(s, dir, t).schema.fieldNames.toSeq
        val want = expectedCols(t)
        if (got != want) Some(s"$t: columns $got != expected $want") else None
      } catch {
        case e: Exception => Some(s"$t: unreadable (${e.getMessage})")
      }
    } ++ (try { events(s, dir).schema; None } catch {
      case e: Exception => Some(s"events loader: ${e.getMessage}")
    })
    require(problems.isEmpty,
      s"testdata schema drift under $dir:\n  " + problems.mkString("\n  "))
  }
}

/** One registered query: a DataFrame builder over a scale-factor dir plus an
  * optional DuckDB oracle SQL producing identical columns/values. Queries
  * without an oracle get the driver's weaker rows-only check; their
  * correctness is pinned by unit tests instead.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, build, Some(oracle))
  def noOracle(name: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, build, None)
}
