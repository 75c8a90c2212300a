package graft.agg

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The aggregation façade — graft twin of the reference's coprocessor
  * aggregation service (hbase-endpoint/.../client/coprocessor/
  * AggregationClient.java:228,295,350,437,488,603,675,778 and server
  * AggregateImplementation.java:84,143,201,260,325,401,483).
  *
  * The reference hand-rolls partial-per-region + final-at-client
  * execution; Catalyst plans the identical shape natively (partial
  * HashAggregate on executors → exchange → final HashAggregate), so
  * every method here is a thin declarative wrapper. `scanPred` plays
  * the role of the reference's Scan argument: it is pushed below the
  * aggregate into the source scan.
  */
object AggregationClient {

  private def base(df: DataFrame, scanPred: Option[Column]): DataFrame =
    scanPred.fold(df)(df.filter)

  def max(df: DataFrame, value: Column, scanPred: Option[Column] = None): DataFrame =
    base(df, scanPred).agg(functions.max(value).as("max"))
  def min(df: DataFrame, value: Column, scanPred: Option[Column] = None): DataFrame =
    base(df, scanPred).agg(functions.min(value).as("min"))
  def sum(df: DataFrame, value: Column, scanPred: Option[Column] = None): DataFrame =
    base(df, scanPred).agg(functions.sum(value).as("sum"))
  def avg(df: DataFrame, value: Column, scanPred: Option[Column] = None): DataFrame =
    base(df, scanPred).agg(functions.avg(value).as("avg"))
  def std(df: DataFrame, value: Column, scanPred: Option[Column] = None): DataFrame =
    base(df, scanPred).agg(functions.stddev_pop(value).as("std"))

  /** Exact median — the reference needs a two-phase protocol
    * (AggregationClient.java:778); Spark's exact `percentile` is one
    * declarative aggregate. */
  def median(df: DataFrame, value: Column, scanPred: Option[Column] = None): DataFrame =
    base(df, scanPred).agg(percentile(value, lit(0.5)).as("median"))

  /** Approximate median/percentile — the 100 TB path. Exact
    * `percentile`'s partial buffer grows with the number of DISTINCT
    * values per partition (it counts occurrences per value), which is
    * unbounded on high-cardinality measures at scale;
    * `approx_percentile` is a fixed-size Greenwald–Khanna sketch with
    * bounded rank error 1/accuracy, and its partials merge in the
    * normal partial/final aggregate — the same reason the reference's
    * two-phase median protocol (AggregationClient.java:778) ships
    * region SUMMARIES rather than region values. */
  def medianApprox(df: DataFrame, value: Column, accuracy: Int = 10000,
      scanPred: Option[Column] = None): DataFrame =
    percentileApprox(df, value, 0.5, accuracy, scanPred)
      .withColumnRenamed("percentile", "median")

  def percentileApprox(df: DataFrame, value: Column, p: Double,
      accuracy: Int = 10000, scanPred: Option[Column] = None): DataFrame =
    base(df, scanPred)
      .agg(approx_percentile(value, lit(p), lit(accuracy)).as("percentile"))

  /** WEIGHTED median — the capability behind the reference's
    * weight-qualified median (AggregationClient.java:778,796: the
    * two-qualifier form where the second column weights the first;
    * per-region (value, weight) partials locate the crossing region,
    * then one region-local walk finds the crossing cell). graft keeps
    * the reference's TWO-PHASE LOCATE shape but defines the answer on
    * VALUE order — the reference's walk is in row-key order, which
    * makes its result an artifact of row-key assignment; value order
    * is the statistical contract a Spark user expects and the one an
    * engine-independent oracle can pin: the smallest value v with
    * 2·Σ{weight | value ≤ v} ≥ Σweight (integer cross-multiplied — no
    * halving float).
    *
    * Plan (the protocol twin, every stage bounded):
    *  1. one (value → weight-sum) aggregate — distinct-value-sized;
    *  2. `buckets` range bounds derived once (approxQuantile) and
    *     FROZEN as plan literals, so bucket assignment is a pure
    *     function of the value — any bounds give the correct answer,
    *     they only steer balance (bounds that drift between two
    *     executions of a lazy plan could not corrupt the offsets);
    *  3. per-bucket weight sums collect to the driver (bucket-count-
    *     sized — the region-locate phase, exactly the reference's
    *     per-region summary map); prefix offsets broadcast back;
    *  4. the running sum is a bucket-PARTITIONED window (each frame ≈
    *     distinct-values/buckets) — no corpus-scale frame ever enters
    *     a one-partition window.
    * The bounds, the partials and the final pick are three bounded
    * passes over the SAME distinct-value aggregate; it materializes
    * once (localCheckpoint) so the corpus scan + exchange run once per
    * invocation instead of once per pass (r17-opt: the three re-scans
    * were the query's whole cost; the checkpointed frame is
    * distinct-value-sized). Executor loss re-runs the invocation
    * instead of replaying lineage — the standard localCheckpoint
    * trade, acceptable for a bounded two-phase protocol. */
  def weightedMedian(df: DataFrame, value: Column, weight: Column,
      scanPred: Option[Column] = None, buckets: Int = 32): DataFrame = {
    val spark = df.sparkSession
    // weights are integral by contract (counts/occurrences — the
    // reference's LongColumnInterpreter shape); non-integral weights
    // cast down so the cross-multiplied compare stays exact
    val g = base(df, scanPred)
      .filter(value.isNotNull && weight.isNotNull)
      .groupBy(value.cast("double").as("__v"))
      .agg(functions.sum(weight.cast("long")).as("__w"))
      .localCheckpoint()
    // frozen literal bounds: bucket = #bounds strictly below v
    val qs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (qs.isEmpty) Array.empty[Double]
      else g.stat.approxQuantile("__v", qs, 0.001).distinct.sorted
    val bucketOf =
      if (bounds.isEmpty) lit(0)
      else size(filter(array(bounds.map(lit): _*), b => b < col("__v")))
    val parts = g.withColumn("__b", bucketOf)
    // the region-locate summaries (bucket-count-sized)
    val partials = parts.groupBy("__b").agg(functions.sum(col("__w")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = partials.map(_._2).sum
    val offsets = partials.scanLeft((0, 0L)) { case ((_, acc), (b, s)) =>
      (b + 1, acc + s)
    }.init.zip(partials).map { case ((_, off), (b, _)) => (b, off) }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__b", "__off")
    // bucket-local running sums + the crossing pick
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    parts.join(broadcast(offDf), Seq("__b"))
      .withColumn("__cw", functions.sum(col("__w")).over(w) + col("__off"))
      .filter(col("__cw") * 2 >= total)
      .agg(functions.min(col("__v")).as("weighted_median"))
  }

  /** Row count over a CellSet — the reference pairs rowCount with
    * FirstKeyOnlyFilter to touch one cell per row
    * (AggregationClient.java:350); count-distinct-rows is the
    * declarative equivalent. */
  def rowCount(cells: DataFrame, scanPred: Option[Column] = None): DataFrame =
    base(cells, scanPred).agg(count_distinct(col("row")).as("rowcount"))

  /** Grouped aggregation (GroupingTableMapper.java:37 composite-key
    * grouping — free on Spark). */
  def grouped(df: DataFrame, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)

  // avoid shadowing between our methods and sql.functions
  private object functions {
    def max(c: Column): Column = org.apache.spark.sql.functions.max(c)
    def min(c: Column): Column = org.apache.spark.sql.functions.min(c)
    def sum(c: Column): Column = org.apache.spark.sql.functions.sum(c)
    def avg(c: Column): Column = org.apache.spark.sql.functions.avg(c)
    def stddev_pop(c: Column): Column = org.apache.spark.sql.functions.stddev_pop(c)
  }
}

/** The reference's pluggable value-decoder/semiring for aggregation —
  * `ColumnInterpreter` (hbase-client/.../coprocessor/
  * ColumnInterpreter.java:52: getValue/add/compare/divideForAvg) —
  * re-expressed as the graft extension point for custom aggregates:
  * implement the semiring and get a typed Spark `Aggregator` (partial/
  * final merge handled by Tungsten).
  */
trait GColumnInterpreter[T] extends Serializable {
  def decode(raw: String): T           // ColumnInterpreter.getValue:56
  def add(a: T, b: T): T               // :59
  def zero: T
  def divideForAvg(sum: T, count: Long): Double // :92
}

object GColumnInterpreter {
  /** LongColumnInterpreter analogue (client/coprocessor/LongColumnInterpreter.java). */
  object Longs extends GColumnInterpreter[Long] {
    def decode(raw: String): Long = raw.toLong
    def add(a: Long, b: Long): Long = a + b
    def zero: Long = 0L
    def divideForAvg(sum: Long, count: Long): Double = sum.toDouble / count
  }
  /** BigDecimalColumnInterpreter analogue — exact money sums. */
  object Decimals extends GColumnInterpreter[BigDecimal] {
    def decode(raw: String): BigDecimal = BigDecimal(raw)
    def add(a: BigDecimal, b: BigDecimal): BigDecimal = a + b
    def zero: BigDecimal = BigDecimal(0)
    def divideForAvg(sum: BigDecimal, count: Long): Double =
      (sum / count).toDouble
  }
  /** DoubleColumnInterpreter analogue (client/coprocessor/
    * DoubleColumnInterpreter.java) — FP sums, order-dependent like the
    * reference's own double semiring. */
  object Doubles extends GColumnInterpreter[Double] {
    def decode(raw: String): Double = raw.toDouble
    def add(a: Double, b: Double): Double = a + b
    def zero: Double = 0.0
    def divideForAvg(sum: Double, count: Long): Double = sum / count
  }

  /** Lift an interpreter into a typed Spark Aggregator summing the
    * interpreted values of a string column (the CellSet `value`). */
  def sumAggregator[T: Encoder](ci: GColumnInterpreter[T]): Aggregator[String, T, T] =
    new Aggregator[String, T, T] {
      def zero: T = ci.zero
      def reduce(b: T, a: String): T = if (a == null) b else ci.add(b, ci.decode(a))
      def merge(b1: T, b2: T): T = ci.add(b1, b2)
      def finish(r: T): T = r
      def bufferEncoder: Encoder[T] = implicitly[Encoder[T]]
      def outputEncoder: Encoder[T] = implicitly[Encoder[T]]
    }

  implicit val longEnc: Encoder[Long] = Encoders.scalaLong
  implicit val doubleEnc: Encoder[Double] = Encoders.scalaDouble
}
