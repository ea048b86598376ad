package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AnyValue, HyperLogLogPlusPlus}

/** Presto-parity function layer.
  *
  * Installs (a) Presto-named aliases that map 1:1 onto Spark built-in
  * Catalyst expressions (so Presto-dialect SQL runs unchanged through
  * spark.sql — zero overhead, full codegen), and (b) custom scalar UDFs +
  * sketch aggregates for the rest.
  *
  * Reference: presto-main/.../metadata/FunctionRegistry.java:419-660 (the
  * master index of every SQL function; see SURVEY §2.9).
  */
object FunctionRegistry {

  // Keyed on session identity (not hashCode — collisions would silently
  // skip installation for a second session); weak so dead sessions drop.
  private val installed =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def installAll(spark: SparkSession): Unit = synchronized {
    if (!installed.containsKey(spark)) {
      installAliases(spark)
      ScalarFunctions.install(spark)
      SketchAggregates.install(spark)
      QuantileSketchFunctions.install(spark)
      ArrayCosineSimilarity.install(spark)
      TypedAggregators.install(spark)
      HeavyHitters.install(spark)
      MapHistogramAggs.install(spark)
      installed.put(spark, java.lang.Boolean.TRUE)
    }
  }

  private def register(spark: SparkSession, name: String)(builder: FunctionBuilder): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Pure renames: Presto name -> Spark built-in Catalyst expression.
    * All stay inside whole-stage codegen (no UDF boxing).
    * Reference files: operator/scalar/StringFunctions.java,
    * MathFunctions.java, DateTimeFunctions.java,
    * ApproximateCountDistinctAggregation.java, ArbitraryAggregationFunction.java.
    */
  private def installAliases(spark: SparkSession): Unit = {
    // strpos(haystack, needle) — StringFunctions.java stringPosition
    register(spark, "strpos") { args => StringInstr(args(0), args(1)) }
    // codepoint(ch) — StringFunctions.java codepoint
    register(spark, "codepoint") { args => Ascii(args.head) }
    // approx_distinct(x[, e]) — ApproximateCountDistinctAggregation.java:43
    register(spark, "approx_distinct") { args =>
      if (args.size >= 2) new HyperLogLogPlusPlus(args(0), args(1))
      else new HyperLogLogPlusPlus(args(0))
    }
    // arbitrary(x) — ArbitraryAggregationFunction.java:48
    register(spark, "arbitrary") { args => new AnyValue(args.head) }
    // regexp_replace with a LAMBDA replacement —
    // JoniRegexpReplaceLambdaFunction.java:39. The non-lambda arities
    // keep Spark's native (codegen'd) RegExpReplace; Presto's 2-arg form
    // deletes matches.
    register(spark, "regexp_replace") { args =>
      if (args.size == 3 && args(2).isInstanceOf[LambdaFunction])
        org.apache.spark.sql.graft.RegexpReplaceLambda(args(0), args(1), args(2))
      else if (args.size == 2) RegExpReplace(args(0), args(1), Literal(""))
      else RegExpReplace(args(0), args(1), args(2))
    }
    // log2/log10 exist in Spark; Presto ln == Spark ln. nothing to do.
    // is_nan — MathFunctions.java
    register(spark, "is_nan") { args => IsNaN(args.head) }
    // to_unixtime(ts) -> double seconds — DateTimeFunctions.java
    register(spark, "to_unixtime") { args =>
      Divide(
        Cast(UnixMicros(Cast(args.head, org.apache.spark.sql.types.TimestampType)),
          org.apache.spark.sql.types.DoubleType),
        Literal(1000000.0))
    }
    // from_unixtime(secs) -> timestamp — Presto returns timestamp(3)
    register(spark, "presto_from_unixtime") { args => SecondsToTimestamp(args.head) }
    // TRY(expr) — generic error->NULL wrapper (TryFunction.java). Spark 4
    // ships the TryEval expression (used by try_add etc.); exposing it
    // directly generalizes TRY to any child expression.
    register(spark, "try_eval") { args => TryEval(args.head) }
    // day_of_week / dow — Presto returns ISO (Mon=1..Sun=7);
    // Spark's dayofweek is Sun=1, so shift: ((dayofweek+5) % 7) + 1.
    val isoDow: Seq[Expression] => Expression = args =>
      Add(Pmod(Add(DayOfWeek(args.head), Literal(5)), Literal(7)), Literal(1))
    register(spark, "day_of_week")(isoDow)
    register(spark, "dow")(isoDow)
    register(spark, "day_of_year") { args => DayOfYear(args.head) }
    register(spark, "doy") { args => DayOfYear(args.head) }
    register(spark, "week") { args => WeekOfYear(args.head) }
    register(spark, "week_of_year") { args => WeekOfYear(args.head) }
    // ISO-8601 rendering/parsing — DateTimeFunctions.java to/from_iso8601
    register(spark, "to_iso8601") { args =>
      DateFormatClass(args.head, Literal("yyyy-MM-dd'T'HH:mm:ss.SSSXXX"))
    }
    register(spark, "from_iso8601_timestamp") { args =>
      Cast(args.head, org.apache.spark.sql.types.TimestampType)
    }
    register(spark, "from_iso8601_date") { args =>
      Cast(args.head, org.apache.spark.sql.types.DateType)
    }
  }
}
