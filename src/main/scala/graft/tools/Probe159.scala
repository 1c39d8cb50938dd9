package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Ad-hoc timing of theil-sen pair-generation variants. Measurement-only. */
object Probe159 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.views(spark, sfDir)
    import org.apache.spark.sql.expressions.Window
    val maxLag = 8
    def base = Tables(spark, sfDir, "events")
      .select(col("user_id").as("k"),
        (unix_micros(col("ts")).cast(DoubleType) / lit(86400000000.0)).as("__x"),
        col("value").cast(DoubleType).as("__y"), col("event_id").as("__tb"))
    def med(df: => DataFrame): DataFrame = df.groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        graft.Exact.round6(expr("percentile(__slope, 0.5)")).as("ts_slope"))
      .where(col("n_pairs") >= 3)

    // A: r18 join form
    def varA: DataFrame = {
      val ranked = base.withColumn("__rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("__x"), col("__tb"))))
      val probes = ranked.select(col("k"), col("__rn"), col("__x"), col("__y"),
        explode(sequence(col("__rn") + 1, col("__rn") + maxLag)).as("__rn2"))
      med(probes.join(
          ranked.select(col("k").as("k2"), col("__rn").as("__rnr"),
            col("__x").as("__x2"), col("__y").as("__y2")),
          col("k") === col("k2") && col("__rn2") === col("__rnr"))
        .where(col("__x2") =!= col("__x"))
        .select(col("k"),
          ((col("__y2") - col("__y")) / (col("__x2") - col("__x"))).as("__slope")))
    }
    // B: 16 scalar leads (r19 first cut)
    def varB: DataFrame = {
      val w = Window.partitionBy(col("k")).orderBy(col("__x"), col("__tb"))
      val lags = (1 to maxLag).map { i =>
        val x2 = lead(col("__x"), i).over(w)
        val y2 = lead(col("__y"), i).over(w)
        struct(when(x2 =!= col("__x"), lit(1)).as("__p"),
          when(x2 =!= col("__x"),
            (y2 - col("__y")) / (x2 - col("__x"))).as("__slope"))
      }
      med(base.where(col("k").isNotNull)
        .select(col("k"), array(lags: _*).as("__ls"))
        .select(col("k"), explode(col("__ls")).as("__e"))
        .where(col("__e.__p").isNotNull)
        .select(col("k"), col("__e.__slope").as("__slope")))
    }
    // C: 8 struct leads
    def varC: DataFrame = {
      val w = Window.partitionBy(col("k")).orderBy(col("__x"), col("__tb"))
      val lags = (1 to maxLag).map(i =>
        lead(struct(col("__x"), col("__y")), i).over(w))
      med(base.where(col("k").isNotNull)
        .select(col("k"), col("__x"), col("__y"), array(lags: _*).as("__ls"))
        .select(col("k"), col("__x"), col("__y"), explode(col("__ls")).as("__n"))
        .where(col("__n.__x") =!= col("__x"))
        .select(col("k"),
          ((col("__n.__y") - col("__y")) / (col("__n.__x") - col("__x")))
            .as("__slope")))
    }
    // D: one sliding collect_list window
    def varD: DataFrame = {
      val w = Window.partitionBy(col("k")).orderBy(col("__x"), col("__tb"))
        .rowsBetween(1, maxLag)
      med(base.where(col("k").isNotNull)
        .select(col("k"), col("__x"), col("__y"),
          collect_list(struct(col("__x"), col("__y"))).over(w).as("__ls"))
        .select(col("k"), col("__x"), col("__y"), explode(col("__ls")).as("__n"))
        .where(col("__n.__x") =!= col("__x"))
        .select(col("k"),
          ((col("__n.__y") - col("__y")) / (col("__n.__x") - col("__x")))
            .as("__slope")))
    }
    val variants = Seq("A_join" -> (() => varA), "B_lead16" -> (() => varB),
      "C_lead8s" -> (() => varC), "D_slide" -> (() => varD))
    // warmup
    variants.foreach { case (_, f) =>
      f().write.format("noop").mode("overwrite").save() }
    (1 to 5).foreach { _ =>
      variants.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        println(f"VAR $name ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      }
    }
    // sanity: identical outputs
    val a = varA.orderBy("k")
    Seq("B" -> varB, "C" -> varC, "D" -> varD).foreach { case (n, v) =>
      val diff = a.exceptAll(v).count() + v.exceptAll(a).count()
      println(s"DIFF A vs $n: $diff")
    }
    spark.stop()
  }
}
