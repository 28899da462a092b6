package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for x238 (icwsNearDups): times each
  * materialized stage at sf0.1 to locate the 22.9 s. Test scope — never
  * shipped; run with `Test / runMain graft.Prof238`. */
object Prof238 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val df = Tables.documents(spark, dir)
    val tf = df.select(col("doc_id").as("doc"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc"),
        explode(graft.functions.TextFunctions.bigramsOfTokens(col("toks")))
          .as("tok"))
      .groupBy("doc", "tok").agg(count(lit(1)).as("w"))
      .localCheckpoint()
    time("tf rows")(println("  tf=" + tf.count()))

    def u(salt: String) =
      (conv(substring(md5(concat(lit(s"icws:$salt:"), col("seed"),
        lit(":"), col("tok"))), 1, 12), 16, 10).cast("double") + 1.0) /
        281474976710656.0
    val seedG = broadcast(spark.range(8).toDF("seed"))
    val rnd = tf.select("tok").distinct().crossJoin(seedG)
      .select(col("tok"), col("seed"),
        greatest(round(-log(u("r1")) - log(u("r2")), 9), lit(1e-9)).as("r"),
        round(log(greatest(round(-log(u("c1")) - log(u("c2")), 9),
          lit(1e-9))), 6).as("lnc"),
        round(u("b"), 9).as("beta"))
    val rndC = time("rnd (vocab x seed draws)")(rnd.localCheckpoint())
    println("  rnd=" + rndC.count())

    val smp = tf.join(rndC, Seq("tok"))
      .withColumn("t",
        floor(round(log(col("w").cast("double")) / col("r") + col("beta"),
          9)))
      .withColumn("lna", round(col("lnc") -
        round(col("r") * (col("t") - col("beta")), 6) - col("r"), 6))
    val wArg = Window.partitionBy("doc", "seed").orderBy(col("lna"), col("tok"))
    val sig = smp.withColumn("rn", row_number().over(wArg))
      .filter(col("rn") === 1)
      .select(col("doc"), col("seed"),
        concat(col("tok"), lit(":"), col("t")).as("sig"))
    val sigC = time("sig (join+argmin window)")(sig.localCheckpoint())
    println("  sig=" + sigC.count())

    val bk = sigC
      .withColumn("band", (col("seed") / 2).cast("long"))
      .groupBy("doc", "band")
      .agg(max(when(col("seed") % 2 === 0, col("sig"))).as("s0"),
        max(when(col("seed") % 2 === 1, col("sig"))).as("s1"))
      .select(col("doc"), concat(col("band").cast("string"), lit("|"),
        col("s0"), lit("|"), col("s1")).as("bkey"))
    val cand = bk.as("a")
      .join(bk.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("da"), col("b.doc").as("db"))
      .distinct()
    val candC = time("cand (band bucket join)")(cand.localCheckpoint())
    println("  cand=" + candC.count())

    val tot = tf.groupBy("doc").agg(sum(col("w")).as("tw"))
    val m = candC
      .join(tf.select(col("doc").as("da"), col("tok"), col("w").as("wa")),
        Seq("da"))
      .join(tf.select(col("doc").as("db"), col("tok"), col("w").as("wb")),
        Seq("db", "tok"))
      .groupBy("da", "db").agg(sum(least(col("wa"), col("wb"))).as("m"))
    val wjac = round(col("m").cast("double") /
      (col("ta") + col("tb") - col("m")), 4)
    val out = m.join(tot.select(col("doc").as("da"), col("tw").as("ta")), Seq("da"))
      .join(tot.select(col("doc").as("db"), col("tw").as("tb")), Seq("db"))
      .filter(wjac >= 0.4)
    time("verify (pair tf joins)")(println("  out=" + out.count()))

    // end-to-end registry query exactly as Bench drives it (noop sink)
    (1 to 2).foreach { i =>
      time(s"registry end-to-end #$i") {
        SparkEntry.queries("x238_icws_weighted_minhash")(spark, dir)
          .write.mode("overwrite").format("noop").save()
      }
    }

    // exact current Dedup body, timing each eager checkpoint
    val tfA = time("A: tf checkpoint")(
      df.select(col("doc_id").as("doc"),
          graft.functions.TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc"),
          explode(graft.functions.TextFunctions.bigramsOfTokens(col("toks")))
            .as("tok"))
        .groupBy("doc", "tok").agg(count(lit(1)).as("w"))
        .localCheckpoint())
    val rndA = time("B: rnd checkpoint")(
      tfA.select("tok").distinct().crossJoin(seedG)
        .select(col("tok"), col("seed"),
          greatest(round(-log(u("r1")) - log(u("r2")), 9), lit(1e-9)).as("r"),
          round(log(greatest(round(-log(u("c1")) - log(u("c2")), 9),
            lit(1e-9))), 6).as("lnc"),
          round(u("b"), 9).as("beta"))
        .localCheckpoint())
    val smpA = tfA.join(broadcast(rndA), Seq("tok"))
      .withColumn("t",
        floor(round(log(col("w").cast("double")) / col("r") + col("beta"),
          9)))
      .withColumn("lna", round(col("lnc") -
        round(col("r") * (col("t") - col("beta")), 6) - col("r"), 6))
    val sigA = smpA.groupBy("doc", "seed")
      .agg(min(struct(col("lna"), col("tok"), col("t"))).as("arg"))
      .select(col("doc"), col("seed"),
        concat(col("arg.tok"), lit(":"), col("arg.t")).as("sig"))
    val bkA = time("C: bk checkpoint")(sigA
      .withColumn("band", (col("seed") / 2).cast("long"))
      .groupBy("doc", "band")
      .agg(max(when(col("seed") % 2 === 0, col("sig"))).as("s0"),
        max(when(col("seed") % 2 === 1, col("sig"))).as("s1"))
      .select(col("doc"), concat(col("band").cast("string"), lit("|"),
        col("s0"), lit("|"), col("s1")).as("bkey"))
      .localCheckpoint())
    val candA = bkA.as("a")
      .join(bkA.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("da"), col("b.doc").as("db"))
      .distinct()
    println(sigA.queryExecution.executedPlan.toString.take(3500))
    time("D: cand count")(println("  candA=" + candA.count()))
    val totA = tfA.groupBy("doc").agg(sum(col("w")).as("tw"))
    val mA = candA
      .join(tfA.select(col("doc").as("da"), col("tok"), col("w").as("wa")),
        Seq("da"))
      .join(tfA.select(col("doc").as("db"), col("tok"), col("w").as("wb")),
        Seq("db", "tok"))
      .groupBy("da", "db").agg(sum(least(col("wa"), col("wb"))).as("m"))
    val wjA = round(col("m").cast("double") /
      (col("ta") + col("tb") - col("m")), 4)
    val outA = mA.join(totA.select(col("doc").as("da"), col("tw").as("ta")),
        Seq("da"))
      .join(totA.select(col("doc").as("db"), col("tw").as("tb")), Seq("db"))
      .filter(wjA >= 0.4)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        wjA.as("wjac"))
    time("E: out noop+sort") {
      outA.orderBy("doc_a", "doc_b")
        .write.mode("overwrite").format("noop").save()
    }
    println("  outA=" + outA.count())
    spark.stop()
  }
}
