package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Scale-mechanics contracts: salted joins preserve results while
  * spreading hot keys, and bucketed tables co-locate joins with no
  * exchange — the two explicit tools (beyond AQE) for the 100 TB story.
  */
class ScaleSpec extends SparkSpec {

  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed key distribution") {
    // 90% of fact rows share key 0 — the classic hot key
    val fact = (1 to 1000).map(i => (if (i <= 900) 0L else i.toLong % 7, i))
      .toDF("k", "v")
    val dim = (0L to 6L).map(k => (k, s"d$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select("k", "v", "name")
      .as[(Long, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "k", salt = 8)
      .select("k", "v", "name").as[(Long, Int, String)].collect().toSet
    assert(salted === plain)
  }

  test("saltedJoin's physical join key includes the salt column") {
    val fact = Seq((0L, 1)).toDF("k", "v")
    val dim = Seq((0L, "d")).toDF("k", "name")
    val plan = Skew.saltedJoin(fact, dim, "k", salt = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan)
  }

  test("saltedAgg two-phase equals the direct aggregation") {
    val fact = (1 to 500).map(i => (if (i <= 450) 0L else i.toLong % 5, i.toLong))
      .toDF("k", "v")
    val direct = fact.groupBy("k")
      .agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().toSet
    val salted = graft.ops.Skew.saltedAgg(fact, "k", salt = 8,
      partial = Seq("v" -> (sum(_)), "n" -> (_ => count(lit(1)))),
      merge = Seq("v" -> (sum(_)), "n" -> (sum(_))))
      .select(col("k"), col("v").as("s"), col("n"))
      .as[(Long, Long, Long)].collect().toSet
    assert(salted === direct)
  }

  test("keySkewProfile surfaces the hot key first") {
    val fact = (1 to 100).map(i => if (i <= 60) 7L else i.toLong).toDF("k")
    val top = Skew.keySkewProfile(fact, "k", 1).as[(Long, Long)].head()
    assert(top === ((7L, 60L)))
  }

  test("bucketed tables join without an exchange (shuffle-free co-located join)") {
    spark.sql("DROP TABLE IF EXISTS g_orders_b")
    spark.sql("DROP TABLE IF EXISTS g_cust_b")
    // a previously failed run can leave the managed location behind
    for (t <- Seq("g_orders_b", "g_cust_b")) {
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete()); loc.delete()
      }
    }
    val dir = sfDir
    table(spark, dir, "orders")
      .write.mode("overwrite").bucketBy(4, "o_custkey")
      .sortBy("o_custkey").saveAsTable("g_orders_b")
    table(spark, dir, "customer")
      .selectExpr("c_custkey", "c_name")
      .write.mode("overwrite").bucketBy(4, "c_custkey")
      .sortBy("c_custkey").saveAsTable("g_cust_b")
    // merge hints on the INPUTS so broadcast doesn't win and the bucketed
    // sort-merge path is what's planned
    val joined = spark.table("g_orders_b").hint("merge")
      .join(spark.table("g_cust_b").hint("merge"),
        col("o_custkey") === col("c_custkey"))
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("SortMergeJoin"), physical)
    assert(!physical.contains("Exchange"),
      s"bucketed join must not shuffle:\n$physical")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS g_orders_b")
    spark.sql("DROP TABLE IF EXISTS g_cust_b")
  }

  test("bucketed edge table drops the per-level edge-side exchange inside a recursive CTE") {
    // r15 verdict #6: q124's scaladoc prescribes "pre-bucket edges on
    // `child`" for a 100 TB link graph, where the per-level SMJ would
    // otherwise re-shuffle the edge side on EVERY recursion level.
    // UnionLoopExec executes each level as a fresh Dataset (the q124
    // re-planning behavior), so the per-level physical plans are
    // observable through a QueryExecutionListener — this pin runs the
    // same edge-join recursion against a plain and a child-bucketed
    // edge table under forced SMJ and asserts the bucketed layout's
    // level joins carry NO exchange keyed on the edge side (`child`),
    // while the plain layout pays one per level.
    import org.apache.spark.sql.util.QueryExecutionListener
    import org.apache.spark.sql.execution.QueryExecution
    spark.sql("DROP TABLE IF EXISTS g_edges_b")
    spark.sql("DROP TABLE IF EXISTS g_edges_p")
    val edges = table(spark, sfDir, "documents")
      .filter(col("doc_id") >= 7)
      .select(col("doc_id").cast("long").as("child"),
        expr("cast(doc_id as bigint) div 7").as("parent"))
    edges.write.mode("overwrite").bucketBy(4, "child").sortBy("child")
      .saveAsTable("g_edges_b")
    edges.write.mode("overwrite").saveAsTable("g_edges_p")
    def recursion(edgeTable: String) =
      s"""WITH RECURSIVE anc AS (
           SELECT CAST(doc_id AS BIGINT) AS start_id,
                  CAST(doc_id AS BIGINT) AS cur,
                  CAST(0 AS BIGINT) AS depth
           FROM parquet.`$sfDir/documents.parquet`
           UNION ALL
           SELECT /*+ MERGE(e) */ a.start_id, e.parent AS cur,
                  a.depth + CAST(1 AS BIGINT) AS depth
           FROM anc a JOIN $edgeTable e ON a.cur = e.child
         )
         SELECT depth, count(*) AS n FROM anc GROUP BY depth"""
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val listener = new QueryExecutionListener {
      def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit =
        plans.add(qe.executedPlan.toString)
      def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    def levelJoinPlans(edgeTable: String): (Seq[String], Seq[(Long, Long)]) =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
        plans.clear()
        val rows = spark.sql(recursion(edgeTable))
          .as[(Long, Long)].collect().toSeq.sorted
        // listener delivery is async (listenerBus is private[spark]) —
        // poll until the captured-plan count settles
        var settled = false
        var tries = 0
        while (!settled && tries < 20) {
          val n = plans.size
          Thread.sleep(300)
          settled = plans.size == n && n > 0
          tries += 1
        }
        import scala.jdk.CollectionConverters._
        (plans.asScala.toSeq.filter(p =>
          p.contains("SortMergeJoin") && p.contains(edgeTable)), rows)
      } finally spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", prevBcast)
    val (bLevels, bRows) = levelJoinPlans("g_edges_b")
    val (pLevels, pRows) = levelJoinPlans("g_edges_p")
    spark.listenerManager.unregister(listener)
    assert(bRows === pRows, "bucketed and plain closures must agree")
    assert(bRows.nonEmpty && bRows.map(_._2).sum > table(
      spark, sfDir, "documents").count(), "recursion must have walked")
    assert(bLevels.nonEmpty, "no per-level SMJ observed on bucketed run")
    assert(pLevels.nonEmpty, "no per-level SMJ observed on plain run")
    // the pin itself: an exchange keyed on the edge-side join key
    // exists at every observed plain level and at NO bucketed level
    // (the frontier side's exchange, keyed on `cur`, remains in both)
    assert(pLevels.forall(_.contains("Exchange hashpartitioning(child")),
      s"plain edge table lost its edge-side exchange?\n${pLevels.head}")
    assert(bLevels.forall(!_.contains("Exchange hashpartitioning(child")),
      s"bucketed edge table still shuffles the edge side:\n${bLevels.head}")
    assert(bLevels.forall(_.contains("SelectedBucketsCount")),
      "bucketed run must scan buckets")
    spark.sql("DROP TABLE IF EXISTS g_edges_b")
    spark.sql("DROP TABLE IF EXISTS g_edges_p")
  }

  test("bucketed stored CorpusIndex: probe joins shuffle ONLY the batch side") {
    import graft.ops.Dedup
    val names = Seq("gt_idx_bands", "gt_idx_shingles", "gt_idx_meta")
    names.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    for (t <- names) {
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        Option(loc.listFiles).getOrElse(Array.empty).foreach(_.delete())
        loc.delete()
      }
    }
    val base = (1 to 40).map(i =>
      (i.toLong, (1 to 50).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    Dedup.buildIndex(base, "doc_id", "text").saveBucketed("gt_idx", buckets = 4)
    val idx = Dedup.loadIndexBucketed(spark, "gt_idx")
    // the batch probe path (same join shape as the streaming flag path):
    // count exchanges that repartition the STORED tables — there must be
    // none; the probe batch's own exchanges are the per-batch cost
    val probe = Seq((1000L, (1 to 50).map(j => s"w3_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val flagged = Dedup.crossNearDupIndexed(probe, idx, "doc_id", "text")
    val plan = flagged.queryExecution.executedPlan.toString
    // stored-side scans must carry their bucket layout
    assert(plan.contains("SelectedBucketsCount"),
      s"stored side must scan buckets:\n$plan")
    // and the result is correct: doc 1000 matches base doc 3 only
    val got = flagged.select("new_id", "base_id")
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1000L, 3L)), s"got $got")
    // the headline property — the stored side is never re-shuffled:
    // under forced SMJ (no broadcast), the bucketed index's plan must
    // carry exactly TWO fewer shuffle exchanges than the same index in
    // its plain stored form (the bands (band, band_hash) exchange and
    // the shingles base_id exchange both disappear into bucketed scans)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def nExchanges(idx2: Dedup.CorpusIndex): Int =
        "Exchange hashpartitioning".r.findAllIn(
          Dedup.crossNearDupIndexed(probe, idx2, "doc_id", "text")
            .queryExecution.executedPlan.toString).size
      val plainDir = java.nio.file.Files
        .createTempDirectory("gt-idx-plain").toString
      Dedup.buildIndex(base, "doc_id", "text").save(plainDir)
      val nPlain = nExchanges(Dedup.loadIndex(spark, plainDir))
      val nBucketed = nExchanges(idx)
      assert(nBucketed === nPlain - 2,
        s"bucketed probe must drop BOTH stored-side exchanges: " +
          s"plain $nPlain vs bucketed $nBucketed")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    names.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("events() under TIMESTAMP_NTZ inference equals the tz-aware read (r11 regression)") {
    // Round 11 lost all 9 events queries when the fixture generator
    // switched ts from TIMESTAMP(NANOS) to naive timestamp[us], which
    // Spark surfaces as TIMESTAMP_NTZ unless inferTimestampNTZ=false
    // (GraftSession's default since). events() type-dispatches, so a
    // session WITHOUT the config must read the same instants — this
    // pins the NTZ branch, which GraftSession sessions otherwise never
    // exercise.
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      // meaningful only while the fixture stores NAIVE timestamps; a
      // nanos fixture (LongType either way) cancels rather than
      // vacuously passing
      assume(raw.schema("ts").dataType == TimestampNTZType,
        s"fixture ts is ${raw.schema("ts").dataType} — NTZ branch not reachable")
      val viaNtz = graft.events(spark, sfDir)
        .select("event_id", "ts_ns").as[(Long, Long)].collect().toMap
      spark.conf.set(key, "false")
      val viaTz = graft.events(spark, sfDir)
        .select("event_id", "ts_ns").as[(Long, Long)].collect().toMap
      assert(viaNtz.size > 0 && viaNtz === viaTz,
        "NTZ and tz-aware reads must agree on every instant (UTC session)")

      // r12 ADVICE regression: the r12 NTZ branch used
      // to_utc_timestamp(cast, "UTC") — a no-op (to_utc_timestamp shifts
      // by the GIVEN zone's offset, zero for UTC), so the cast's
      // session-tz interpretation leaked through and a non-UTC session
      // shifted every instant by its zone offset. Pin the fix
      // (from_utc_timestamp(cast, sessionTz)) under a zone with a
      // nonzero offset: the instants must STILL match the UTC read.
      val tzKey = "spark.sql.session.timeZone"
      val prevTz = spark.conf.get(tzKey)
      try {
        spark.conf.set(tzKey, "Asia/Kolkata") // +05:30, no DST
        spark.conf.set(key, "true")
        val viaNtzKolkata = graft.events(spark, sfDir)
          .select("event_id", "ts_ns").as[(Long, Long)].collect().toMap
        assert(viaNtzKolkata === viaTz,
          "NTZ read under a non-UTC session must still yield UTC instants")
      } finally spark.conf.set(tzKey, prevTz)
    } finally spark.conf.set(key, prev)
  }

  test("partitioned layout prunes partitions at plan time") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-part").toString
    table(spark, sfDir, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
    val one = spark.read.parquet(tmp).filter(col("event_type") === "click")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    val total = spark.read.parquet(tmp).count()
    val clicks = one.count()
    assert(clicks > 0 && clicks < total)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(tmp))
  }

  test("tagged-JSON ingestion (the reference's MR wire format) parses and casts") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-tagged").toFile
    val f = new java.io.File(tmp, "Serves.json")
    val w = new java.io.PrintWriter(f)
    w.println("Serves\t{\"Serves.pizzeria\": \"Dominos\", \"Serves.pizza\": \"mushroom\", \"Serves.price\": 8.5}")
    w.println("Person\t{\"Person.name\": \"Amy\"}") // foreign tag: selected OUT
    w.println("Serves\t{\"Serves.pizzeria\": \"Corleone\", \"Serves.pizza\": \"cheese\", \"Serves.price\": 7.75}")
    w.close()
    val df = pizzaDd.load(spark, tmp.getPath, "Serves", "tagged-json")
    assert(df.columns.toSeq === Seq("pizzeria", "pizza", "price"))
    assert(df.count() === 2, "foreign-tagged rows must not become null rows")
    assert(df.filter(col("price") === 8.5).count() === 1)
    f.delete(); tmp.delete()
  }

  test("JSON-lines ingestion through the dd casts types like CSV does") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-json").toFile
    val f = new java.io.File(tmp, "Serves.json")
    val w = new java.io.PrintWriter(f)
    w.println("""{"pizzeria": "Dominos", "pizza": "mushroom", "price": 8.5}""")
    w.println("""{"pizzeria": "Corleone", "pizza": "cheese", "price": 7.75}""")
    w.close()
    val df = pizzaDd.load(spark, tmp.getPath, "Serves", "json")
    assert(df.schema("price").dataType ===
      org.apache.spark.sql.types.DoubleType)
    assert(df.filter(col("price") === 7.75).count() === 1)
    f.delete(); tmp.delete()
  }

  test("ORC ingestion through the dd casts types and pushes filters") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-orc").toFile
    try {
      Seq(("Dominos", "mushroom", 8.5), ("Corleone", "cheese", 7.75))
        .toDF("pizzeria", "pizza", "price")
        .coalesce(1).write.mode("overwrite").orc(s"${tmp.getPath}/Serves.orc")
      val df = pizzaDd.load(spark, tmp.getPath, "Serves", "orc")
      assert(df.schema("price").dataType ===
        org.apache.spark.sql.types.DoubleType)
      assert(df.filter(col("price") === 7.75).count() === 1)
      val plan = df.filter(col("pizzeria") === "Dominos")
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("PushedFilters") && plan.contains("pizzeria"), plan)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp.toPath).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("Avro ingestion through the dd: container round-trip, dd casts, missing-field and non-primitive guards") {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val tmp = java.nio.file.Files.createTempDirectory("graft-avro").toFile
    def write(path: java.io.File, schema: Schema,
              rows: Seq[Map[String, Any]]): Unit = {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, path)
      rows.foreach { r =>
        val rec = new GenericData.Record(schema)
        r.foreach { case (k, v) => rec.put(k, v) }
        w.append(rec)
      }
      w.close()
    }
    try {
      // writer schema carries an EXTRA field (ignored) and a null union
      // on price (surfaces as SQL NULL after the dd cast)
      val schema = SchemaBuilder.record("Serves").fields()
        .requiredString("pizzeria").requiredString("pizza")
        .optionalDouble("price").requiredInt("extra")
        .endRecord()
      write(new java.io.File(tmp, "Serves.avro"), schema, Seq(
        Map("pizzeria" -> "Dominos", "pizza" -> "mushroom",
          "price" -> 8.5, "extra" -> 1),
        Map("pizzeria" -> "Corleone", "pizza" -> "cheese",
          "price" -> 7.75, "extra" -> 2),
        Map("pizzeria" -> "NullHouse", "pizza" -> "plain",
          "extra" -> 3)))
      val df = pizzaDd.load(spark, tmp.getPath, "Serves", "avro")
      assert(df.columns.toSeq === Seq("pizzeria", "pizza", "price"))
      assert(df.schema("price").dataType ===
        org.apache.spark.sql.types.DoubleType)
      assert(df.count() === 3)
      assert(df.filter(col("price") === 7.75).count() === 1)
      assert(df.filter(col("price").isNull).count() === 1,
        "avro null union must surface as SQL NULL")
      // round-trip: the dd-loaded frame equals the same rows loaded
      // from parquet through the same dd cast
      Seq(("Dominos", "mushroom", Some(8.5)),
          ("Corleone", "cheese", Some(7.75)),
          ("NullHouse", "plain", None: Option[Double]))
        .toDF("pizzeria", "pizza", "price")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"${tmp.getPath}/Serves.parquet")
      val viaParquet = pizzaDd.load(spark, tmp.getPath, "Serves", "parquet")
      assert(df.collect().toSet === viaParquet.collect().toSet,
        "avro and parquet dd loads must agree row-for-row")
      // a writer schema LACKING a dd column refuses loudly per batch
      // instead of an all-null column
      val lacking = SchemaBuilder.record("Serves").fields()
        .requiredString("pizzeria").endRecord()
      val tmp2 = java.nio.file.Files.createTempDirectory("graft-avro2").toFile
      write(new java.io.File(tmp2, "Serves.avro"), lacking,
        Seq(Map("pizzeria" -> "X")))
      val e = intercept[Exception] {
        pizzaDd.load(spark, tmp2.getPath, "Serves", "avro").collect()
      }
      def chain(t: Throwable): String =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(_.getMessage).mkString(" | ")
      assert(chain(e).contains("lacks dd column"), s"got: ${chain(e)}")
      // non-primitive dd columns refuse at plan time
      val binDd = graft.catalog.DataDictionary(Map("Media" ->
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("media_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("content",
            org.apache.spark.sql.types.BinaryType)))))
      val e2 = intercept[IllegalArgumentException] {
        binDd.load(spark, tmp.getPath, "Media", "avro")
      }
      assert(e2.getMessage.contains("flat records only"))
      // ...and so do temporal dd columns (r19 advice): Avro logical
      // date/timestamp values surface as raw int/long, whose toString
      // would cast to a silent NULL under the non-ANSI session —
      // refuse at plan time instead
      for (t <- Seq(org.apache.spark.sql.types.DateType,
                    org.apache.spark.sql.types.TimestampType)) {
        val tempDd = graft.catalog.DataDictionary(Map("Ev" ->
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("ev_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("ts", t)))))
        val e3 = intercept[IllegalArgumentException] {
          tempDd.load(spark, tmp.getPath, "Ev", "avro")
        }
        assert(e3.getMessage.contains("silent NULLs"), s"$t: ${e3.getMessage}")
      }
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp2.toPath).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp.toPath).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("runtime bloom filter from a selective dim side prunes the fact scan") {
    // The 100 TB lever beyond static pushdown: a filter on the DIMENSION
    // side can't statically prune the fact scan, but Spark's
    // InjectRuntimeFilter builds a bloom filter over the dim join keys at
    // runtime and applies it to the fact side BEFORE the join shuffle —
    // rows for non-matching keys never cross the wire. Local fixtures sit
    // under the production-size thresholds, so the test lowers them to
    // observe the plan; GraftSession leaves the defaults (10 MB / 10 GB)
    // that make this fire exactly when a real fact table is scan-heavy.
    val c = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      c.set("spark.sql.adaptive.enabled", "false")
      val fact = table(spark, sfDir, "lineitem")
      val dim = table(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a bloom-filter runtime filter on the fact scan:\n$plan")
      // pruning must not change the answer
      val expected = fact.join(broadcast(dim),
        col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
        .collect().toSeq
      assert(joined.collect().toSeq === expected)
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None)    => c.unset(k)
    }
  }

  test("z-order layout keeps per-file envelopes narrow on BOTH dimensions") {
    // A single-column sort clusters that column perfectly and leaves the
    // other scattered across the full range — filters on the second
    // dimension prune nothing. Z-order trades a little of the first
    // dimension's locality for narrow min-max envelopes on ALL
    // interleaved dimensions, which is what file-level stats pruning
    // actually consumes. Verified on real data: per-partition span of
    // each dimension, z-ordered vs orderkey-sorted.
    val li = table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val bounds = li.agg(
      min("l_orderkey"), max("l_orderkey"),
      min("l_partkey"), max("l_partkey")).head()
    val okSpan = (bounds.getLong(1) - bounds.getLong(0)).toDouble
    val pkSpan = (bounds.getLong(3) - bounds.getLong(2)).toDouble
    // average normalized (span_orderkey, span_partkey) per output split
    def spans(laidOut: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val per = laidOut
        .withColumn("__pid", org.apache.spark.sql.functions.spark_partition_id())
        .groupBy(col("__pid"))
        .agg(((max("l_orderkey") - min("l_orderkey")) / okSpan).as("ok"),
          ((max("l_partkey") - min("l_partkey")) / pkSpan).as("pk"))
        .agg(avg("ok"), avg("pk")).head()
      (per.getDouble(0), per.getDouble(1))
    }
    val (zOk, zPk) = spans(
      graft.ops.Layout.zorderBy(li, Seq("l_orderkey", "l_partkey"),
        numFiles = 16))
    val (sOk, sPk) = spans(
      li.repartitionByRange(16, col("l_orderkey"))
        .sortWithinPartitions(col("l_orderkey")))
    // sorted layout: first dim tight, second dim ~full range
    assert(sOk < 0.2 && sPk > 0.8, s"sorted spans: $sOk / $sPk")
    // z-ordered: BOTH dims well under the full range → both prune
    assert(zOk < 0.6 && zPk < 0.6, s"z-ordered spans: $zOk / $zPk")
  }

  test("pair-set cache: a dir swap releases the stale persisted blocks") {
    val dirA = sfDir // sf0.001
    val dirB = "/root/testdata/sf0.01"
    def persisted: Set[String] = spark.sparkContext.getPersistentRDDs.values
      .map(_.name).filter(n =>
        n != null && n.startsWith("graft-verified-pairs")).toSet
    graft.clearCaches(spark) // defined state however earlier suites left it
    assert(SparkEntry.queries("q39_dedup_survivors")(spark, dirA).count() > 0)
    assert(persisted === Set(s"graft-verified-pairs:$dirA"))
    // same session, new dir: q46 reuses the cache slot — the stale dirA
    // blocks must be RELEASED, not leak for the life of the session
    assert(SparkEntry.queries("q46_dup_clusters")(spark, dirB).count() > 0)
    assert(persisted === Set(s"graft-verified-pairs:$dirB"))
    // both consumers on the new dir share the one materialization
    assert(SparkEntry.queries("q39_dedup_survivors")(spark, dirB).count() > 0)
    assert(persisted === Set(s"graft-verified-pairs:$dirB"))
    // explicit teardown (Bench/Verify path) frees everything
    graft.clearCaches(spark)
    assert(persisted === Set.empty[String])
  }
}
