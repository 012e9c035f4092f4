package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Columnstore, Hypertable, Jobs}
import graft.streaming.{CaggDef, ContinuousAggregate}

/** The reference's administrative SQL surface (`sql/ddl_api.sql`,
  * `sql/policy_api.sql`) through the parser extension: `SELECT
  * create_hypertable(...)`, `SELECT show_chunks(...)`, `CALL
  * refresh_continuous_aggregate(...)` run as eagerly-executed commands.
  */
class SqlAdminSpec extends AnyFunSuite {
  lazy val spark = Graft.session("sql-admin-spec", "local[4]", 4)
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_sqladmin").toString

  private def events(n: Int) = {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    (0 until n).map { i =>
      (new java.sql.Timestamp(base.getTime + i * 3600L * 1000), i.toLong, i * 1.5)
    }.toDF("ts", "user_id", "value")
  }

  test("create_hypertable / show_chunks / drop_chunks round-trip in SQL") {
    val path = tmp()
    val created = spark.sql(
      s"SELECT create_hypertable('$path', 'ts', chunk_interval => INTERVAL '1 day')")
      .collect()
    assert(created.map(r => (r.getString(0), r.getBoolean(1))).toSeq ===
      Seq((path, true)))

    Hypertable.at(spark, path).write(events(96)) // 4 days → 4 chunks
    val chunks = spark.sql(s"SELECT show_chunks('$path')").as[String].collect()
    assert(chunks.length === 4 && chunks.forall(_.contains("_chunk=")))

    // named time bound; also the SELECT * FROM form
    val older = spark.sql(
      s"SELECT * FROM show_chunks('$path', older_than => TIMESTAMP '2024-01-03 00:00:00')")
      .as[String].collect()
    assert(older.length === 2)

    val dropped = spark.sql(
      s"SELECT drop_chunks('$path', older_than => TIMESTAMP '2024-01-02 00:00:00')")
      .as[String].collect()
    assert(dropped.length === 1)
    assert(spark.sql(s"SELECT show_chunks('$path')").count() === 3)
  }

  test("create_hypertable binds reference positional order: partitioning_column 3rd, number_partitions 4th") {
    // sql/ddl_api.sql old-style signature — a reference-style call
    // create_hypertable('/p','ts','device',4) must bind the space dimension
    val path = tmp()
    spark.sql(s"SELECT create_hypertable('$path', 'ts', 'user_id', 2)")
    val ht = Hypertable.at(spark, path)
    assert(ht.spaceCol === Some("user_id"))
    assert(ht.spacePartitions === 2)
    // the unambiguous convenience: a positional INTERVAL in slot 3 is the
    // chunk width (a column name can't be an interval literal)
    val path2 = tmp()
    spark.sql(s"SELECT create_hypertable('$path2', 'ts', INTERVAL '2 days')")
    Hypertable.at(spark, path2).write(events(96))
    assert(spark.sql(s"SELECT show_chunks('$path2')").count() === 2)
  }

  test("approximate_row_count and hypertable_size read footer metadata") {
    val path = tmp()
    spark.sql(s"SELECT create_hypertable('$path', 'ts')")
    Hypertable.at(spark, path).write(events(50))
    assert(spark.sql(s"SELECT approximate_row_count('$path')")
      .as[Long].head() === 50L)
    assert(spark.sql(s"SELECT hypertable_size('$path')").as[Long].head() > 0L)
  }

  test("compress_chunk / decompress_chunk by the path show_chunks returned") {
    val path = tmp()
    spark.sql(s"SELECT create_hypertable('$path', 'ts', INTERVAL '1 day')")
    val ht = Hypertable.at(spark, path)
    ht.write(events(48))
    ht.setColumnstoreSettings(Columnstore.Options(
      segmentBy = Seq("user_id"), orderBy = Seq("ts")))
    val chunk = spark.sql(s"SELECT show_chunks('$path')").as[String].head()
    assert(spark.sql(s"SELECT compress_chunk('$chunk')").as[String].head() === chunk)
    assert(Columnstore.isCompressed(spark, chunk))
    assert(spark.sql(s"SELECT decompress_chunk('$chunk')").as[String].head() === chunk)
    assert(!Columnstore.isCompressed(spark, chunk))
  }

  test("freeze_chunk blocks drop; unfreeze re-enables it") {
    val path = tmp()
    spark.sql(s"SELECT create_hypertable('$path', 'ts', INTERVAL '1 day')")
    Hypertable.at(spark, path).write(events(48))
    val chunk = spark.sql(s"SELECT show_chunks('$path')").as[String].head()
    assert(spark.sql(s"SELECT freeze_chunk('$chunk')").as[Boolean].head())
    // frozen chunks are skipped by drop_chunks, like the reference
    val dropped = spark.sql(
      s"SELECT drop_chunks('$path', older_than => TIMESTAMP '2025-01-01 00:00:00')")
      .count()
    assert(spark.sql(s"SELECT show_chunks('$path')").count() === 1)
    assert(dropped === 1) // the other, unfrozen chunk went
    assert(spark.sql(s"SELECT unfreeze_chunk('$chunk')").as[Boolean].head())
    spark.sql(s"SELECT drop_chunks('$path', older_than => TIMESTAMP '2025-01-01 00:00:00')")
    assert(spark.sql(s"SELECT show_chunks('$path')").count() === 0)
  }

  test("retention/columnstore policies register real jobs with ids") {
    val path = tmp()
    spark.sql(s"SELECT create_hypertable('$path', 'ts')")
    val id = spark.sql(
      s"SELECT add_retention_policy('$path', INTERVAL '30 days')").as[Int].head()
    val id2 = spark.sql(
      s"SELECT add_columnstore_policy('$path', after => INTERVAL '7 days')")
      .as[Int].head()
    assert(id !== id2)
    val specs = Jobs.list(spark, path).map(_._1)
    assert(specs.exists(s => s.proc == "policy_retention" &&
      s.config("drop_after") == (30L * 86400000000L).toString))
    assert(specs.exists(s => s.proc == "policy_columnstore" &&
      s.config("compress_after") == (7L * 86400000000L).toString))
    // duplicate add errors, like the reference's if_not_exists=false default
    val err = intercept[Exception] {
      spark.sql(s"SELECT add_retention_policy('$path', INTERVAL '10 days')").collect()
    }
    assert(err.getMessage.contains("already exists"))
    assert(spark.sql(s"SELECT remove_retention_policy('$path')").as[Boolean].head())
    assert(!spark.sql(s"SELECT remove_retention_policy('$path')").as[Boolean].head())
    assert(Jobs.list(spark, path).map(_._1.proc) === Seq("policy_columnstore"))
  }

  test("CALL refresh_continuous_aggregate refreshes a registered cagg") {
    val htPath = tmp()
    val caggPath = tmp() + "/cagg"
    spark.sql(s"SELECT create_hypertable('$htPath', 'ts', INTERVAL '1 day')")
    val ht = Hypertable.at(spark, htPath)
    ht.write(events(48))
    val cagg = ContinuousAggregate.create(spark, caggPath, ht,
      CaggDef(bucketWidth = "1 hour", groupCols = Seq("user_id"),
        aggs = Seq(sum($"value").as("total"), count(lit(1)).as("n"))))
    spark.sql(s"CALL refresh_continuous_aggregate('$caggPath', NULL, NULL)")
    assert(cagg.materialized.count() === 48)
    // unknown path errors with a clear message
    val err = intercept[Exception] {
      spark.sql(s"CALL refresh_continuous_aggregate('/nope', NULL, NULL)").collect()
    }
    assert(err.getMessage.contains("no continuous aggregate registered"))
  }

  test("non-admin SQL is untouched by the parser extension") {
    assert(spark.sql("SELECT 1 + 1").as[Int].head() === 2)
    // a graft SQL function through the same parser path
    assert(spark.sql(
      "SELECT time_bucket(INTERVAL '1' HOUR, TIMESTAMP '2024-01-01 10:30:00')")
      .collect()(0).getTimestamp(0) ===
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))
    // an admin-looking name that is NOT registered delegates (and fails in
    // Spark's own resolver, not ours)
    val err = intercept[Exception] {
      spark.sql("SELECT definitely_not_registered_fn('/x')").collect()
    }
    assert(err.getMessage.contains("UNRESOLVED_ROUTINE"))

    // the declarative statement shapes intercept ONLY quoted-path forms
    // with tsdb options — plain Spark DDL on identifiers flows through
    spark.sql("CREATE TABLE graft_plain_t (a INT, b STRING) USING parquet " +
      s"LOCATION '${tmp()}/plain'")
    spark.sql("INSERT INTO graft_plain_t VALUES (1, 'x')")
    assert(spark.sql("SELECT * FROM graft_plain_t").count() === 1)
    spark.sql("ALTER TABLE graft_plain_t SET TBLPROPERTIES ('k' = 'v')")
    spark.sql("DROP TABLE graft_plain_t")
    // quoted path WITHOUT tsdb options also delegates (Spark rejects the
    // quoted name itself — never half-parsed as graft DDL)
    intercept[Exception] {
      spark.sql(s"CREATE TABLE '${tmp()}/x' (a INT) WITH (foo = 'bar')")
    }
    // a real temp view named like a table survives DROP TABLE delegation
    spark.range(3).createOrReplaceTempView("graft_plain_v")
    spark.sql("DROP VIEW graft_plain_v")
  }

  test("merge_chunks / split_chunk / recompress_chunk by SQL") {
    val path = tmp()
    spark.sql(s"SELECT create_hypertable('$path', 'ts', INTERVAL '1 day')")
    val ht = Hypertable.at(spark, path)
    ht.write(events(72)) // 3 day-chunks
    val chunks = spark.sql(s"SELECT show_chunks('$path')").as[String].collect()
    assert(chunks.length === 3)
    val merged = spark.sql(
      s"SELECT merge_chunks('${chunks(0)}', '${chunks(1)}')").as[String].head()
    assert(spark.sql(s"SELECT show_chunks('$path')").count() === 2)
    val split = spark.sql(s"SELECT split_chunk('$merged')").as[String].collect()
    assert(split.length === 2)
    assert(spark.sql(s"SELECT show_chunks('$path')").count() === 3)
    // recompress on a raw chunk = full compression (needs settings)
    ht.setColumnstoreSettings(Columnstore.Options(
      segmentBy = Seq("user_id"), orderBy = Seq("ts")))
    val c0 = spark.sql(s"SELECT show_chunks('$path')").as[String].head()
    spark.sql(s"SELECT recompress_chunk('$c0')").collect()
    assert(Columnstore.isCompressed(spark, c0))
    // row total survives all the surgery
    assert(ht.read().count() === 72)
  }

  test("detailed sizes and the job API by SQL") {
    val path = tmp()
    spark.sql(s"SELECT create_hypertable('$path', 'ts', INTERVAL '1 day')")
    Hypertable.at(spark, path).write(events(48))
    val d = spark.sql(s"SELECT hypertable_detailed_size('$path')").collect()(0)
    assert(d.getLong(0) > 0 && d.getLong(3) >= d.getLong(0))
    val cs = spark.sql(s"SELECT chunks_detailed_size('$path')").collect()
    assert(cs.length === 2 && cs.map(_.getLong(3)).sum === 48)

    val id = spark.sql(
      s"SELECT add_job('$path', 'policy_retention', INTERVAL '1 hour')").as[Int].head()
    spark.sql(s"SELECT alter_job('$path', $id, scheduled => false)").collect()
    assert(Jobs.list(spark, path).find(_._1.id == id).exists(!_._1.scheduled))
    assert(spark.sql(s"SELECT delete_job('$path', $id)").as[Boolean].head())
    assert(Jobs.list(spark, path).isEmpty)
  }

  test("add_continuous_aggregate_policy refreshes via run_job") {
    val htPath = tmp()
    val caggPath = tmp() + "/cagg"
    spark.sql(s"SELECT create_hypertable('$htPath', 'ts', INTERVAL '1 day')")
    val ht = Hypertable.at(spark, htPath)
    ht.write(events(48))
    ContinuousAggregate.create(spark, caggPath, ht,
      CaggDef(bucketWidth = "1 hour", groupCols = Seq("user_id"),
        aggs = Seq(sum($"value").as("total"))))
    val id = spark.sql(
      s"""SELECT add_continuous_aggregate_policy('$caggPath',
         | start_offset => INTERVAL '3650 days', end_offset => INTERVAL '0 days',
         | schedule_interval => INTERVAL '1 hour')""".stripMargin).as[Int].head()
    assert(spark.sql(s"SELECT run_job('$caggPath', $id)").as[Boolean].head())
    assert(ContinuousAggregate.atPath(caggPath).get.materialized.count() === 48)
    assert(spark.sql(
      s"SELECT remove_continuous_aggregate_policy('$caggPath')").as[Boolean].head())
  }

  test("timescaledb_information views are SQL-queryable and schema-true") {
    import graft.operators.Info
    val path = tmp()
    spark.sql(s"SELECT create_hypertable('$path', 'ts', INTERVAL '1 day')")
    val ht = Hypertable.at(spark, path)
    ht.write(events(48))
    spark.sql(s"SELECT add_retention_policy('$path', INTERVAL '30 days')")

    // dotted (reference) name and underscore alias both work
    val chunks = spark.sql(
      s"SELECT * FROM timescaledb_information.chunks('$path')").collect()
    assert(chunks.length === 2)
    assert(chunks.forall(r => !r.getBoolean(8))) // is_compressed
    val hts = spark.sql(
      s"SELECT timescaledb_information_hypertables('$path')").collect()
    assert(hts.length === 1 && hts(0).getLong(4) === 2L) // num_chunks
    assert(spark.sql(
      s"SELECT * FROM timescaledb_information.dimensions('$path')").count() === 1)
    val jobs = spark.sql(
      s"SELECT * FROM timescaledb_information.jobs('$path')").collect()
    assert(jobs.length === 1 && jobs(0).getString(2) === "policy_retention")
    assert(spark.sql(
      s"SELECT * FROM timescaledb_information.job_stats('$path')").count() === 1)

    // declared schemas mirror Info's DataFrames column-for-column
    import graft.plans.SqlAdmin
    def names(st: org.apache.spark.sql.types.StructType) =
      st.fields.map(f => (f.name, f.dataType)).toSeq
    assert(names(SqlAdmin.viewBaseOutputs("chunks")) === names(Info.chunks(ht).schema))
    assert(names(SqlAdmin.viewBaseOutputs("hypertables")) ===
      names(Info.hypertables(spark, Seq(path)).schema))
    assert(names(SqlAdmin.viewBaseOutputs("dimensions")) ===
      names(Info.dimensions(ht).schema))
    assert(names(SqlAdmin.viewBaseOutputs("jobs")) ===
      names(Info.jobs(spark, path).schema))
    assert(names(SqlAdmin.viewBaseOutputs("job_stats")) ===
      names(Info.jobStats(spark, path).schema))
    assert(names(SqlAdmin.viewBaseOutputs("job_history")) ===
      names(Info.jobHistory(spark, path).schema))
    assert(names(SqlAdmin.viewBaseOutputs("job_errors")) ===
      names(Info.jobErrors(spark, path).schema))
    assert(names(SqlAdmin.viewBaseOutputs("chunk_columnstore_settings")) ===
      names(Info.chunkColumnstoreSettings(ht).schema))
    assert(names(SqlAdmin.viewBaseOutputs("stat_chunk_activity")) ===
      names(Info.statChunkActivity(ht).schema))

    // chunk_columnstore_settings reports the settings a chunk was
    // COMPRESSED with; stat_chunk_activity reports real batch stats
    ht.setColumnstoreSettings(Columnstore.Options(
      segmentBy = Seq("user_id"), orderBy = Seq("ts")))
    val chunk = spark.sql(s"SELECT show_chunks('$path')").as[String].head()
    spark.sql(s"SELECT compress_chunk('$chunk')")
    val settings = spark.sql(
      s"SELECT * FROM timescaledb_information.chunk_columnstore_settings('$path')")
      .collect()
    assert(settings.length === 1)
    assert(settings(0).getAs[String]("segmentby") === "user_id")
    assert(settings(0).getAs[String]("orderby") === "ts")
    // the pre-rename *_compression_* view names alias their
    // *_columnstore_* twins (sql/views.sql:368-423)
    assert(spark.sql(
      s"SELECT * FROM timescaledb_information.chunk_compression_settings('$path')")
      .collect().toSeq ===
      spark.sql(
        s"SELECT * FROM timescaledb_information.chunk_columnstore_settings('$path')")
        .collect().toSeq)
    assert(spark.sql(
      s"SELECT * FROM timescaledb_information.hypertable_compression_stats('$path')")
      .count() === 1)
    val activity = spark.sql(
      s"SELECT * FROM timescaledb_information.stat_chunk_activity('$path')")
      .collect()
    assert(activity.length === 2) // both chunks report
    val compressedRow = activity.find(_.getAs[Boolean]("is_compressed")).get
    assert(compressedRow.getAs[Long]("batch_count") >= 1)
    assert(compressedRow.getAs[Long]("batch_rows_min") > 0)
    assert(compressedRow.getAs[Double]("batch_bytes_avg") > 0.0)
    assert(names(SqlAdmin.viewBaseOutputs("chunk_columnstore_stats")) ===
      names(Info.chunkColumnstoreStats(ht).schema))
    assert(names(SqlAdmin.viewBaseOutputs("hypertable_columnstore_stats")) ===
      names(Info.hypertableColumnstoreStats(ht).schema))
    assert(names(SqlAdmin.viewBaseOutputs("hypertable_columnstore_settings")) ===
      names(Info.hypertableColumnstoreSettings(ht).schema))
    assert(names(SqlAdmin.viewBaseOutputs("policies")) ===
      names(Info.policies(spark, path).schema))
  }

  test("timescaledb_information.continuous_aggregates by cagg path") {
    import graft.operators.Info
    val htPath = tmp()
    val caggPath = tmp() + "/cagg"
    spark.sql(s"SELECT create_hypertable('$htPath', 'ts', INTERVAL '1 day')")
    val ht = Hypertable.at(spark, htPath)
    ht.write(events(24))
    val cagg = ContinuousAggregate.create(spark, caggPath, ht,
      CaggDef(bucketWidth = "1 hour", groupCols = Seq("user_id"),
        aggs = Seq(sum($"value").as("total"))))
    val r = spark.sql(
      s"SELECT * FROM timescaledb_information.continuous_aggregates('$caggPath')")
      .collect()
    assert(r.length === 1 && r(0).getString(0) === caggPath)
    def names(st: org.apache.spark.sql.types.StructType) =
      st.fields.map(f => (f.name, f.dataType)).toSeq
    assert(names(graft.plans.SqlAdmin.viewBaseOutputs("continuous_aggregates")) ===
      names(Info.continuousAggregates(Seq(cagg)).schema))
  }

  test("experimental policy bundle add/show/alter/remove by SQL") {
    val path = tmp()
    spark.sql(s"SELECT create_hypertable('$path', 'ts')")
    assert(spark.sql(
      s"""SELECT add_policies('$path', drop_after => INTERVAL '90 days',
         | compress_after => INTERVAL '7 days')""".stripMargin)
      .as[Boolean].head())
    val shown = spark.sql(s"SELECT show_policies('$path')").collect()
    assert(shown.map(_.getString(0)).toSet ===
      Set("policy_columnstore", "policy_retention"))
    spark.sql(s"SELECT alter_policies('$path', drop_after => INTERVAL '30 days')")
    val alt = spark.sql(s"SELECT show_policies('$path')").collect()
    assert(alt.map(_.getString(0)).toSeq === Seq("policy_retention"))
    assert(alt(0).getLong(1) === 30L * 86400000000L)
    assert(spark.sql(s"SELECT remove_policies('$path')").as[Boolean].head())
    assert(spark.sql(s"SELECT show_policies('$path')").count() === 0)

    // remove_all_policies (sql/policy_api.sql:147-152): bundle AND every
    // registered policy_* job go in one call; if_exists governs the
    // nothing-to-remove case
    spark.sql(s"SELECT add_policies('$path', drop_after => INTERVAL '90 days')")
    spark.sql(
      s"SELECT add_retention_policy('$path', drop_after => INTERVAL '90 days')")
    assert(spark.sql(s"SELECT remove_all_policies('$path')").as[Boolean].head())
    assert(spark.sql(s"SELECT show_policies('$path')").count() === 0)
    assert(graft.sources.Jobs.list(spark, path)
      .count(_._1.proc.startsWith("policy_")) === 0)
    val eNone = intercept[Exception] {
      spark.sql(s"SELECT remove_all_policies('$path')").collect()
    }
    assert(eNone.getMessage.contains("no policies"))
    assert(!spark.sql(
      s"SELECT remove_all_policies('$path', if_exists => true)")
      .as[Boolean].head())
  }

  test("refresh options jsonb: buckets_per_batch carves, " +
      "max_batches_per_execution caps newest-first and logs the remainder " +
      "(ddl_api.sql:200-206)") {
    val dir = tmp()
    spark.sql(s"SELECT create_hypertable('$dir/ht', 'ts', INTERVAL '1 day')")
    val ht = Hypertable.at(spark, s"$dir/ht")
    ht.write(events(96)) // 4 days of hourly rows
    spark.sql(s"SELECT create_continuous_aggregate('$dir/c', '$dir/ht', " +
      s"INTERVAL '1 day', '', 'count(1) AS n')")
    val c = ContinuousAggregate.atPath(spark, s"$dir/c").get
    // 4 daily buckets; 1-bucket batches capped at 2, newest-first: only
    // the newest two days materialize now
    spark.sql(s"CALL refresh_continuous_aggregate('$dir/c', NULL, NULL, " +
      """options => '{"buckets_per_batch": 1, "max_batches_per_execution": 2}')""")
    assert(c.materialized.count() === 2)
    assert(c.materialized.agg(min(unix_micros($"bucket"))).head().getLong(0)
      === java.sql.Timestamp.valueOf("2024-01-03 00:00:00").getTime * 1000L)
    // the two SKIPPED (older) batches were re-logged as invalidations
    // below the advanced threshold — the next pass picks them up
    assert(c.pendingInvalidations().nonEmpty)
    c.refreshInvalidated()
    assert(c.materialized.count() === 4)
    // unknown options error like the reference's jsonb validation
    val eOpt = intercept[Exception] {
      spark.sql(s"CALL refresh_continuous_aggregate('$dir/c', NULL, NULL, " +
        """options => '{"nope": 1}')""")
    }
    assert(eOpt.getMessage.contains("unsupported option"))
    // mistyped values error rather than silently degrading to an
    // unbatched refresh
    val eBad = intercept[Exception] {
      spark.sql(s"CALL refresh_continuous_aggregate('$dir/c', NULL, NULL, " +
        """options => '{"buckets_per_batch": "ten"}')""")
    }
    assert(eBad.getMessage.contains("non-negative integer"))
    // an explicit inverted window errors exactly like the option-less CALL
    val eInv = intercept[Exception] {
      spark.sql(s"CALL refresh_continuous_aggregate('$dir/c', " +
        s"TIMESTAMP '2024-01-02 00:00:00', TIMESTAMP '2024-01-01 00:00:00', " +
        """false, options => '{"buckets_per_batch": 1}')""")
    }
    assert(eInv.getMessage.contains("refresh window"))
  }

  test("refresh options: absent buckets_per_batch defaults to 10 " +
      "(DEFAULT_BUCKETS_PER_BATCH, refresh.c:784-788) so a lone " +
      "max_batches_per_execution still caps") {
    val dir = tmp()
    spark.sql(s"SELECT create_hypertable('$dir/ht', 'ts', INTERVAL '1 day')")
    val ht = Hypertable.at(spark, s"$dir/ht")
    ht.write(events(30 * 24)) // 30 days of hourly rows → 30 daily buckets
    spark.sql(s"SELECT create_continuous_aggregate('$dir/c', '$dir/ht', " +
      s"INTERVAL '1 day', '', 'count(1) AS n')")
    val c = ContinuousAggregate.atPath(spark, s"$dir/c").get
    // reference behavior: {"max_batches_per_execution": 2} alone means two
    // DEFAULT-sized (10-bucket) batches, newest-first → 20 of 30 buckets
    // materialize, remainder re-logged. The pre-fix behavior (absent key →
    // single pass) would have materialized all 30 and logged nothing.
    spark.sql(s"CALL refresh_continuous_aggregate('$dir/c', NULL, NULL, " +
      """options => '{"max_batches_per_execution": 2}')""")
    assert(c.materialized.count() === 20)
    assert(c.pendingInvalidations().nonEmpty)
    c.refreshInvalidated()
    assert(c.materialized.count() === 30)
  }

  test("offset-form caggs: time_bucket(w, ts, '30m'::interval) shifts the " +
      "bucket grid (cagg_4_hours_offset, cagg_query_common.sql)") {
    val dir = tmp()
    spark.sql(s"SELECT create_hypertable('$dir/temperature', 'ts', INTERVAL '1 day')")
    val ht = Hypertable.at(spark, s"$dir/temperature")
    // reference setup: INSERT ('2000-01-01 01:00:00', 5)
    ht.write(Seq((java.sql.Timestamp.valueOf("2000-01-01 01:00:00"), 5.0))
      .toDF("ts", "value"))
    spark.sql(
      s"""CREATE MATERIALIZED VIEW '$dir/cagg_4h_offset' WITH (tsdb.continuous)
         |AS SELECT time_bucket('4 hour', ts, '30m') AS bucket, max(value) AS max
         |FROM '$dir/temperature' GROUP BY 1""".stripMargin)
    val rows = graft.streaming.ContinuousAggregate
      .atPath(spark, s"$dir/cagg_4h_offset").get.materialized
      .select(unix_micros($"bucket"), $"max").as[(Long, Double)].collect().toSeq
    // grid ... 20:30, 00:30, 04:30: 01:00 lands in the 00:30 bucket
    assert(rows === Seq(
      (java.sql.Timestamp.valueOf("2000-01-01 00:30:00").getTime * 1000L, 5.0)))
    // call form takes offset => INTERVAL too
    spark.sql(s"SELECT create_continuous_aggregate('$dir/c2', " +
      s"'$dir/temperature', INTERVAL '4 hours', '', 'max(value) AS max', " +
      s"offset => INTERVAL '30 minutes', with_data => true)")
    val rows2 = graft.streaming.ContinuousAggregate
      .atPath(spark, s"$dir/c2").get.materialized
      .select(unix_micros($"bucket"), $"max").as[(Long, Double)].collect().toSeq
    assert(rows2.map(_._1) === rows.map(_._1))
  }

  test("create_hypertable rejects an interval string bound positionally as " +
      "the partitioning column") {
    val e = intercept[Exception] {
      spark.sql(s"SELECT create_hypertable('${tmp()}/x', 'ts', '7 days')")
    }
    assert(e.getMessage.contains("chunk_interval"))
    // PG short units must be caught by the same guard ('7d' parses via
    // pgIntervalText everywhere else in the engine)
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT create_hypertable('${tmp()}/x', 'ts', '7d')")
    }
    assert(e2.getMessage.contains("chunk_interval"))
  }

  test("argument errors are informative") {
    val path = tmp()
    spark.sql(s"SELECT create_hypertable('$path', 'ts')")
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT drop_chunks('$path')").collect()
    }
    assert(e1.getMessage.contains("older_than"))
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT show_chunks('$path', bogus_arg => 1)").collect()
    }
    assert(e2.getMessage.contains("bogus_arg"))
    // the same argument given both positionally and by name is an error,
    // never a silent preference
    val e3 = intercept[Exception] {
      spark.sql(s"""SELECT show_chunks('$path', TIMESTAMP '2024-01-01 00:00:00',
        | older_than => TIMESTAMP '2024-06-01 00:00:00')""".stripMargin).collect()
    }
    assert(e3.getMessage.contains("both positionally and by name"))
    // extra trailing positionals error instead of silently dropping
    val e4 = intercept[Exception] {
      spark.sql(s"SELECT hypertable_size('$path', 'junk')").collect()
    }
    assert(e4.getMessage.contains("too many positional"))
  }

  test("create_continuous_aggregate by SQL: create, refresh, drop") {
    val htPath = tmp()
    val caggPath = tmp() + "/cagg"
    spark.sql(s"SELECT create_hypertable('$htPath', 'ts', INTERVAL '1 day')")
    val ht = Hypertable.at(spark, htPath)
    ht.write(events(48))
    val created = spark.sql(
      s"""SELECT create_continuous_aggregate('$caggPath', '$htPath',
         | INTERVAL '1 hour', 'user_id',
         | 'sum(value) AS total, count(1) AS n')""".stripMargin).collect()
    assert(created(0).getString(0) === caggPath && created(0).getBoolean(1))
    spark.sql(s"CALL refresh_continuous_aggregate('$caggPath', NULL, NULL)")
    val cagg = ContinuousAggregate.atPath(caggPath).get
    assert(cagg.materialized.count() === 48)
    // the materialized totals agree with a direct aggregation
    val direct = ht.read().groupBy(window($"ts", "1 hour"), $"user_id")
      .agg(sum($"value")).count()
    assert(cagg.materialized.count() === direct)
    assert(spark.sql(
      s"SELECT drop_continuous_aggregate('$caggPath')").as[Boolean].head())
    assert(ContinuousAggregate.atPath(caggPath).isEmpty)
    assert(!spark.sql(
      s"SELECT drop_continuous_aggregate('$caggPath')").as[Boolean].head())
  }

  test("dimension DDL by SQL: add_dimension, set_number_partitions, set_partitioning_interval, set_integer_now_func") {
    // sql/ddl_api.sql:56-87,115-177 call forms
    val path = tmp() + "/ht"
    spark.sql(s"SELECT create_hypertable('$path', 'ts', 'user_id', 4)")
    // by_hash dimension_info constructor
    val added = spark.sql(
      s"SELECT add_dimension('$path', by_hash('value', 2))").collect()(0)
    assert(added.getInt(0) === 3 && added.getString(1) === "value" && added.getBoolean(2))
    val ht = Hypertable.at(spark, path)
    assert(ht.spaceDims.map(d => (d._1, d._2)) === Seq(("user_id", 4), ("value", 2)))
    // old-style positional form on a fresh table
    val p2 = tmp() + "/ht2"
    spark.sql(s"SELECT create_hypertable('$p2', 'ts')")
    spark.sql(s"SELECT add_dimension('$p2', 'user_id', 2)")
    assert(Hypertable.at(spark, p2).spaceDims.map(_._1) === Seq("user_id"))
    // by_range second dimensions are rejected with the documented reason
    val e = intercept[Exception] {
      spark.sql(s"SELECT add_dimension('$p2', by_range('value', INTERVAL '1 day'))")
        .collect()
    }
    assert(e.getMessage.contains("by_range"))

    // set_number_partitions defaults dimension_name to the closed dim
    spark.sql(s"SELECT set_number_partitions('$path', 8)")
    assert(Hypertable.at(spark, path).spacePartitions === 8)
    // set_partitioning_interval = set_chunk_time_interval on the open dim
    spark.sql(s"SELECT set_partitioning_interval('$path', INTERVAL '2 days')")
    Hypertable.at(spark, path).write(events(96))
    assert(spark.sql(s"SELECT show_chunks('$path')").count() === 2)

    // set_integer_now_func registers the bigint clock
    val p3 = tmp() + "/ht3"
    spark.sql(s"SELECT create_hypertable('$p3', 'seq', " +
      "chunk_interval => 1000, time_kind => 'bigint')")
    Hypertable.registerIntegerNow("test_now")(() => 5000L)
    assert(spark.sql(s"SELECT set_integer_now_func('$p3', 'test_now')")
      .as[Boolean].head())
    assert(Hypertable.at(spark, p3).integerNowFunc === Some("test_now"))
  }

  test("declarative CREATE TABLE ... WITH (tsdb.hypertable, ...) creates the hypertable") {
    // reference surface: src/with_clause/create_table_with_clause.c
    val path = tmp() + "/ht"
    spark.sql(
      s"""CREATE TABLE '$path' (ts TIMESTAMP, user_id BIGINT, value DOUBLE)
         |WITH (tsdb.hypertable, tsdb.partition_column='ts',
         |      tsdb.chunk_interval='1 day',
         |      tsdb.segmentby='user_id', tsdb.orderby='ts')""".stripMargin)
    val ht = Hypertable.at(spark, path)
    assert(ht.timeCol === "ts")
    ht.write(events(96)) // 4 days → 4 chunks at 1 day
    assert(spark.sql(s"SELECT show_chunks('$path')").count() === 4)
    // the declared columnstore settings are stored and effective
    val opts = Columnstore.resolveOptions(ht)
    assert(opts.segmentBy === Seq("user_id") && opts.orderBy === Seq("ts"))
    val chunk = spark.sql(s"SELECT show_chunks('$path')").as[String].head()
    spark.sql(s"SELECT compress_chunk('$chunk')")
    assert(Columnstore.isCompressed(spark, chunk))

    // default partition column = first timestamp column (the reference's
    // rule, src/process_utility.c:4245); timescaledb. prefix; IF NOT
    // EXISTS is a no-op on an existing table
    val p2 = tmp() + "/ht2"
    spark.sql(s"CREATE TABLE '$p2' (v DOUBLE, t TIMESTAMP) WITH (timescaledb.hypertable)")
    assert(Hypertable.at(spark, p2).timeCol === "t")
    spark.sql(s"CREATE TABLE IF NOT EXISTS '$p2' (v DOUBLE, t TIMESTAMP) " +
      "WITH (tsdb.hypertable, tsdb.chunk_interval='2 days')")
    assert(Hypertable.at(spark, p2).timeCol === "t")

    // bigint partition column derives integer time kind
    val p3 = tmp() + "/ht3"
    spark.sql(s"CREATE TABLE '$p3' (seq BIGINT, v DOUBLE) " +
      "WITH (tsdb.hypertable, tsdb.partition_column='seq', tsdb.chunk_interval=1000)")
    assert(Hypertable.at(spark, p3).timeKind === "bigint")

    // unknown tsdb option errors; missing hypertable flag errors; a
    // non-tsdb WITH clause falls through to Spark's parser
    val e1 = intercept[Exception] {
      spark.sql(s"CREATE TABLE '${tmp()}/x' (ts TIMESTAMP) " +
        "WITH (tsdb.hypertable, tsdb.bogus_option='1')")
    }
    assert(e1.getMessage.contains("unsupported"))
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE TABLE '${tmp()}/x' (ts TIMESTAMP) WITH (tsdb.orderby='ts')")
    }
    assert(e2.getMessage.contains("tsdb.hypertable"))
    intercept[Exception] { // Spark's parser rejects the quoted name
      spark.sql(s"CREATE TABLE '${tmp()}/x' (ts TIMESTAMP) WITH (foo='bar')")
    }
  }

  test("declarative CREATE MATERIALIZED VIEW ... WITH (tsdb.continuous) builds a cagg") {
    // reference surface: tsl/src/continuous_aggs/create.c + cagg_ddl.sql
    val htPath = tmp() + "/ht"
    val caggPath = tmp() + "/cagg"
    spark.sql(s"SELECT create_hypertable('$htPath', 'ts', INTERVAL '1 day')")
    val ht = Hypertable.at(spark, htPath)
    ht.write(events(48))
    // default WITH DATA (Postgres's materialized-view default)
    spark.sql(
      s"""CREATE MATERIALIZED VIEW '$caggPath'
         |WITH (tsdb.continuous, tsdb.materialized_only=false)
         |AS SELECT time_bucket('1 hour', ts) AS bucket, user_id,
         |  sum(value) AS total, count(1) AS n
         |FROM '$htPath' GROUP BY bucket, user_id""".stripMargin)
    val cagg = ContinuousAggregate.atPath(spark, caggPath).get
    assert(cagg.materialized.count() === 48)
    assert(cagg.defn.groupCols === Seq("user_id"))
    val direct = ht.read().groupBy(window($"ts", "1 hour"), $"user_id")
      .agg(sum($"value")).count()
    assert(cagg.materialized.count() === direct)

    // WITH NO DATA + GROUP BY ordinals + bare-width literal
    val cagg2Path = tmp() + "/cagg2"
    spark.sql(
      s"""CREATE MATERIALIZED VIEW '$cagg2Path' WITH (timescaledb.continuous)
         |AS SELECT time_bucket('1 day', ts) AS day, count(1) AS n
         |FROM '$htPath' GROUP BY 1 WITH NO DATA""".stripMargin)
    val cagg2 = ContinuousAggregate.atPath(spark, cagg2Path).get
    assert(cagg2.materialized.count() === 0)
    spark.sql(s"CALL refresh_continuous_aggregate('$cagg2Path', NULL, NULL)")
    assert(cagg2.materialized.count() === 2)

    // GROUP BY may repeat the raw time_bucket expression, the standard
    // Postgres form (not just the alias / ordinal)
    val cagg3Path = tmp() + "/cagg3"
    spark.sql(
      s"""CREATE MATERIALIZED VIEW '$cagg3Path' WITH (tsdb.continuous)
         |AS SELECT time_bucket('1 day', ts) AS day, count(1) AS n
         |FROM '$htPath' GROUP BY time_bucket('1 day', ts) WITH DATA""".stripMargin)
    assert(ContinuousAggregate.atPath(spark, cagg3Path).get.materialized.count() === 2)

    // a bare CREATE TABLE on an existing hypertable errors (no silent
    // meta rewrite); IF NOT EXISTS stays a no-op
    val eDup = intercept[Exception] {
      spark.sql(s"CREATE TABLE '$htPath' (ts TIMESTAMP) WITH (tsdb.hypertable)")
    }
    assert(eDup.getMessage.contains("already exists"))

    // malformed shapes error with clear messages
    val e1 = intercept[Exception] {
      spark.sql(s"CREATE MATERIALIZED VIEW '${tmp()}/c' WITH (tsdb.continuous) " +
        s"AS SELECT count(1) AS n FROM '$htPath' GROUP BY 1")
    }
    assert(e1.getMessage.contains("time_bucket"))
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE MATERIALIZED VIEW '${tmp()}/c' WITH (tsdb.continuous) " +
        s"AS SELECT time_bucket('1 hour', ts) AS b, user_id, sum(value) AS s " +
        s"FROM '$htPath' GROUP BY b")
    }
    assert(e2.getMessage.contains("not in GROUP BY"))
  }

  test("columnstore-era names, chunk attach/detach, and size variants by SQL") {
    val path = tmp() + "/ht"
    spark.sql(s"SELECT create_hypertable('$path', 'ts', INTERVAL '1 day')")
    val ht = Hypertable.at(spark, path)
    ht.setColumnstoreSettings(Columnstore.Options(
      segmentBy = Seq("user_id"), orderBy = Seq("ts")))
    ht.write(events(48))
    val chunk = spark.sql(s"SELECT show_chunks('$path')").as[String].head()
    // convert_to_columnstore / convert_to_rowstore are the modern names
    // of compress/decompress_chunk (sql/maintenance_utils.sql)
    spark.sql(s"SELECT convert_to_columnstore('$chunk')")
    assert(Columnstore.isCompressed(spark, chunk))
    spark.sql(s"SELECT convert_to_rowstore('$chunk')")
    assert(!Columnstore.isCompressed(spark, chunk))
    // bare stats table functions mirror the views
    assert(spark.sql(s"SELECT * FROM chunk_compression_stats('$path')")
      .count() === 2)
    assert(spark.sql(s"SELECT * FROM hypertable_columnstore_stats('$path')")
      .count() === 1)
    // size variants: approximate == exact (the listing IS the catalog)
    val exact = spark.sql(s"SELECT hypertable_size('$path')").as[Long].head()
    assert(spark.sql(s"SELECT hypertable_approximate_size('$path')")
      .as[Long].head() === exact)
    val det = spark.sql(s"SELECT hypertable_detailed_size('$path')").collect()(0)
    val approx = spark.sql(
      s"SELECT hypertable_approximate_detailed_size('$path')").collect()(0)
    assert(det.toSeq === approx.toSeq)
    assert(spark.sql(s"SELECT hypertable_index_size('$path')")
      .as[Long].head() === det.getLong(1))
    // detach_chunk moves the dir out; attach_chunk adopts it back
    val dest = tmp() + "/standalone"
    val detached = spark.sql(
      s"SELECT detach_chunk('$chunk', '$dest')").as[String].head()
    assert(detached === dest)
    assert(spark.sql(s"SELECT show_chunks('$path')").count() === 1)
    val start = chunk.substring(chunk.lastIndexOf("_chunk=") + 7).toLong
    val end = start + 86400000000L
    spark.sql(s"SELECT attach_chunk('$path', '$dest', $start, $end)")
    assert(spark.sql(s"SELECT show_chunks('$path')").count() === 2)
    assert(Hypertable.at(spark, path).read().count() === 48)
    // merge_chunks_concurrently = merge_chunks (readers never block here)
    val chunks = spark.sql(s"SELECT show_chunks('$path')").as[String].collect()
    spark.sql(s"SELECT merge_chunks_concurrently('${chunks(0)}', '${chunks(1)}')")
    assert(spark.sql(s"SELECT show_chunks('$path')").count() === 1)
    assert(Hypertable.at(spark, path).read().count() === 48)
  }

  test("ALTER TABLE SET, DROP MATERIALIZED VIEW, DROP TABLE, creation-bound chunk ops") {
    val path = tmp() + "/ht"
    spark.sql(s"SELECT create_hypertable('$path', 'ts', INTERVAL '1 day')")
    Hypertable.at(spark, path).write(events(48))
    // ALTER TABLE ... SET stores columnstore settings and chunk interval
    // (src/with_clause/alter_table_with_clause.c option names)
    spark.sql(s"ALTER TABLE '$path' SET (timescaledb.enable_columnstore, " +
      "timescaledb.segmentby = 'user_id', timescaledb.orderby = 'ts')")
    val opts = Columnstore.resolveOptions(Hypertable.at(spark, path))
    assert(opts.segmentBy === Seq("user_id") && opts.orderBy === Seq("ts"))
    val chunk = spark.sql(s"SELECT show_chunks('$path')").as[String].head()
    spark.sql(s"SELECT compress_chunk('$chunk')")
    assert(Columnstore.isCompressed(spark, chunk))
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE '$path' SET (tsdb.enable_columnstore = false)")
    }
    assert(e.getMessage.contains("cannot be disabled"))

    // creation-bound chunk listing/drop by SQL (arrival-time retention);
    // every chunk was just written, so a future created_before sees all
    // and an epoch one sees none — and mixing bound kinds errors
    assert(spark.sql(s"SELECT show_chunks('$path', " +
      "created_before => TIMESTAMP '2030-01-01 00:00:00')").count() === 2)
    assert(spark.sql(s"SELECT show_chunks('$path', " +
      "created_before => TIMESTAMP '1990-01-01 00:00:00')").count() === 0)
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT show_chunks('$path', older_than => TIMESTAMP " +
        "'2030-01-01 00:00:00', created_before => TIMESTAMP '2030-01-01 00:00:00')")
        .collect()
    }
    assert(e2.getMessage.contains("cannot mix"))
    assert(spark.sql(s"SELECT drop_chunks('$path', " +
      "created_before => TIMESTAMP '1990-01-01 00:00:00')").count() === 0)

    // DROP MATERIALIZED VIEW drops a registered cagg; IF EXISTS tolerates
    val caggPath = tmp() + "/cagg"
    spark.sql(s"SELECT create_continuous_aggregate('$caggPath', '$path', " +
      "INTERVAL '1 hour', 'user_id', 'count(1) AS n')")
    assert(ContinuousAggregate.atPath(caggPath).isDefined)
    spark.sql(s"DROP MATERIALIZED VIEW '$caggPath'")
    assert(ContinuousAggregate.atPath(caggPath).isEmpty)
    intercept[Exception] { spark.sql(s"DROP MATERIALIZED VIEW '$caggPath'") }
    spark.sql(s"DROP MATERIALIZED VIEW IF EXISTS '$caggPath'") // no-op

    // DROP TABLE removes the hypertable; IF EXISTS tolerates absence
    spark.sql(s"DROP TABLE '$path'")
    intercept[Exception] { Hypertable.at(spark, path) }
    intercept[Exception] { spark.sql(s"DROP TABLE '$path'") }
    spark.sql(s"DROP TABLE IF EXISTS '$path'") // no-op
  }

  test("composite statements headed by an admin name delegate to Spark") {
    // UNION of two admin calls is not a simple call — it must reach
    // Spark's parser (which rejects the unknown routine), never be
    // half-parsed as mangled admin arguments
    val err = intercept[Exception] {
      spark.sql("SELECT show_chunks('/a') UNION ALL SELECT show_chunks('/b')")
        .collect()
    }
    assert(err.getMessage.contains("UNRESOLVED_ROUTINE") ||
      err.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))
  }
}
