package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Non-parquet source/sink surface (SURVEY.md §2.B Sources): CSV and
  * JSON(-lines) read/write with explicit schemas. Each query round-trips
  * a parquet table through the format and back, so the DuckDB oracle over
  * the original parquet verifies the full write→read path (quoting,
  * escaping, type mapping).
  *
  * Scale note: both writers emit one file per partition (no driver
  * funnel) and both readers split files across executors; schemas are
  * explicit — `inferSchema` burns a full extra pass over 100 TB and is
  * only for exploration (see SourcesSpec).
  */
object Sources {

  /** Stable per-process scratch path: repeated invocations overwrite the
    * same directory (mode("overwrite")) instead of leaking a fresh table
    * copy into /tmp on every bench/verify call.
    */
  private def tmpDir(name: String): String = {
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_sources", name)
    Files.createDirectories(base.getParent)
    base.toString
  }

  val nationSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customerSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  /** parquet → csv (quoted, headered) → csv scan with explicit schema. */
  def q_source_csv(s: SparkSession, d: String): DataFrame = {
    val out = tmpDir(s"csv_${math.abs(d.hashCode).toHexString}")
    Tables.nation(s, d).write.mode("overwrite").option("header", "true").csv(out)
    s.read.schema(nationSchema).option("header", "true").csv(out)
      .orderBy("n_nationkey")
  }

  /** parquet → json-lines → json scan with explicit schema. */
  def q_source_json(s: SparkSession, d: String): DataFrame = {
    val out = tmpDir(s"json_${math.abs(d.hashCode).toHexString}")
    Tables.customer(s, d).write.mode("overwrite").json(out)
    s.read.schema(customerSchema).json(out)
      .orderBy("c_custkey")
  }

  /** Schema evolution across parquet generations: generation 1 writes
    * (key, name), generation 2 adds a column; `mergeSchema=true` reads
    * both under the UNION schema, old rows null-filled — the standard
    * additive-evolution contract a long-lived training-data lake needs
    * (at scale the merged footer union is driven by the same option on
    * a partitioned table; drop/rename need a table format on top).
    * Oracle reproduces the merged relation from the source table.
    */
  def q_source_evolution(s: SparkSession, d: String): DataFrame = {
    val out = tmpDir(s"evo_${math.abs(d.hashCode).toHexString}")
    val nation = Tables.nation(s, d)
    nation.select(col("n_nationkey"), col("n_name"))
      .write.mode("overwrite").parquet(s"$out/gen=1")
    nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .write.mode("overwrite").parquet(s"$out/gen=2")
    s.read.option("mergeSchema", "true")
      .parquet(s"$out/gen=1", s"$out/gen=2")
      .orderBy(col("n_nationkey"), col("n_regionkey").asc_nulls_first)
  }

  /** parquet → XML → XML scan with explicit schema: Spark 4 ships the
    * XML data source natively (`rowTag`-delimited records; multiline
    * parse per file, so XML splits by FILE, not by record — keep files
    * bounded at scale, unlike the splittable columnar formats). Oracle
    * is the source table: the round trip must be lossless.
    */
  def q_source_xml(s: SparkSession, d: String): DataFrame = {
    val out = tmpDir(s"xml_${math.abs(d.hashCode).toHexString}")
    Tables.nation(s, d).write.mode("overwrite")
      .option("rowTag", "nation").xml(out)
    s.read.schema(nationSchema).option("rowTag", "nation").xml(out)
      .orderBy("n_nationkey")
  }

  /** parquet → ORC → ORC scan: the second columnar format Spark ships
    * natively (predicate pushdown, column pruning, and splittable files
    * work the same as parquet — SourcesSpec asserts the pushdown).
    */
  def q_source_orc(s: SparkSession, d: String): DataFrame = {
    val out = tmpDir(s"orc_${math.abs(d.hashCode).toHexString}")
    Tables.supplier(s, d).write.mode("overwrite").orc(out)
    s.read.orc(out).orderBy("s_suppkey")
  }

  /** parquet → line-text → text scan: the raw-text interchange format.
    * `read.text` yields one row per line in a single `value` column;
    * the rollup's closed form over the source table is the oracle.
    */
  def q_source_text(s: SparkSession, d: String): DataFrame = {
    val out = tmpDir(s"text_${math.abs(d.hashCode).toHexString}")
    Tables.documents(s, d).select(col("text")).write.mode("overwrite").text(out)
    s.read.text(out)
      .agg(
        count(lit(1)).as("n_lines"),
        sum(length(col("value"))).cast("long").as("total_chars"),
        countDistinct(col("value")).as("n_distinct"))
  }

  /** Opaque-file ingest (`binaryFile` source): each file arrives as
    * (path, length, content BINARY) — the media/raw-asset on-ramp of a
    * multimodal pipeline. Written as a fixed number of line-text files
    * so the byte totals have a closed form (text bytes + one newline
    * per row) for the oracle; file names are engine-generated, so the
    * gate surface is the file-count/byte rollup, not names.
    */
  def q_source_binaryfile(s: SparkSession, d: String): DataFrame = {
    val out = tmpDir(s"binf_${math.abs(d.hashCode).toHexString}")
    Tables.documents(s, d).select(col("text"))
      .repartition(4).write.mode("overwrite").text(out)
    s.read.format("binaryFile").option("pathGlobFilter", "*.txt").load(out)
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("length")).cast("long").as("total_bytes"),
        sum(octet_length(col("content"))).cast("long").as("content_bytes"))
  }

  /** Bucketed co-located join, end-to-end: write both sides bucketed +
    * sorted on the join key (`Sinks.bucketedTable`), then join the
    * TABLES — with matching bucket counts Spark plans a sort-merge join
    * with ZERO Exchange (the per-query shuffle is paid once at ingest;
    * the layout survives in the catalog). The gate compares against the
    * plain-join oracle, so the layout's correctness — not just its
    * plan shape — is verified.
    */
  def q_join_bucketed(s: SparkSession, d: String): DataFrame = {
    val tag = math.abs(d.hashCode).toHexString
    val (to, tc) = (s"bkt_orders_$tag", s"bkt_customer_$tag")
    Seq(to, tc).foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
    Sinks.bucketedTable(Tables.orders(s, d), to, tmpDir(to), 8, Seq("o_custkey"))
    Sinks.bucketedTable(Tables.customer(s, d), tc, tmpDir(tc), 8, Seq("c_custkey"))
    s.table(to)
      .join(s.table(tc), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("gross"))
      .orderBy("c_mktsegment")
  }

  /** Avro record schema for the `nation` round-trip (kept as a JSON
    * string so executor closures re-parse it locally — `Schema` is
    * heavyweight to ship and the parse is once per partition).
    */
  private val nationAvroSchema: String =
    """{"type":"record","name":"nation","fields":[
      |{"name":"n_nationkey","type":"int"},
      |{"name":"n_name","type":"string"},
      |{"name":"n_regionkey","type":"int"}]}""".stripMargin

  /** parquet → Avro container files → Avro scan: the most common wire /
    * interchange format missing from the matrix. The sandbox image ships
    * Avro core + `avro-mapred` but NOT the `spark-avro` datasource
    * module, so the round trip uses the public Hadoop MapReduce
    * integration (`AvroKeyOutputFormat`/`AvroKeyInputFormat`) — the same
    * layer `spark-avro` itself builds on. Semantics are identical to the
    * module: real `.avro` container files on disk (schema in the header,
    * deflate-able blocks, sync markers → files are SPLITTABLE, so the
    * read parallelizes across executors exactly like the columnar
    * formats); the writer emits one container per partition with no
    * driver funnel. GenericRecords are created and consumed inside the
    * same task (no shuffle touches them), and the reader copies fields
    * out of Hadoop's reused record before anything downstream sees them.
    */
  def q_source_avro(s: SparkSession, d: String): DataFrame = {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericRecord}
    import org.apache.avro.mapred.AvroKey
    import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
    import org.apache.hadoop.io.NullWritable
    import org.apache.hadoop.mapreduce.Job
    import org.apache.spark.sql.Row

    val out = tmpDir(s"avro_${math.abs(d.hashCode).toHexString}")
    // the Hadoop committer refuses an existing output dir — this scratch
    // path is per-process-stable, so clear the previous run's copy
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val schemaJson = nationAvroSchema

    val writeJob = Job.getInstance(s.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(writeJob, new Schema.Parser().parse(schemaJson))
    Tables.nation(s, d).select("n_nationkey", "n_name", "n_regionkey").rdd
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        it.map { r =>
          val rec = new GenericData.Record(schema)
          rec.put("n_nationkey", r.getInt(0))
          rec.put("n_name", r.getString(1))
          rec.put("n_regionkey", r.getInt(2))
          (new AvroKey[GenericRecord](rec), NullWritable.get())
        }
      }
      .saveAsNewAPIHadoopFile(out, classOf[AvroKey[GenericRecord]],
        classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
        writeJob.getConfiguration)

    val readJob = Job.getInstance(s.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(readJob, new Schema.Parser().parse(schemaJson))
    val back = s.sparkContext.newAPIHadoopFile(out,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable],
        readJob.getConfiguration)
      .map { case (k, _) =>
        // k.datum() is the SAME GenericRecord reused by the Hadoop
        // reader across next() calls — no copy happens here. Extract
        // every field into locals BEFORE this map call returns, so a
        // later buffering step (grouped/toSeq/cache of the raw pairs)
        // can never observe an overwritten record.
        val rec = k.datum()
        val key = rec.get("n_nationkey").asInstanceOf[Int]
        val name = rec.get("n_name").toString
        val regionKey = rec.get("n_regionkey").asInstanceOf[Int]
        Row(key, name, regionKey)
      }
    s.createDataFrame(back, nationSchema).orderBy("n_nationkey")
  }

  /** JDBC round-trip against an EMBEDDED Derby database (the Derby jars
    * ship with Spark): `df.write.jdbc` → `spark.read.jdbc` with a
    * stride-partitioned parallel read and predicates pushed to the
    * database. The two scale-critical knobs are both exercised and one
    * is spec-asserted (OpsSpec):
    *   - `partitionColumn/lowerBound/upperBound/numPartitions` — without
    *     them a JDBC read is ONE executor holding one cursor; with them
    *     each executor opens its own stride `WHERE` cursor (bounds come
    *     from a one-row min/max query, not guesses, so stripes are
    *     balanced for uniform keys);
    *   - filter pushdown — the predicate must reach the remote engine as
    *     SQL (`PushedFilters` in the scan), not filter post-transfer.
    * `createTableColumnTypes` overrides Spark's Derby default of CLOB
    * for StringType — Derby cannot compare CLOBs, which would break
    * pushdown on the string predicate (the exact footgun a real
    * warehouse hits).
    */
  def q_source_jdbc(s: SparkSession, d: String): DataFrame = {
    val dbDir = tmpDir(s"jdbc_${math.abs(d.hashCode).toHexString}")
    Files.createDirectories(java.nio.file.Paths.get(dbDir))
    // derby.log goes to scratch, not the process cwd
    System.setProperty("derby.stream.error.file", s"$dbDir/derby.log")
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

    Tables.customer(s, d)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .repartition(4) // multi-connection batched-insert write path
      .write.mode("overwrite")
      .option("createTableColumnTypes",
        "c_name VARCHAR(64), c_mktsegment VARCHAR(16)")
      .jdbc(url, "customer", props)

    val bounds = Tables.customer(s, d)
      .agg(min("c_custkey"), max("c_custkey")).head()
    s.read
      .option("partitionColumn", "c_custkey")
      .option("lowerBound", bounds.getLong(0).toString)
      .option("upperBound", (bounds.getLong(1) + 1L).toString)
      .option("numPartitions", "4")
      .jdbc(url, "customer", props)
      .filter(col("c_acctbal") > 0 && col("c_mktsegment") === "BUILDING")
      .orderBy("c_custkey")
  }

  /** Parse a JSON string column into typed fields (`from_json`) — the
    * streaming-ingest pattern (Kafka value → struct) run over
    * `events.props`.
    */
  def q_source_from_json(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        from_json(col("props"), StructType(Seq(StructField("k", LongType)))).as("p"))
      .select(col("event_id"), col("p.k").as("k"))
      .orderBy("event_id")
}
