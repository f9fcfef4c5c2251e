package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.Streams

/** Contract tests for the integration surfaces this container cannot
  * execute end-to-end (no Kafka broker, no JDBC database): pin down the
  * wire/DDL contracts so the first cluster run holds no format surprises.
  */
class ContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("encodeJson emits Kafka-record shape a vanilla JSON consumer parses") {
    val df = Seq((1L, "click", 2.5, true)).toDF("id", "kind", "score", "ok")
    val encoded = Streams.encodeJson(df)
    // Kafka value contract: exactly one string `value` column
    assert(encoded.schema === StructType(Seq(StructField("value", StringType))))
    // consumer side: plain Jackson (what a non-Spark Kafka consumer uses)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(encoded.as[String].head())
    assert(node.get("id").asLong() === 1L)
    assert(node.get("kind").asText() === "click")
    assert(node.get("score").asDouble() === 2.5)
    assert(node.get("ok").asBoolean() === true)
  }

  test("decodeJson(encodeJson) is lossless under FAILFAST parsing") {
    val df = Seq((7L, "purchase", Option.empty[String], 0.125))
      .toDF("id", "kind", "note", "v")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("kind", StringType),
      StructField("note", StringType), StructField("v", DoubleType)))
    // FAILFAST: malformed records throw instead of nulling — proves the
    // encoder output is strictly parseable, not merely salvage-parseable
    val back = Streams.encodeJson(df)
      .select(from_json(col("value"), schema,
        Map("mode" -> "FAILFAST")).as("r"))
      .select(col("r.*"))
    assert(back.as[(Long, String, Option[String], Double)].head()
      === ((7L, "purchase", None, 0.125)))
  }

  test("writeJdbc target dialect resolves and maps the gold schema to DDL types") {
    import org.apache.spark.sql.jdbc.JdbcDialects
    val url = "jdbc:postgresql://db:5432/features"
    val dialect = JdbcDialects.get(url)
    assert(dialect.getClass.getSimpleName.toLowerCase.contains("postgres"),
      s"expected the Postgres dialect for $url, got ${dialect.getClass}")
    // the reference's gold table columns (Silver->Gold JDBC sink,
    // batch_process_Silver_to_Gold.py:166-172): every Spark type must map
    // to a concrete database column type
    def ddl(dt: DataType): String =
      dialect.getJDBCType(dt)
        .orElse(org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
          .getCommonJDBCType(dt))
        .map(_.databaseTypeDefinition)
        .getOrElse(fail(s"no JDBC type mapping for ${dt.catalogString}"))
    assert(ddl(LongType) === "BIGINT")
    assert(ddl(IntegerType) === "INTEGER")
    assert(ddl(DoubleType) === "FLOAT8") // postgres alias of DOUBLE PRECISION
    assert(ddl(StringType) === "TEXT")
    assert(ddl(TimestampType).toUpperCase.startsWith("TIMESTAMP"))
  }

  test("toKafka configures the kafka sink format without starting it") {
    // plan-level contract: the writer accepts the encoded frame and the
    // kafka format/options without needing a broker until .start()
    implicit val sql = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val writer = Streams.toKafka(mem.toDF().toDF("id", "kind"),
      servers = "broker:9092", topic = "gold",
      checkpoint = java.nio.file.Files.createTempDirectory("ck").toString)
    assert(writer != null) // construction must not throw
  }
}
