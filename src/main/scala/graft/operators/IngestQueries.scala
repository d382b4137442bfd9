package graft.operators

import graft.{DQ, Det, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest-plane declared queries — SURVEY.md §2.1 (S3/S5/S7).
  *
  * These model the reference's Kafka JSON encode/decode boundary
  * (`schemas.py:29-30`, `producer.py:153-181`) and the normalized upsert
  * sink whose trigger semantics live in `02_create_tables.sql:143-163`,
  * re-expressed over the driver's TPC-H-ish tables so the DuckDB oracle
  * can check them.
  *
  * Scale notes: S3's encode/decode is a pure per-row projection (no
  * shuffle); S7's latest-wins upsert is a single hash aggregation on the
  * key — the canonical compacted-topic shape that scales linearly with
  * input and is skew-bounded by per-key version counts.
  */
object IngestQueries {

  import Det._

  /** S3 — JSON encode → decode round-trip (`schemas.py:29-30` serialize,
    * `test_producer_integration.py:117-120` parse). Every order is
    * serialized with `to_json(struct(*))` and reparsed with a typed
    * schema; the aggregates prove values (money, keys, timestamps)
    * survive the trip bit-exactly. Oracle is the same aggregates over the
    * raw table — the round trip must be identity.
    *
    * The timestamp format is pinned on BOTH sides: the default
    * `from_json` timestamp parser takes a per-row slow fallback path
    * (~125 µs/row measured at sf0.1 — a 25× regression caught by the
    * round-3 bench), and the default writer truncates to milliseconds.
    * `o_orderdate` arrives from parquet as TIMESTAMP_NTZ (timestamp[ms]
    * with isAdjustedToUTC=false), so the relevant option is
    * `timestampNTZFormat` and the parse target is `TimestampNTZType` —
    * a `timestampFormat` + `TimestampType` pair would be ignored by the
    * writer and null out on parse (no zone offset in the payload). One
    * explicit microsecond format keeps the parse on the fast path and
    * the trip lossless. Measured: ~20 s → ~2 s at sf0.1. */
  val s3 = DQ(
    "s3_json_roundtrip",
    (s, d) => {
      val o = Tables.orders(s, d)
      val tsOpts = Map("timestampNTZFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType),
        StructField("o_orderdate", TimestampNTZType),
        StructField("o_orderpriority", StringType)))
      o.select(to_json(struct(o.columns.map(col).toIndexedSeq: _*), tsOpts).as("payload"))
        .select(from_json(col("payload"), schema, tsOpts).as("r"))
        .select(col("r.*"))
        .agg(
          count(lit(1)).as("n"),
          count(col("o_orderkey")).as("n_keys"),
          sum(cents(col("o_totalprice"))).as("total_cents"),
          sum(datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long")).as("sum_epoch_day"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(COUNT(o_orderkey) AS BIGINT) AS n_keys,
            CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents,
            CAST(SUM(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS BIGINT)
              AS sum_epoch_day
            FROM orders"""))

  /** S5 — JSON payload decode + schema projection (Pydantic parse analog,
    * `schemas.py:12-111`): extract a typed field from the `props` JSON
    * payload per event and aggregate by entity type. Uses
    * `get_json_object` (scan-level extraction — the GIN-index pattern,
    * `03_create_indexes.sql:83-93`). */
  val s5 = DQ(
    "s5_json_decode",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_parsed"))
        .orderBy("event_type"),
    Some("""SELECT event_type, CAST(SUM(k) AS BIGINT) AS sum_k,
            CAST(COUNT(k) AS BIGINT) AS n_parsed
            FROM (SELECT event_type,
                    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                  FROM events)
            GROUP BY event_type ORDER BY event_type"""))

  /** S7 — normalized latest-wins upsert (compacted-topic semantics;
    * target DDL `02_create_tables.sql:52-122`, trigger `:143-163`):
    * two versions per key arrive, the one with the higher version wins —
    * `max_by(struct, version)` per key, a single hash agg. */
  val s7 = DQ(
    "s7_upsert_latest",
    (s, d) => {
      val o  = Tables.orders(s, d)
      val v1 = o.select(col("o_orderkey"), col("o_totalprice"), lit(1L).as("v"))
      val v2 = o.select(col("o_orderkey"),
        (col("o_totalprice") + lit(1.0)).as("o_totalprice"), lit(2L).as("v"))
      v1.unionByName(v2)
        .groupBy("o_orderkey")
        .agg(max_by(struct(col("o_totalprice"), col("v")), col("v")).as("latest"))
        .select(col("o_orderkey"), col("latest.o_totalprice").as("p"), col("latest.v").as("v"))
        .agg(
          count(lit(1)).as("n"),
          sum(cents(col("p"))).as("total_cents"),
          sum(col("v")).as("sum_v"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(CAST(ROUND(p*100) AS BIGINT)) AS BIGINT) AS total_cents,
            CAST(SUM(v) AS BIGINT) AS sum_v
            FROM (SELECT o_orderkey, arg_max(o_totalprice, v) AS p, MAX(v) AS v
                  FROM (SELECT o_orderkey, o_totalprice, 1 AS v FROM orders
                        UNION ALL
                        SELECT o_orderkey, o_totalprice + 1.0, 2 AS v FROM orders)
                  GROUP BY o_orderkey)"""))

  val all: Seq[DQ] = Seq(s3, s5, s7)
}
