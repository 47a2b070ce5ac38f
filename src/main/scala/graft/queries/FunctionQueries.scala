package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function inventory (SURVEY.md §2.7 F1–F11). Every function the
  * reference's SQL strings invoke, re-expressed with codegen'd
  * `org.apache.spark.sql.functions` — no Scala UDFs in any of these
  * paths, so each stays inside whole-stage codegen.
  */
object FunctionQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  def defs: Seq[(String, QueryDef)] = Seq(

    // ---- F1 COALESCE fallback chain (Ingest:280 — multi-watermark-column)
    "f1_coalesce" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select($"event_id",
            coalesce(nullif($"event_type", lit("view")), lit("VIEWED")).as("et"),
            coalesce($"value", lit(0.0)).as("v"))
      },
      Some("""SELECT event_id,
        COALESCE(NULLIF(event_type, 'view'), 'VIEWED') AS et,
        COALESCE(value, 0.0) AS v FROM events""")),

    // ---- F2 year/quarter/month/day chunk keys (Ingest:209-211,233-239)
    "f2_date_parts" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .groupBy(
            year($"o_orderdate").as("y"), quarter($"o_orderdate").as("q"),
            month($"o_orderdate").as("m"), dayofmonth($"o_orderdate").as("d"))
          .agg(count(lit(1)).as("cnt"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS INT) AS y,
        CAST(quarter(o_orderdate) AS INT) AS q,
        CAST(month(o_orderdate) AS INT) AS m,
        CAST(day(o_orderdate) AS INT) AS d, count(*) AS cnt
        FROM orders GROUP BY 1,2,3,4""")),

    // ---- F3 CAST literals/columns (Ingest:280,379,383). floor() guards the
    // double→int cast: Spark truncates, DuckDB rounds — floor makes them agree.
    "f3_cast" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber",
            floor($"l_quantity").cast("int").as("qty_int"),
            lit("2020-01-01 00:00:00").cast("timestamp").as("t0"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
        CAST(floor(l_quantity) AS INT) AS qty_int,
        CAST('2020-01-01 00:00:00' AS TIMESTAMP) AS t0 FROM lineitem""")),

    // ---- F5 CURRENT_TIMESTAMP (Ingest:384-385) — audit-column pattern;
    // asserted as a stable predicate so the oracle hash is deterministic.
    "f5_current_timestamp" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "region")
          .select((year(current_timestamp()) >= 2024).as("ok")).distinct()
      },
      Some("SELECT DISTINCT (year(current_timestamp) >= 2024) AS ok FROM region")),

    // ---- F6 lower/upper case-folding (Ingest:389)
    "f6_case_fold" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part")
          .select($"p_partkey", lower($"p_type").as("pt"), upper($"p_brand").as("pb"))
      },
      Some("SELECT p_partkey, lower(p_type) AS pt, upper(p_brand) AS pb FROM part")),

    // ---- F7+F9 codec surface (Ingest:128 decrypt, :140 b64decode):
    // base64 round-trip over the data plane; the AES-path equivalent lives
    // in graft.functions.Codec (aes_encrypt/aes_decrypt) with its own spec.
    "f7_base64_roundtrip" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val b64 = base64(encode(substring($"text", 1, 16), "UTF-8"))
        t(s, dir, "documents")
          .select($"doc_id", b64.as("b64"),
            decode(unbase64(b64), "UTF-8").as("roundtrip"))
      },
      Some("""SELECT doc_id, base64(encode(substr(text, 1, 16))) AS b64,
        decode(from_base64(base64(encode(substr(text, 1, 16))))) AS roundtrip
        FROM documents""")),

    // ---- F8 string ops applied to columns (split/trim/lower/concat,
    // Ingest:153,176-199)
    "f8_string_ops" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part")
          .select($"p_partkey",
            split_part($"p_name", lit(" "), lit(1)).as("head"),
            trim(concat(lit("  "), $"p_name", lit("  "))).as("trimmed"),
            concat($"p_brand", lit("_"), $"p_type").as("joined"))
      },
      Some("""SELECT p_partkey, split_part(p_name, ' ', 1) AS head,
        trim(concat('  ', p_name, '  ')) AS trimmed,
        concat(p_brand, '_', p_type) AS joined FROM part""")),

    // ---- F11 [EXT] JSON extraction from events.props (SURVEY §2.7 F11)
    "f11_json_extract" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select($"event_id",
            get_json_object($"props", "$.k").cast("int").as("k"))
      },
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events""")),

    // ---- F12 [EXT] array-column access over embeddings (ArrayType(Float))
    "f12_array_ops" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "embeddings")
          .select($"vec_id", size($"embedding").as("dim"),
            element_at($"embedding", 1).as("first_el"),
            element_at($"embedding", 64).as("last_el"))
      },
      Some("""SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
        embedding[1] AS first_el, embedding[64] AS last_el FROM embeddings"""))
    ,

    // ---- F16 ordinal explode (LATERAL VIEW / posexplode): tokenize and
    // emit the first five (position, word) pairs per document — a narrow
    // generator, no shuffle; DuckDB mirrors via 1-based list indexing
    // (a five-branch UNION ALL, deterministic and version-portable)
    "f16_explode_ordinal" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .select($"doc_id", posexplode(split($"text", "\\s+"))
            .as(Seq("pos", "word")))
          .where($"pos" < 5)
      },
      Some((0 until 5).map { i =>
        raw"""SELECT doc_id, $i AS pos,
          string_split_regex(text, '\s+')[${i + 1}] AS word
        FROM documents WHERE len(string_split_regex(text, '\s+')) > $i"""
      }.mkString(" UNION ALL "))),

    // ---- F17 malformed-JSON resilience: ingestion must COUNT AND
    // CONTAIN bad records, not fail the job (the reference's per-table
    // error containment, pushed down to per-row granularity). Every
    // 7th event's props is deterministically corrupted; validity =
    // get_json_object(j, '$') IS NOT NULL (Spark's parser) ≡ DuckDB's
    // json_valid on object-or-garbage inputs. Pure per-row parse +
    // one small aggregate — no shuffle beyond the final groupBy.
    "f17_json_malformed" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val j = when(pmod($"event_id", lit(7)) === 0,
          concat(lit("{broken "), $"props")).otherwise($"props")
        t(s, dir, "events")
          .select($"event_type",
            get_json_object(j, "$").isNotNull.as("valid"))
          .groupBy($"event_type")
          .agg(sum($"valid".cast("long")).as("n_valid"),
            sum((!$"valid").cast("long")).as("n_invalid"))
      },
      // The oracle counts by CONSTRUCTION (only injected '{broken '
      // prefixes are invalid — every base props is a plain JSON object,
      // verified on the testdata, and Spark's parser is pinned by our
      // jar), so the compared counts never depend on the oracle
      // engine's json extension or its version-specific edge-case
      // opinions. Sums CAST AS BIGINT: DuckDB integer sums widen to
      // HUGEINT, whose client rendering is version-dependent.
      Some("""SELECT event_type,
          CAST(sum(CASE WHEN event_id % 7 = 0 THEN 0 ELSE 1 END)
            AS BIGINT) AS n_valid,
          CAST(sum(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_invalid
        FROM events GROUP BY event_type"""))
  )
}
