package graft.operators

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.H — scalar function families: string, date, math,
  * conditional, cast lattice, hash, array (+ higher-order folds), map,
  * JSON, explode. One query per family, several functions per query.
  *
  * Cross-engine dialect notes (each verified by probe before use):
  *  - DuckDB `regexp_replace` replaces the first match unless the 'g'
  *    flag is passed; Spark always replaces all.
  *  - Spark `ceil`/`floor` return BIGINT, DuckDB return DOUBLE — the
  *    oracle casts. Spark `length`/`instr`/`year`/... return INT vs
  *    DuckDB BIGINT — the Spark side casts to long so parquet schemas
  *    agree.
  *  - DuckDB list indexing is 1-based, same as Spark `element_at`;
  *    never use Spark's 0-based `getItem`/`[ ]` against an oracle.
  *  - Per-row double arithmetic (abs, sqrt, +,*) is IEEE-identical
  *    across engines; libm-backed fns (ln, exp, log10) agree to <1 ULP
  *    and are rounded to 6 dp on both sides.
  *  - Float folds (dot products) cast each element to double inside the
  *    lambda so both engines accumulate the same left-to-right double
  *    sequence; emitted rounded to 4 dp (§2.0-6).
  */
object Functions extends QueryModule {

  val queries: Map[String, Q] = Map(
    "fn_variant" -> ((s, dir) =>
      // Spark 4 VariantType — the engine's answer to open semi-
      // structured columns (the reference's raison d'être was JSON-in-
      // anything): parse once into the binary variant encoding, then
      // typed path extraction without a fixed schema. variant_get on a
      // present path, try_variant_get on a missing one (NULL, not
      // error), and a string re-extraction of the same leaf. Variant
      // decode is columnar + codegen'd — at 100 TB this replaces
      // per-query from_json re-parsing with parse-once storage. The
      // parse is projected ONCE into `v` (CollapseProject keeps a
      // multiply-referenced non-cheap alias in its own project), so the
      // plan decodes each row's JSON a single time and the three
      // extractions are cheap variant path reads — PlanSpec asserts
      // exactly one parse_json in the optimized plan.
      T.events(s, dir)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(
          col("event_id"),
          expr("variant_get(v, '$.k', 'bigint')").as("k_int"),
          expr("variant_get(v, '$.k', 'string')").as("k_str"),
          expr("try_variant_get(v, '$.missing', 'bigint')").as("missing"))
        .orderBy("event_id")),

    "fn_collation" -> ((s, dir) =>
      // Spark 4 COLLATIONS: comparison semantics as a property of the
      // string TYPE — grouping on a UTF8_LCASE-collated key makes =,
      // GROUP BY and joins case-insensitive WITHOUT rewriting every
      // expression through lower() (and the original-case strings
      // survive, unlike a lower() projection). Hash aggregation works
      // on the collated key directly. Mixed-case fixture synthesized
      // deterministically; the group representative is an explicit
      // min() (binary order) because "whichever original the collated
      // group surfaces" is engine-undefined; the DuckDB twin expresses
      // the same semantics with lower() grouping.
      T.load(s, dir, "customer")
        .withColumn("seg_mixed",
          when(col("c_custkey") % 2 === 0, lower(col("c_mktsegment")))
            .otherwise(col("c_mktsegment")))
        .groupBy(expr("collate(seg_mixed, 'UTF8_LCASE')"))
        .agg(min(col("seg_mixed")).as("rep"), count(lit(1)).as("n"),
             countDistinct(col("seg_mixed")).as("n_variants"))
        .select(col("rep"), col("n"), col("n_variants"))
        .orderBy("rep")),

    "fn_xml" -> ((s, dir) =>
      // XML — the other enterprise semi-structured format: to_xml
      // renders a struct per row, from_xml parses it back against a
      // schema (same parse-don't-regex discipline as JSON/variant; both
      // codegen-free but columnar-batched). Round-trip equality proves
      // codec fidelity; the oracle rebuilds the extracted leaves from
      // the base columns.
      T.load(s, dir, "customer").select(
        col("c_custkey"),
        expr("""from_xml(to_xml(named_struct(
                  'k', c_custkey, 'seg', c_mktsegment, 'bal', c_acctbal)),
                'k BIGINT, seg STRING, bal DOUBLE')""").as("v"))
        .select(col("c_custkey"), col("v.k").as("k"),
                col("v.seg").as("seg"), col("v.bal").as("bal"))
        .orderBy("c_custkey")),

    "fn_crypto" -> ((s, dir) =>
      // Content-hash + codec family — the workhorses of dedup, sharding
      // and integrity checks: md5 and sha2-256 hex (bit-portable across
      // engines), plus an aes_encrypt/decrypt round-trip in ECB mode
      // (the deterministic mode — GCM's random IV would break the
      // determinism rules) proving codec reversibility: the oracle
      // checks the decrypted value equals the source and the hashes
      // match DuckDB's. All codegen'd projections, no shuffle.
      T.load(s, dir, "customer").select(
        col("c_custkey"),
        md5(col("c_name")).as("h_md5"),
        sha2(col("c_name"), 256).as("h_sha256"),
        aes_decrypt(
          aes_encrypt(col("c_name").cast("binary"),
                      lit("0123456789abcdef").cast("binary"), lit("ECB")),
          lit("0123456789abcdef").cast("binary"), lit("ECB"))
          .cast("string").as("roundtrip"))
        .orderBy("c_custkey")),

    "fn_try" -> ((s, dir) =>
      // Error-safe arithmetic family: try_* returns NULL where strict
      // evaluation would raise (div-by-zero, bad cast, overflow, index
      // out of bounds) — the batch-pipeline behavior you want at 100 TB,
      // where one malformed row must not kill a 6-hour job. Runs over
      // the dim-sized customer table: this is a SEMANTICS surface (the
      // try wrapper pays an interpreted/exception path per failing row
      // — measured ~17× a codegen'd projection — so you reach for it on
      // the rows that need it, not as the default arithmetic).
      T.load(s, dir, "customer").select(
        col("c_custkey"),
        expr("try_divide(c_acctbal, c_custkey % 3)").as("div3"),
        expr("try_cast(c_mktsegment AS INT)").as("bad_int"),
        expr("""try_cast(concat(CAST(c_custkey AS STRING),
                 CASE WHEN c_custkey % 3 = 0 THEN ''
                      ELSE substr(c_mktsegment, 1, 1) END) AS INT)""")
          .as("mixed_int"),
        expr("try_add(9223372036854775805, c_custkey % 10)").as("ovf"),
        expr("try_element_at(split(c_name, '#'), 99)").as("oob"))
        .orderBy("c_custkey")),

    "fn_format" -> ((s, dir) =>
      // printf-style formatting + the character-transform family —
      // format_string lowers to java.util.Formatter, whose %s/%0Nd
      // output is bytewise identical to DuckDB's printf for these
      // conversions. All codegen'd projections, no shuffle.
      T.load(s, dir, "customer").select(
        col("c_custkey"),
        format_string("%s-%07d", col("c_mktsegment"), col("c_custkey"))
          .as("fmt"),
        translate(col("c_name"), "Cusmer", "XYZABC").as("trans"),
        repeat(substring(col("c_name"), 1, 3), 2).as("rep"),
        reverse(col("c_mktsegment")).as("rev"),
        concat_ws("|", col("c_mktsegment"), col("c_custkey").cast("string"))
          .as("joined"))
        .orderBy("c_custkey")),

    "fn_string" -> ((s, dir) =>
      T.load(s, dir, "customer").select(
        col("c_custkey"),
        concat(col("c_name"), lit("_"), col("c_mktsegment")).as("cat"),
        substring(col("c_name"), 1, 8).as("sub"),
        upper(col("c_mktsegment")).as("up"),
        lower(col("c_name")).as("lo"),
        trim(concat(lit("  "), col("c_name"), lit("  "))).as("trimmed"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("pad"),
        length(col("c_name")).cast("long").as("len"),
        regexp_replace(col("c_name"), "[0-9]", "").as("nodigits"),
        expr("replace(c_name, 'Customer', 'Cust')").as("repl"),
        expr("try_element_at(split(c_name, '#'), 2)").as("tok"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        instr(col("c_name"), "#").cast("long").as("pos"))
        .orderBy("c_custkey")),

    "fn_date" -> ((s, dir) =>
      T.load(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dy"),
        expr("weekday(o_orderdate) + 1").cast("long").as("dow_iso"),
        // DuckDB date_trunc('month', ts) yields DATE; match it
        date_trunc("month", col("o_orderdate")).cast("date").as("mon_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_98"),
        last_day(col("o_orderdate").cast("date")).as("eom"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1))
          .as("m1"))
        .orderBy("o_orderkey")),

    "fn_math" -> ((s, dir) =>
      T.load(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_d"),
        // round() tie-handling differs across engines (Spark HALF_UP on the
        // shortest decimal string vs DuckDB half-away on the binary value);
        // floor(x*100+0.5)/100 is pure IEEE arithmetic — identical in both
        (floor(col("l_extendedprice") * 0.01 * 100 + 0.5).cast("double") / 100)
          .as("rnd"),
        ceil(col("l_extendedprice")).cast("long").as("ceil_p"),
        floor(col("l_extendedprice")).cast("long").as("floor_p"),
        pow(col("l_quantity"), 2.0).as("pw"),
        round(sqrt(col("l_extendedprice")), 6).as("sq"),
        round(log(col("l_extendedprice")), 6).as("lg"),
        round(log10(col("l_extendedprice")), 6).as("l10"),
        round(exp(col("l_discount")), 6).as("ex"),
        signum(col("l_discount") - 0.05).cast("long").as("sg"),
        expr("l_orderkey % 7").as("md"),
        greatest(col("l_quantity"), col("l_discount") * 100.0).as("gr"),
        least(col("l_quantity"), col("l_discount") * 100.0).as("le"))
        .orderBy("l_orderkey", "l_linenumber")),

    "fn_cond" -> ((s, dir) =>
      T.load(s, dir, "customer").select(
        col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_null"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("ZZZ"))
          .as("seg_co"),
        when(col("c_acctbal") > 5000.0, "hi").otherwise("lo").as("flag"),
        expr("try_cast(c_mktsegment AS BIGINT)").as("tc_bad"),
        expr("try_cast(try_element_at(split(c_name, '#'), 2) AS BIGINT)")
          .as("tc_ok"))
        .orderBy("c_custkey")),

    "fn_cast" -> ((s, dir) =>
      T.load(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_orderkey").cast("string").as("s1"),
        col("o_orderkey").cast("string").cast("long").as("rt"),
        col("o_totalprice").cast(T.DEC).cast("string").as("dec_s"),
        col("o_totalprice").cast(T.DEC).cast("double").as("d2"),
        col("o_orderdate").cast("date").cast("string").as("ds"),
        (col("o_orderkey") % 2).cast("boolean").as("b1"),
        expr("try_cast('12x' AS BIGINT)").as("bad"))
        .orderBy("o_orderkey")),

    "fn_bitwise" -> ((s, dir) =>
      T.load(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("band"),
        col("o_orderkey").bitwiseOR(lit(7L)).as("bor"),
        col("o_orderkey").bitwiseXOR(lit(170L)).as("bxor"),
        shiftleft(col("o_orderkey") % 16, 2).as("shl"),
        shiftright(col("o_orderkey"), 3).as("shr"),
        bit_count(col("o_orderkey")).cast("long").as("bcnt"),
        bitwise_not(col("o_orderkey")).as("bnot"))
        .orderBy("o_orderkey")),

    "fn_regex" -> ((s, dir) =>
      // Deeper regex family than fn_string's extract/replace: occurrence
      // counting, extract-all (scalarized via array_join for the
      // comparer), boolean match, and first-match substring with NULL
      // no-match semantics. All codegen'd Column ops — regex over text
      // columns is the backbone of corpus filtering and PII scrubbing.
      T.load(s, dir, "documents").select(
        col("doc_id"),
        regexp_count(col("text"), lit("[aeiou]{2}")).cast("long").as("n_vv"),
        array_join(regexp_extract_all(col("text"), lit("\\b(s[a-z]+)\\b"),
                                      lit(1)), ",").as("s_words"),
        col("text").rlike("vector").cast("int").as("has_vector"),
        regexp_substr(col("text"), lit("w[a-z]{3,}")).as("first_w"))
        .orderBy("doc_id")),

    "fn_struct" -> ((s, dir) =>
      // Nested-type round trip: build a struct, read fields back out,
      // compute through a field, and serialize the whole struct to JSON
      // (the wire shape of the reference's document model).
      T.load(s, dir, "nation")
        .select(col("n_nationkey"),
                struct(col("n_name").as("name"),
                       col("n_regionkey").as("rk")).as("st"))
        .select(col("n_nationkey"),
                col("st.name").as("name"),
                (col("st.rk") + 100).as("rk_plus"),
                to_json(col("st")).as("js"))
        .orderBy("n_nationkey")),

    "fn_sequence" -> ((s, dir) =>
      // Range generator: per-row sequence materialized by explode —
      // the fan-out primitive (calendar spines, retry schedules,
      // per-row enumerations) that at scale must stay a generator
      // inside the scan pipeline, never a driver-side loop.
      T.load(s, dir, "nation")
        .select(col("n_nationkey"),
                explode(sequence(lit(0), col("n_nationkey") % 5)).as("i"))
        .select(col("n_nationkey"), col("i").cast("long").as("i"),
                (col("n_nationkey") + col("i")).cast("long").as("key_i"))
        .orderBy("n_nationkey", "i")),

    "fn_hash" -> ((s, dir) =>
      T.load(s, dir, "customer").select(
        col("c_custkey"),
        md5(col("c_name")).as("h_md5"),
        sha2(col("c_name"), 256).as("h_sha256"),
        md5(concat(col("c_name"), lit("|"), col("c_mktsegment"))).as("h_cat"))
        .orderBy("c_custkey")),

    // List-typed outputs crash the driver's pandas comparer, so every array
    // op here (slice / sort_array / transform / aggregate) runs in the plan
    // but is emitted scalarized: element_at picks, or a decimal-mediated
    // array_join (double→string formatting differs across engines;
    // double→DECIMAL(18,4)→string is identical — §2.0-6).
    "fn_array" -> ((s, dir) => {
      def d4s(c: org.apache.spark.sql.Column) =
        c.cast("double").cast("decimal(18,4)").cast("string")
      T.load(s, dir, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("n"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("e1"),
        array_join(transform(slice(col("embedding"), 1, 3), x => d4s(x)), ",")
          .as("sl"),
        round(element_at(sort_array(col("embedding")), 1).cast("double"), 4)
          .as("srt1"),
        round(element_at(sort_array(col("embedding")), 3).cast("double"), 4)
          .as("srt3"),
        size(array_distinct(col("embedding"))).cast("long").as("n_dist"),
        round(aggregate(col("embedding"), lit(0.0),
                        (acc, x) => acc + x.cast("double") * x.cast("double")),
              4).as("ss"),
        round(aggregate(transform(col("embedding"), x => x.cast("double") * 2),
                        lit(0.0), (acc, x) => acc + x), 4).as("s2"))
        .orderBy("vec_id")
    }),

    // Same scalarization: map_keys/map_values arrays are string-joined
    // (null-safe via coalesce so both engines agree on missing keys).
    "fn_map" -> ((s, dir) => {
      val e = T.events(s, dir)
        .withColumn("kv", get_json_object(col("props"), "$.k").cast("long"))
      e.select(
        col("event_id"),
        map_from_arrays(array(lit("k"), lit("k2")),
                        array(col("kv"), col("kv") * 2)).as("m"))
        .select(
          col("event_id"),
          array_join(map_keys(col("m")), ",").as("ks"),
          array_join(transform(map_values(col("m")),
                               v => coalesce(v.cast("string"), lit("null"))),
                     ",").as("vs"),
          element_at(col("m"), "k").as("v1"))
        .orderBy("event_id")
    }),

    "fn_json" -> ((s, dir) => {
      val e = T.load(s, dir, "events")
      e.select(col("event_id"), col("props"),
               json_tuple(col("props"), "k").as("jt"))
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k1"),
          col("jt").cast("long").as("k2"),
          from_json(col("props"), lit("k BIGINT")).getField("k").as("k3"),
          to_json(struct(get_json_object(col("props"), "$.k").cast("long")
            .as("k"))).as("js"))
        .orderBy("event_id")
    }),

    "fn_explode" -> ((s, dir) =>
      T.load(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
                col("col").as("word"))
        .orderBy("doc_id", "pos")),

    "fn_explode_outer" -> ((s, dir) =>
      // Null-preserving generator: docs whose long-word array is EMPTY
      // must survive as a (doc_id, NULL) row — explode would silently
      // drop them, which at pipeline scale is data loss, not filtering.
      T.load(s, dir, "documents")
        .select(col("doc_id"),
                filter(split(col("text"), " "), w => length(w) > 7)
                  .as("longw"))
        .select(col("doc_id"), size(col("longw")).cast("long").as("n_long"),
                explode_outer(col("longw")).as("word"))
        .orderBy(col("doc_id"), col("word").asc_nulls_first)),

    "fn_unpivot" -> ((s, dir) =>
      // Wide→long melt — the inverse of agg_pivot: four metric columns
      // become (metric, val) rows. Spark's native unpivot is a pure
      // generator (Expand node — each input row emits 4 output rows in
      // the same task, no shuffle, no UDF); at 100 TB the melt is free
      // relative to the scan that feeds it.
      T.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax")
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
                 Array(col("l_quantity"), col("l_extendedprice"),
                       col("l_discount"), col("l_tax")),
                 "metric", "val")
        // (l_orderkey, l_linenumber) is NOT unique in the fixture, so
        // `val` completes the total order for the row-wise compare.
        .orderBy("l_orderkey", "l_linenumber", "metric", "val")),

    "fn_fuzzy" -> ((s, dir) =>
      // Edit-distance family — the fuzzy-match primitive behind entity
      // resolution / name dedup. levenshtein is a codegen'd built-in in
      // both engines and exact (integer DP), so unlike the sketch-based
      // dedups this one is fully oracle-checked. The thresholded form
      // (Spark's 3-arg levenshtein returns -1 past the bound) is the
      // 100 TB variant: the DP can abort a row after the band exceeds
      // the threshold instead of filling the full O(n·m) table.
      T.load(s, dir, "customer").select(
        col("c_custkey"),
        levenshtein(col("c_name"), translate(col("c_name"), "0", "O"))
          .cast("long").as("lev_zero"),
        levenshtein(col("c_name"), col("c_mktsegment"))
          .cast("long").as("lev_seg"),
        levenshtein(col("c_name"), col("c_mktsegment"), 10)
          .cast("long").as("lev_cap"))
        .orderBy("c_custkey")),

    "fn_url" -> ((s, dir) =>
      // URL parsing family over a deterministically SYNTHESIZED url (the
      // fixtures carry no URL column): Spark's parse_url / url_decode are
      // codegen'd built-ins — the web-corpus ingest path (host-level
      // dedup, path routing, query-param extraction) runs per-row with
      // no UDF. DuckDB has no parse_url, so the oracle recomputes each
      // part with exact string algebra on the same synthesized shape.
      T.load(s, dir, "documents")
        .withColumn("url",
          concat(lit("https://"), col("source"), lit(".example.org/"),
                 col("lang"), lit("/doc/"), col("doc_id"),
                 lit("?ref="), col("source"), lit("&n="), col("n_chars")))
        .select(col("doc_id"), col("url"),
                expr("parse_url(url, 'PROTOCOL')").as("proto"),
                expr("parse_url(url, 'HOST')").as("host"),
                expr("parse_url(url, 'PATH')").as("path"),
                expr("parse_url(url, 'QUERY')").as("query"),
                expr("parse_url(url, 'QUERY', 'ref')").as("ref"),
                expr("url_decode(concat(lang, '%20', source))").as("dec"))
        .orderBy("doc_id")),

    "fn_interval" -> ((s, dir) =>
      // Calendar/interval arithmetic beyond fn_date's extraction family:
      // month adds CLAMP at month end (add_months semantics match
      // DuckDB's +INTERVAL MONTH), quarter/week truncation (both engines
      // start weeks on Monday), strictly-after next-weekday, raw
      // timestamp + hour interval, and the epoch-seconds round-trip
      // (session TZ pinned UTC so both engines agree). All pure per-row
      // projection — codegen, no shuffle.
      T.load(s, dir, "orders")
        .withColumn("d", col("o_orderdate").cast("date"))
        .select(
          col("o_orderkey"),
          add_months(col("d"), 3).as("plus3mo"),
          add_months(col("d"), -1).as("minus1mo"),
          date_sub(col("d"), 14).as("minus2wk"),
          date_trunc("quarter", col("o_orderdate")).cast("date").as("qtr"),
          date_trunc("week", col("o_orderdate")).cast("date").as("wk"),
          next_day(col("d"), "FR").as("next_fri"),
          (col("o_orderdate") + expr("INTERVAL 36 HOURS")).as("plus36h"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy("o_orderkey")),
  )

  val oracles: Map[String, String] = Map(
    "fn_variant" ->
      """SELECT event_id,
                CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
                CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS VARCHAR)
                  AS k_str,
                CAST(NULL AS BIGINT) AS missing
         FROM events ORDER BY event_id""",

    "fn_collation" ->
      """WITH m AS (SELECT CASE WHEN c_custkey % 2 = 0
                               THEN lower(c_mktsegment)
                               ELSE c_mktsegment END AS seg_mixed
                    FROM customer)
         SELECT min(seg_mixed) AS rep, count(*) AS n,
                count(DISTINCT seg_mixed) AS n_variants
         FROM m GROUP BY lower(seg_mixed) ORDER BY rep""",

    "fn_xml" ->
      """SELECT c_custkey, c_custkey AS k, c_mktsegment AS seg,
                c_acctbal AS bal
         FROM customer ORDER BY c_custkey""",

    "fn_crypto" ->
      """SELECT c_custkey, md5(c_name) AS h_md5, sha256(c_name) AS h_sha256,
                c_name AS roundtrip
         FROM customer ORDER BY c_custkey""",

    "fn_try" ->
      """SELECT c_custkey,
                c_acctbal / nullif(c_custkey % 3, 0) AS div3,
                TRY_CAST(c_mktsegment AS INTEGER) AS bad_int,
                TRY_CAST(CAST(c_custkey AS VARCHAR) ||
                         CASE WHEN c_custkey % 3 = 0 THEN ''
                              ELSE substr(c_mktsegment, 1, 1) END
                         AS INTEGER) AS mixed_int,
                CASE WHEN c_custkey % 10 > 2 THEN NULL
                     ELSE 9223372036854775805 + c_custkey % 10 END AS ovf,
                (string_split(c_name, '#'))[99] AS oob
         FROM customer ORDER BY c_custkey""",

    "fn_format" ->
      """SELECT c_custkey,
                printf('%s-%07d', c_mktsegment, c_custkey) AS fmt,
                translate(c_name, 'Cusmer', 'XYZABC') AS trans,
                repeat(substring(c_name, 1, 3), 2) AS rep,
                reverse(c_mktsegment) AS rev,
                concat_ws('|', c_mktsegment, CAST(c_custkey AS VARCHAR))
                  AS joined
         FROM customer ORDER BY c_custkey""",

    "fn_string" ->
      """SELECT c_custkey,
                concat(c_name, '_', c_mktsegment) AS cat,
                substring(c_name, 1, 8) AS sub,
                upper(c_mktsegment) AS up,
                lower(c_name) AS lo,
                trim('  ' || c_name || '  ') AS trimmed,
                lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS pad,
                length(c_name) AS len,
                regexp_replace(c_name, '[0-9]', '', 'g') AS nodigits,
                replace(c_name, 'Customer', 'Cust') AS repl,
                string_split(c_name, '#')[2] AS tok,
                regexp_extract(c_name, '([0-9]+)', 1) AS digits,
                strpos(c_name, '#') AS pos
         FROM customer ORDER BY c_custkey""",

    "fn_date" ->
      """SELECT o_orderkey,
                year(o_orderdate) AS yr, month(o_orderdate) AS mo,
                day(o_orderdate) AS dy, isodow(o_orderdate) AS dow_iso,
                date_trunc('month', o_orderdate) AS mon_start,  -- DATE
                CAST(o_orderdate AS DATE) + 30 AS plus30,
                date_diff('day', CAST(o_orderdate AS DATE),
                          DATE '1998-01-01') AS days_to_98,
                last_day(CAST(o_orderdate AS DATE)) AS eom,
                make_date(year(o_orderdate), month(o_orderdate), 1) AS m1
         FROM orders ORDER BY o_orderkey""",

    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
                abs(l_discount - 0.05) AS abs_d,
                floor(l_extendedprice * 0.01 * 100 + 0.5) / 100 AS rnd,
                CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
                CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
                pow(l_quantity, 2.0) AS pw,
                round(sqrt(l_extendedprice), 6) AS sq,
                round(ln(l_extendedprice), 6) AS lg,
                round(log10(l_extendedprice), 6) AS l10,
                round(exp(l_discount), 6) AS ex,
                CAST(sign(l_discount - 0.05) AS BIGINT) AS sg,
                l_orderkey % 7 AS md,
                greatest(l_quantity, l_discount * 100.0) AS gr,
                least(l_quantity, l_discount * 100.0) AS le
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "fn_cond" ->
      """SELECT c_custkey,
                nullif(c_mktsegment, 'BUILDING') AS seg_null,
                coalesce(nullif(c_mktsegment, 'BUILDING'), 'ZZZ') AS seg_co,
                CASE WHEN c_acctbal > 5000.0 THEN 'hi' ELSE 'lo' END AS flag,
                TRY_CAST(c_mktsegment AS BIGINT) AS tc_bad,
                TRY_CAST(string_split(c_name, '#')[2] AS BIGINT) AS tc_ok
         FROM customer ORDER BY c_custkey""",

    "fn_cast" ->
      """SELECT o_orderkey,
                CAST(o_orderkey AS VARCHAR) AS s1,
                CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS rt,
                CAST(CAST(o_totalprice AS DECIMAL(38,6)) AS VARCHAR) AS dec_s,
                CAST(CAST(o_totalprice AS DECIMAL(38,6)) AS DOUBLE) AS d2,
                CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS ds,
                CAST(o_orderkey % 2 AS BOOLEAN) AS b1,
                TRY_CAST('12x' AS BIGINT) AS bad
         FROM orders ORDER BY o_orderkey""",

    "fn_bitwise" ->
      """SELECT o_orderkey,
                o_orderkey & 255 AS band,
                o_orderkey | 7 AS bor,
                xor(o_orderkey, 170) AS bxor,
                (o_orderkey % 16) << 2 AS shl,
                o_orderkey >> 3 AS shr,
                CAST(bit_count(o_orderkey) AS BIGINT) AS bcnt,
                ~o_orderkey AS bnot
         FROM orders ORDER BY o_orderkey""",

    "fn_regex" ->
      // RE2 (DuckDB) and java.util.regex (Spark) agree on these ASCII
      // character-class/boundary patterns; regexp_substr's NULL-on-no-
      // match maps to nullif(regexp_extract(...), '') since DuckDB's
      // extract returns '' where Spark returns NULL, and DuckDB's
      // array_to_string over an empty match list returns NULL where
      // Spark's array_join returns '' (hence the coalesce).
      """SELECT doc_id,
                len(regexp_extract_all(text, '[aeiou]{2}')) AS n_vv,
                coalesce(array_to_string(
                  regexp_extract_all(text, '\b(s[a-z]+)\b', 1), ','), '')
                  AS s_words,
                CAST(regexp_matches(text, 'vector') AS INT) AS has_vector,
                nullif(regexp_extract(text, 'w[a-z]{3,}'), '') AS first_w
         FROM documents ORDER BY doc_id""",

    "fn_struct" ->
      """SELECT n_nationkey,
                struct_pack(name := n_name, rk := n_regionkey).name AS name,
                struct_pack(name := n_name, rk := n_regionkey).rk + 100 AS rk_plus,
                CAST(to_json(struct_pack(name := n_name, rk := n_regionkey))
                     AS VARCHAR) AS js
         FROM nation ORDER BY n_nationkey""",

    "fn_sequence" ->
      """SELECT n_nationkey,
                unnest(generate_series(0, n_nationkey % 5)) AS i,
                n_nationkey + unnest(generate_series(0, n_nationkey % 5)) AS key_i
         FROM nation ORDER BY n_nationkey, i""",

    "fn_hash" ->
      """SELECT c_custkey,
                md5(c_name) AS h_md5,
                sha256(c_name) AS h_sha256,
                md5(c_name || '|' || c_mktsegment) AS h_cat
         FROM customer ORDER BY c_custkey""",

    "fn_array" ->
      """SELECT vec_id,
                len(embedding) AS n,
                round(CAST(embedding[1] AS DOUBLE), 4) AS e1,
                array_to_string(list_transform(embedding[1:3],
                  x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,4))
                            AS VARCHAR)), ',') AS sl,
                round(CAST(list_sort(embedding)[1] AS DOUBLE), 4) AS srt1,
                round(CAST(list_sort(embedding)[3] AS DOUBLE), 4) AS srt3,
                len(list_distinct(embedding)) AS n_dist,
                round(list_aggregate(list_transform(embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 4)
                  AS ss,
                round(list_aggregate(list_transform(embedding,
                      x -> CAST(x AS DOUBLE) * 2), 'sum'), 4) AS s2
         FROM embeddings ORDER BY vec_id""",

    "fn_map" ->
      """SELECT event_id,
                'k,k2' AS ks,
                coalesce(CAST(kv AS VARCHAR), 'null') || ',' ||
                  coalesce(CAST(kv * 2 AS VARCHAR), 'null') AS vs,
                kv AS v1
         FROM (SELECT event_id,
                      CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv
               FROM events)
         ORDER BY event_id""",

    "fn_json" ->
      """SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k1,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k2,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k3,
                CAST(json_object('k',
                     CAST(json_extract_string(props, '$.k') AS BIGINT))
                     AS VARCHAR) AS js
         FROM events ORDER BY event_id""",

    "fn_explode" ->
      """SELECT doc_id,
                unnest(generate_series(1, len(w))) AS pos,
                unnest(w) AS word
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
         ORDER BY doc_id, pos""",

    "fn_explode_outer" ->
      // outer-unnest emulation: an empty array becomes [NULL] so the row
      // survives with a NULL word, matching Spark's explode_outer.
      """SELECT doc_id, len(longw) AS n_long,
                unnest(CASE WHEN len(longw) = 0 THEN [NULL]
                       ELSE longw END) AS word
         FROM (SELECT doc_id,
                      list_filter(string_split(text, ' '),
                                  w -> length(w) > 7) AS longw
               FROM documents)
         ORDER BY doc_id, word NULLS FIRST""",

    "fn_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, val
         FROM (UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity,
                               l_extendedprice, l_discount, l_tax
                        FROM lineitem)
               ON l_quantity, l_extendedprice, l_discount, l_tax
               INTO NAME metric VALUE val)
         ORDER BY l_orderkey, l_linenumber, metric, val""",

    "fn_fuzzy" ->
      """SELECT c_custkey,
                levenshtein(c_name, replace(c_name, '0', 'O')) AS lev_zero,
                levenshtein(c_name, c_mktsegment) AS lev_seg,
                CASE WHEN levenshtein(c_name, c_mktsegment) > 10 THEN -1
                     ELSE levenshtein(c_name, c_mktsegment) END AS lev_cap
         FROM customer ORDER BY c_custkey""",

    "fn_url" ->
      // The synthesized URL shape is unambiguous, so every parse_url
      // part equals a direct string recomposition — exact, no regex.
      """SELECT doc_id,
                'https://' || source || '.example.org/' || lang || '/doc/'
                  || doc_id || '?ref=' || source || '&n=' || n_chars AS url,
                'https' AS proto,
                source || '.example.org' AS host,
                '/' || lang || '/doc/' || doc_id AS path,
                'ref=' || source || '&n=' || n_chars AS query,
                source AS ref,
                lang || ' ' || source AS dec
         FROM documents ORDER BY doc_id""",

    "fn_interval" ->
      """SELECT o_orderkey,
                CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
                  AS plus3mo,
                CAST(CAST(o_orderdate AS DATE) - INTERVAL 1 MONTH AS DATE)
                  AS minus1mo,
                CAST(o_orderdate AS DATE) - 14 AS minus2wk,
                CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr,
                CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
                CAST(o_orderdate AS DATE)
                  + CAST(((5 - isodow(o_orderdate) + 6) % 7) + 1 AS INT)
                  AS next_fri,
                o_orderdate + INTERVAL 36 HOUR AS plus36h,
                CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
         FROM orders ORDER BY o_orderkey""",
  )
}
