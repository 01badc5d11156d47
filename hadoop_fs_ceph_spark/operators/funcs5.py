"""Fifth function batch: modern-SQL surface — RE2-safe regexp family,
VARIANT semi-structured extraction (Spark 4), timestamp-interval
arithmetic, and ordered string aggregation (listagg / string_agg).

Cross-engine parity notes (verified empirically, both engines):
* DuckDB ``array_to_string(regexp_extract_all(...))`` yields NULL for a
  no-match (empty list) where Spark ``array_join`` yields ``''`` — the
  oracle wraps in ``COALESCE(..., '')``.
* DuckDB ``regexp_extract`` yields ``''`` for a no-match where Spark
  ``regexp_substr`` yields NULL — the oracle wraps in ``NULLIF(..., '')``
  (patterns used here cannot match the empty string).
* ``\\b`` is ASCII-only in RE2 (DuckDB) but Unicode-aware in Java
  (Spark) — regexp queries restrict to ``lang = 'en'`` ASCII text.
* Spark ``listagg(...) WITHIN GROUP (ORDER BY ...)`` ≡ DuckDB
  ``string_agg(... ORDER BY ...)``.

Reference parity: the reference connector has no function surface at all
(`CephRgwFileSystem.java` is pure FileSystem plumbing); this module is
part of the engine layer the connector exists to feed (SURVEY.md §2B).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_fs_ceph_spark.registry import query
from hadoop_fs_ceph_spark.tables import t

_WORD_PAT = r"\ba[a-z]+"


@query(
    "fn_regexp_family",
    oracle=f"""
    SELECT doc_id,
           CAST(length(regexp_extract_all(text, '{_WORD_PAT}')) AS INTEGER) AS rc,
           COALESCE(array_to_string(regexp_extract_all(text, '{_WORD_PAT}'), ','), '')
             AS all_csv,
           NULLIF(regexp_extract(text, '{_WORD_PAT}'), '') AS first_hit,
           regexp_matches(text, '{_WORD_PAT}') AS has_hit,
           regexp_replace(text, '{_WORD_PAT}', '_', 'g') AS redacted
    FROM documents
    WHERE lang = 'en' AND doc_id % 3 = 0
    ORDER BY doc_id
    """,
    tags=("function", "string", "regexp"),
)
def fn_regexp_family(spark, sf_dir):
    """Full regexp surface over the English corpus: match counting
    (regexp_count), all-matches extraction (regexp_extract_all →
    csv), first-match (regexp_substr), boolean test (rlike), and
    global substitution (regexp_replace). All JVM-side codegen'd
    intrinsics — the regex compiles once per task, so at 100 TB this
    is a pure map over the scan with zero shuffle. Restricted to
    ASCII text because RE2's word boundary is ASCII-only."""
    d = t(spark, sf_dir, "documents").filter(
        (F.col("lang") == "en") & (F.col("doc_id") % 3 == 0)
    )
    pat = F.lit(_WORD_PAT)
    return d.select(
        "doc_id",
        F.regexp_count("text", pat).alias("rc"),
        F.array_join(F.regexp_extract_all("text", pat, 0), ",").alias("all_csv"),
        F.regexp_substr("text", pat).alias("first_hit"),
        F.col("text").rlike(_WORD_PAT).alias("has_hit"),
        F.regexp_replace("text", _WORD_PAT, "_").alias("redacted"),
    ).orderBy("doc_id")


@query(
    "fn_variant_family",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k_doubled,
           json_extract_string(props, '$.missing') AS absent,
           (json_extract(props, '$.k') IS NOT NULL) AS has_k
    FROM events
    WHERE event_id % 11 = 0
    ORDER BY event_id
    """,
    tags=("function", "json", "variant"),
)
def fn_variant_family(spark, sf_dir):
    """Semi-structured VARIANT surface (Spark 4): parse once with
    try_parse_json, then typed path extraction via variant_get —
    int, string (numeric→string cast), arithmetic on the typed value,
    a missing path (NULL in both engines), and an existence flag.
    VARIANT stores a parsed binary encoding, so repeated path reads
    skip re-tokenizing the JSON text — the 100 TB win over
    get_json_object, which re-parses the string per call. Oracle is
    DuckDB's JSON path family over the same props column."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 0)
    v = F.try_parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        (F.variant_get(v, "$.k", "long") * 2).alias("k_doubled"),
        F.variant_get(v, "$.missing", "string").alias("absent"),
        F.variant_get(v, "$.k", "long").isNotNull().alias("has_k"),
    ).orderBy("event_id")


@query(
    "fn_interval_family",
    oracle="""
    SELECT event_id,
           ts + INTERVAL 90 MINUTE AS plus_90m,
           ts - INTERVAL 1 DAY AS minus_1d,
           CAST(date_diff('second', date_trunc('day', ts), ts) AS BIGINT)
             AS secs_into_day,
           CAST(date_diff('hour', TIMESTAMP '2024-01-01', ts) AS BIGINT)
             AS hours_since_jan1,
           epoch_us(ts) AS micros,
           date_trunc('second', ts) + INTERVAL 30 SECOND AS next_half_min
    FROM events
    WHERE event_id % 13 = 0
    ORDER BY event_id
    """,
    tags=("function", "datetime", "interval"),
)
def fn_interval_family(spark, sf_dir):
    """Sub-day interval arithmetic on event timestamps: ± INTERVAL
    shifts, timestampdiff in seconds/hours against day-truncation and
    a fixed epoch, exact microsecond extraction (unix_micros ≡
    epoch_us), and second-granularity snapping. Complements the
    date-level calendar family (funcs4) at timestamp precision; all
    codegen'd JVM intrinsics, no shuffle beyond the final sample
    sort."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") % 13 == 0)
    ts = F.col("ts")
    return e.select(
        "event_id",
        (ts + F.expr("INTERVAL 90 MINUTES")).alias("plus_90m"),
        (ts - F.expr("INTERVAL 1 DAY")).alias("minus_1d"),
        F.expr("timestampdiff(SECOND, date_trunc('day', ts), ts)")
        .cast("long")
        .alias("secs_into_day"),
        F.expr("timestampdiff(HOUR, TIMESTAMP '2024-01-01', ts)")
        .cast("long")
        .alias("hours_since_jan1"),
        F.unix_micros(ts).alias("micros"),
        (F.date_trunc("second", ts) + F.expr("INTERVAL 30 SECONDS")).alias(
            "next_half_min"
        ),
    ).orderBy("event_id")


@query(
    "agg_string_agg",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n,
           string_agg(c_name, ',' ORDER BY c_name) AS names_csv
    FROM customer
    WHERE c_custkey % 100 = 0
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("aggregate", "string", "listagg"),
)
def agg_string_agg(spark, sf_dir):
    """Ordered string aggregation: listagg WITHIN GROUP (ORDER BY)
    per market segment — the SQL:2023 spelling Spark 4 added, vs
    DuckDB's string_agg ORDER BY. The deterministic intra-group
    order is the whole point: an unordered concat is
    partition-order-dependent and can never hash-match. The modulo
    sample bounds string width at any SF; at 100 TB ordered listagg
    is a sort-based aggregate, so group width — not table size — is
    the cost driver."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 100 == 0)
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name)").alias(
                "names_csv"
            ),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "agg_bitwise_fold",
    oracle="""
    SELECT o_orderstatus,
           CAST(bit_and(o_orderkey) AS BIGINT) AS all_bits,
           CAST(bit_or(o_orderkey) AS BIGINT) AS any_bits,
           CAST(bit_xor(o_orderkey) AS BIGINT) AS parity_bits,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("aggregate", "bitwise"),
)
def agg_bitwise_fold(spark, sf_dir):
    """Bitwise aggregate folds (bit_and/bit_or/bit_xor) per order
    status — commutative+associative integer reductions, so they
    combine map-side and are order-independent by construction (the
    only aggregate family that needs NO canonicalization tricks).
    bit_xor is the classic distributed set-checksum: XOR of all ids
    detects single-row divergence between two replicas for free."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bit_and("o_orderkey").alias("all_bits"),
            F.bit_or("o_orderkey").alias("any_bits"),
            F.bit_xor("o_orderkey").alias("parity_bits"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "fn_char_family",
    oracle="""
    SELECT c_custkey,
           translate(c_name, 'aeiou', '-----') AS devoweled,
           reverse(c_name) AS reversed,
           repeat(left(c_name, 3), 2) AS stutter,
           right(c_name, 4) AS tail4,
           ascii(c_name) AS first_code,
           chr(ascii(c_name) + 1) AS next_char,
           length(c_name) AS n_chars
    FROM customer WHERE c_custkey % 37 = 0
    ORDER BY c_custkey
    """,
    tags=("function", "string", "char"),
)
def fn_char_family(spark, sf_dir):
    """Character-level string surface: translate (per-char mapping),
    reverse, repeat, left/right slicing, ascii↔chr round trip.
    All JVM intrinsics inside whole-stage codegen; translate is the
    cheap PII-masking primitive (single pass, no regex engine)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 37 == 0)
    return c.select(
        "c_custkey",
        F.translate("c_name", "aeiou", "-----").alias("devoweled"),
        F.reverse("c_name").alias("reversed"),
        F.repeat(F.left("c_name", F.lit(3)), 2).alias("stutter"),
        F.right("c_name", F.lit(4)).alias("tail4"),
        F.ascii("c_name").alias("first_code"),
        F.chr(F.ascii("c_name") + 1).alias("next_char"),
        F.length("c_name").alias("n_chars"),
    ).orderBy("c_custkey")


@query(
    "fn_mask_builtin",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
             c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS masked_default,
           regexp_replace(regexp_replace(regexp_replace(
             c_name, '[A-Z]', '*', 'g'), '[a-z]', '*', 'g'), '[0-9]', '#', 'g')
             AS masked_custom
    FROM customer WHERE c_custkey % 41 = 0
    ORDER BY c_custkey
    """,
    tags=("function", "string", "pii"),
)
def fn_mask_builtin(spark, sf_dir):
    """Built-in mask(): class-preserving PII redaction — uppercase→X,
    lowercase→x, digit→n (plus a custom-replacement variant) — in one
    codegen'd pass instead of three regex rewrites; shape (length,
    character classes) survives for downstream profiling while values
    are destroyed. The oracle reproduces it with chained
    regexp_replace, proving the semantic contract. Complements
    text_pii_scrub (pattern-targeted) with whole-value masking."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 41 == 0)
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("masked_default"),
        F.mask("c_name", F.lit("*"), F.lit("*"), F.lit("#")).alias("masked_custom"),
    ).orderBy("c_custkey")


@query(
    "fn_array_setops",
    oracle="""
    WITH halves AS (
      SELECT doc_id,
             string_split(text, ' ') AS tok,
             len(string_split(text, ' ')) AS n
      FROM documents WHERE doc_id % 11 = 3 AND len(string_split(text, ' ')) >= 2
    ),
    ab AS (
      SELECT doc_id,
             tok[1 : CAST(n // 2 AS INTEGER)] AS a,
             tok[CAST(n // 2 + 1 AS INTEGER) : CAST(n AS INTEGER)] AS b
      FROM halves
    )
    SELECT doc_id,
           len(list_distinct(list_concat(a, b))) AS n_union,
           len(list_distinct(list_filter(a, x -> NOT list_contains(b, x))))
             AS n_except,
           len(list_distinct(list_filter(a, x -> list_contains(b, x))))
             AS n_inter,
           list_has_any(a, b) AS overlap,
           len(flatten([a, b])) AS flat_n,
           array_to_string(list_sort(list_distinct(list_concat(a, b))), ' ')
             AS union_csv
    FROM ab
    ORDER BY doc_id
    """,
    tags=("function", "array", "setops"),
)
def fn_array_setops(spark, sf_dir):
    """Array set algebra on each document's two token halves:
    array_union / array_except / array_intersect (all distinct-set
    semantics), arrays_overlap, and flatten — the vocabulary-diff
    primitives behind incremental dedup (what's new in this shard vs
    the last) and split-half consistency checks. Sorted-CSV output
    pins the set content, not just its size; everything is per-row
    JVM codegen over the scan, zero shuffle before the sample sort."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 3)
    halves = d.select(
        "doc_id", F.split("text", " ").alias("tok")
    ).withColumn("n", F.size("tok")).filter(F.col("n") >= 2)
    ab = halves.select(
        "doc_id",
        F.slice("tok", 1, (F.col("n") / 2).cast("int")).alias("a"),
        F.expr("slice(tok, CAST(n / 2 AS INT) + 1, n - CAST(n / 2 AS INT))").alias("b"),
    )
    return ab.select(
        "doc_id",
        F.size(F.array_union("a", "b")).alias("n_union"),
        F.size(F.array_except("a", "b")).alias("n_except"),
        F.size(F.array_intersect("a", "b")).alias("n_inter"),
        F.arrays_overlap("a", "b").alias("overlap"),
        F.size(F.flatten(F.array("a", "b"))).alias("flat_n"),
        F.array_join(F.array_sort(F.array_union("a", "b")), " ").alias("union_csv"),
    ).orderBy("doc_id")


@query(
    "fn_aes_roundtrip",
    oracle="""
    SELECT doc_id,
           text AS roundtrip,
           CAST(octet_length(encode(text)) + 28 AS BIGINT) AS ct_len,
           TRUE AS ok
    FROM documents WHERE doc_id % 17 = 4
    ORDER BY doc_id
    """,
    tags=("function", "crypto", "aes"),
)
def fn_aes_roundtrip(spark, sf_dir):
    """Column-level encryption at rest: aes_encrypt (AES-128-GCM,
    random IV per value) then aes_decrypt with the same key must be
    the identity — the oracle checks the decrypted text against the
    source, and the ciphertext length against the GCM layout
    (12-byte IV ‖ ciphertext ‖ 16-byte tag = n+28, deterministic even
    though the bytes aren't). This is how PII columns ride through an
    untrusted lake: opaque binary in parquet, keys only at the
    compute layer. Both directions are JVM intrinsics — no Python in
    the loop."""
    key = F.lit("0123456789abcdef")
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 17 == 4)
    ct = F.aes_encrypt(F.col("text"), key)
    rt = F.decode(F.aes_decrypt(ct, key), "utf-8")
    return d.select(
        "doc_id",
        rt.alias("roundtrip"),
        F.length(ct).cast("long").alias("ct_len"),
        (rt == F.col("text")).alias("ok"),
    ).orderBy("doc_id")


@query(
    "fn_collation_family",
    oracle="""
    WITH m AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END AS l
      FROM documents
    )
    SELECT lower(l) AS lang_ci,
           COUNT(*) AS n,
           COUNT(DISTINCT l) AS n_case_variants
    FROM m GROUP BY lower(l) ORDER BY lang_ci
    """,
    tags=("function", "collation", "string"),
)
def fn_collation_family(spark, sf_dir):
    """Spark 4 string collations: grouping under UTF8_LCASE treats case
    variants as ONE key at the collation layer — no lower() rewrite of
    the data — while COUNT(DISTINCT) of the raw (binary-collated) value
    inside each group counts the surviving case variants. Collation-aware
    grouping is the engine-level answer to case-insensitive semantics:
    the comparison/hash changes, the bytes don't, so the column remains
    byte-faithful for everything downstream (the oracle expresses the
    same result with an explicit lower(), the pre-collation idiom).

    Mixed-case input is derived deterministically (even doc_ids
    uppercased). The group representative under a case-insensitive
    collation is partition-order-dependent, so the output key is
    lower()'d — the only canonicalization in the query."""
    d = t(spark, sf_dir, "documents")
    m = d.select(
        F.when(F.col("doc_id") % 2 == 0, F.upper("lang"))
        .otherwise(F.col("lang"))
        .alias("l")
    )
    return (
        m.groupBy(F.expr("COLLATE(l, 'UTF8_LCASE')").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("l").alias("n_case_variants"),
        )
        .select(F.lower("k").alias("lang_ci"), "n", "n_case_variants")
        .orderBy("lang_ci")
    )


@query(
    "fn_xml_family",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status_rt,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents_rt,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr_xpath
    FROM orders WHERE o_orderkey % 101 = 0
    ORDER BY o_orderkey
    """,
    tags=("function", "xml", "roundtrip"),
)
def fn_xml_family(spark, sf_dir):
    """XML function family (Spark 4 built-ins): each sampled order is
    serialized to an XML fragment, parsed back with ``from_xml`` against
    a declared struct schema, and one field is independently re-extracted
    with the ``xpath_int`` path function — the oracle is the IDENTITY
    round-trip (original columns straight from the table), so any parser
    or schema-coercion deviation breaks the hash. XML is the remaining
    semi-structured wire format next to the JSON (`fn_json_*`) and
    VARIANT (`fn_variant_*`) families; all three parse map-side inside
    codegen, no shuffle beyond the demo's ordering."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 101 == 0)
    xml = F.concat(
        F.lit("<o><s>"),
        F.col("o_orderstatus"),
        F.lit("</s><c>"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        F.lit("</c><y>"),
        F.year("o_orderdate").cast("string"),
        F.lit("</y></o>"),
    )
    withx = o.select("o_orderkey", xml.alias("xml"))
    parsed = withx.select(
        "o_orderkey",
        F.from_xml("xml", "s string, c bigint, y int").alias("p"),
        F.expr("xpath_int(xml, '/o/y/text()')").alias("yr_xpath"),
    )
    return (
        parsed.select(
            "o_orderkey",
            F.col("p.s").alias("status_rt"),
            F.col("p.c").alias("cents_rt"),
            "yr_xpath",
        )
        .orderBy("o_orderkey")
    )


@query(
    "fn_csv_scalar_roundtrip",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status_rt,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents_rt,
           o_orderpriority AS priority_rt
    FROM orders WHERE o_orderkey % 103 = 0
    ORDER BY o_orderkey
    """,
    tags=("function", "csv", "roundtrip"),
)
def fn_csv_scalar_roundtrip(spark, sf_dir):
    """Scalar CSV codec functions — ``to_csv(struct)`` then ``from_csv``
    with a declared schema (the per-CELL codec for embedded CSV payloads
    in message queues or log fields, distinct from the file-level
    `src_csv_*` source family). Identity-round-trip oracle: the parsed
    fields must equal the original columns exactly, including a field
    containing the delimiter-adjacent '-' and mixed case. Map-side
    inside codegen, no shuffle beyond the demo ordering."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 103 == 0)
    line = F.to_csv(
        F.struct(
            F.col("o_orderstatus").alias("s"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
            F.col("o_orderpriority").alias("p"),
        )
    )
    parsed = o.select(
        "o_orderkey",
        F.from_csv(line, "s string, c bigint, p string").alias("r"),
    )
    return (
        parsed.select(
            "o_orderkey",
            F.col("r.s").alias("status_rt"),
            F.col("r.c").alias("cents_rt"),
            F.col("r.p").alias("priority_rt"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "fn_luhn_family",
    oracle="""
    WITH nums AS (
      SELECT c_custkey,
             lpad(CAST(c_custkey AS VARCHAR), 11, '0')
               || CAST(c_custkey % 10 AS VARCHAR) AS num
      FROM customer
    ),
    checked AS (
      SELECT c_custkey, num,
             list_sum(list_transform(generate_series(1, 12), i ->
               CASE WHEN i % 2 = 0 THEN
                 CASE WHEN 2 * CAST(substr(num, 13 - CAST(i AS INTEGER), 1)
                                   AS INTEGER) > 9
                      THEN 2 * CAST(substr(num, 13 - CAST(i AS INTEGER), 1)
                                    AS INTEGER) - 9
                      ELSE 2 * CAST(substr(num, 13 - CAST(i AS INTEGER), 1)
                                    AS INTEGER) END
               ELSE CAST(substr(num, 13 - CAST(i AS INTEGER), 1) AS INTEGER)
               END)) % 10 = 0 AS is_valid
      FROM nums
    )
    SELECT is_valid, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(c_custkey) AS BIGINT) AS first_key
    FROM checked GROUP BY is_valid ORDER BY is_valid
    """,
    tags=("function", "checksum", "validation"),
)
def fn_luhn_family(spark, sf_dir):
    """`luhn_check` — the mod-10 checksum validator (card/IMEI-style
    identifiers) over synthetic 12-digit account numbers derived from
    customer keys; the DuckDB twin re-implements Luhn arithmetically
    (doubled even positions from the right, −9 overflow fold), so the
    hash match pins Spark's builtin against the textbook definition
    rather than against itself. Validation verdicts aggregate per
    outcome — the ingest-quality gate shape (reject invalid
    identifiers at the scan, map-side, before any join)."""
    c = t(spark, sf_dir, "customer")
    nums = c.select(
        "c_custkey",
        F.concat(
            F.lpad(F.col("c_custkey").cast("string"), 11, "0"),
            (F.col("c_custkey") % 10).cast("string"),
        ).alias("num"),
    )
    checked = nums.select(
        "c_custkey", F.expr("luhn_check(num)").alias("is_valid")
    )
    return (
        checked.groupBy("is_valid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("c_custkey").cast("long").alias("first_key"),
        )
        .orderBy("is_valid")
    )


@query(
    "fn_base64_roundtrip",
    oracle="""
    SELECT doc_id,
           to_base64(encode(substr(text, 1, 24))) AS b64,
           substr(text, 1, 24)
             = decode(from_base64(to_base64(encode(substr(text, 1, 24)))))
             AS roundtrips,
           octet_length(encode(to_base64(encode(substr(text, 1, 24)))))
             = 4 * ((octet_length(encode(substr(text, 1, 24))) + 2) // 3)
             AS length_contract
    FROM documents
    """,
    tags=("function", "codec", "base64"),
)
def fn_base64_roundtrip(spark, sf_dir):
    """Base64 codec surface — the wire format binary payloads ride
    through JSON APIs and manifests: encode a UTF-8 prefix, verify the
    decode round-trip AND RFC 4648's exact length law
    |b64| = 4·⌈n/3⌉ (padding included), per row. Both engines emit the
    canonical padded alphabet, so the encoded STRING itself
    hash-matches — this pins the codec output, not just the
    round-trip.

    Map-side only; at 100 TB this is the manifest-encode step of
    `mm_shard_offset_index`-style loaders."""
    d = t(spark, sf_dir, "documents")
    prefix = F.encode(F.substring("text", 1, 24), "utf-8")
    b64 = F.base64(prefix)
    return d.select(
        "doc_id",
        b64.alias("b64"),
        (prefix == F.unbase64(b64)).alias("roundtrips"),
        (
            F.octet_length(b64)
            == 4 * F.floor((F.octet_length(prefix) + 2) / 3).cast("int")
        ).alias("length_contract"),
    )
