"""Environment profiles (config.py) — the dev/prod deployment surface."""

from __future__ import annotations

import os

import pytest

from incremental_datapipeline_using_snowflake_spark.config import (
    PROFILES,
    get_profile,
    interpolate,
    load_profile,
)


def test_builtin_profiles_differ_as_reference_envs_do():
    """dev vs prod mirrors config/dev.yml vs config/prod.yml: distinct
    warehouse roots, sizing, and task-execution posture."""
    dev, prod = PROFILES["dev"], PROFILES["prod"]
    assert dev.resolved_root() != prod.resolved_root()
    assert dev.shuffle_partitions == 8 and prod.shuffle_partitions is None
    assert dev.execute_tasks_immediately and not prod.execute_tasks_immediately
    # both carry the reference's four-schema layout
    assert set(dev.schemas) >= {"raw_co2", "harmonized_co2", "analytics_co2"}


def test_interpolation_env_and_default(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", "/data/wh")
    assert PROFILES["dev"].resolved_root() == "/data/wh/dev"
    monkeypatch.delenv("SPARK_GRAFT_WAREHOUSE")
    assert PROFILES["dev"].resolved_root() == "/tmp/co2_warehouse/dev"
    assert interpolate("a-${NOPE_UNSET_VAR}-b") == "a--b"


def test_load_profile_from_file(tmp_path, monkeypatch):
    monkeypatch.setenv("MY_ROOT", str(tmp_path / "wh"))
    cfg = tmp_path / "staging.yml"
    cfg.write_text(
        """
# staging environment
env: "staging"
warehouse_root: ${MY_ROOT}/staging
shuffle_partitions: 4
task_schedule: '0 6 * * *'  # 6 AM
execute_tasks_immediately: false
spark.sql.autoBroadcastJoinThreshold: 1048576
schemas:
  - "raw_co2"
  - "analytics_co2"
"""
    )
    p = load_profile(str(cfg))
    assert p.env == "staging"
    assert p.resolved_root() == str(tmp_path / "wh") + "/staging"
    assert p.shuffle_partitions == 4
    assert p.task_schedule == "0 6 * * *"
    assert p.execute_tasks_immediately is False
    assert p.schemas == ("raw_co2", "analytics_co2")
    assert p.session_conf["spark.sql.autoBroadcastJoinThreshold"] == "1048576"
    # get_profile resolves paths as well as registry names
    assert get_profile(str(cfg)).env == "staging"
    with pytest.raises(KeyError, match="unknown profile"):
        get_profile("nonexistent")


def test_profile_store_and_session(spark, tmp_path, monkeypatch):
    """Profile -> TableStore root; get_session(profile=...) applies the
    profile's runtime-modifiable confs to the live session."""
    from incremental_datapipeline_using_snowflake_spark.config import Profile
    from incremental_datapipeline_using_snowflake_spark.session import get_session

    p = Profile(
        env="t",
        warehouse_root=str(tmp_path / "wh"),
        shuffle_partitions=6,
        session_conf={"spark.sql.autoBroadcastJoinThreshold": "2097152"},
    )
    store = p.store()
    store.overwrite(spark.createDataFrame([(1,)], "x long"), "raw_co2.t")
    assert os.path.isdir(os.path.join(str(tmp_path / "wh"), "raw_co2", "t"))

    s = get_session("profile-test", profile=p)
    assert s.conf.get("spark.sql.shuffle.partitions") == "6"
    assert s.conf.get("spark.sql.autoBroadcastJoinThreshold") == "2097152"
    # restore the shared test session's sizing
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_translate_snowflake_sql_unit():
    """Dialect shim: QUALIFY rewrite, function maps, literal protection."""
    from incremental_datapipeline_using_snowflake_spark.functions.sql_script import (
        translate_snowflake_sql as tr,
    )

    out = tr("SELECT a FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1")
    assert out.startswith("SELECT * EXCEPT (__qualify) FROM (")
    assert "(ROW_NUMBER() OVER (ORDER BY a) = 1) AS __qualify" in out
    assert out.rstrip().endswith("WHERE __qualify")

    # trailing ORDER BY / LIMIT stay OUTSIDE the subquery
    out = tr("SELECT a FROM t QUALIFY rank() OVER (ORDER BY a) <= 2 ORDER BY a LIMIT 5")
    assert out.rstrip().endswith("WHERE __qualify ORDER BY a LIMIT 5")

    # function spellings
    assert tr("SELECT IFF(x > 0, 'p', 'n') FROM t") == "SELECT if(x > 0, 'p', 'n') FROM t"
    assert tr("SELECT DATEADD(day, 3, d) FROM t") == "SELECT timestampadd(day, 3, d) FROM t"
    assert (
        tr("SELECT TO_VARCHAR(x + f(y)) FROM t")
        == "SELECT CAST(x + f(y) AS STRING) FROM t"
    )
    assert tr("CREATE OR REPLACE TRANSIENT TABLE t AS SELECT 1") == (
        "CREATE OR REPLACE TABLE t AS SELECT 1"
    )

    # literals and comments are never rewritten
    assert tr("SELECT 'QUALIFY IFF(' FROM t") == "SELECT 'QUALIFY IFF(' FROM t"
    kept = tr("SELECT a -- QUALIFY in a comment\nFROM t")
    assert "QUALIFY in a comment" in kept and "__qualify" not in kept

    # a subquery-level QUALIFY is rewritten too (r06: deepest scope first)
    sub = "SELECT * FROM (SELECT a FROM t QUALIFY r = 1) s"
    assert tr(sub) == (
        "SELECT * FROM (SELECT * EXCEPT (__qualify) FROM "
        "(SELECT a, (r = 1) AS __qualify FROM t) WHERE __qualify) s"
    )


def test_translate_snowflake_distinct_qualify_refused():
    import pytest as _pytest

    from incremental_datapipeline_using_snowflake_spark.functions.sql_script import (
        translate_snowflake_sql as tr,
    )

    with _pytest.raises(ValueError, match="DISTINCT"):
        tr("SELECT DISTINCT a FROM t QUALIFY row_number() OVER (ORDER BY a) = 1")


def test_translate_to_varchar_with_literal_argument():
    """ADVICE r05: the TO_VARCHAR paren scan crosses string-literal and
    comment segments (depth carried through), so literals inside the
    argument no longer truncate the splice."""
    import pytest as _pytest

    from incremental_datapipeline_using_snowflake_spark.functions.sql_script import (
        translate_snowflake_sql as tr,
    )

    assert (
        tr("SELECT TO_VARCHAR(coalesce(x, 'none')) FROM t")
        == "SELECT CAST(coalesce(x, 'none') AS STRING) FROM t"
    )
    # literal containing parens/commas must not disturb the depth math
    assert (
        tr("SELECT TO_VARCHAR(coalesce(x, '),(')) FROM t")
        == "SELECT CAST(coalesce(x, '),(') AS STRING) FROM t"
    )
    # comment inside the argument
    assert (
        tr("SELECT TO_VARCHAR(x /* ) */ + 1) FROM t")
        == "SELECT CAST(x /* ) */ + 1 AS STRING) FROM t"
    )
    # nested TO_VARCHAR, both rewritten
    assert (
        tr("SELECT TO_VARCHAR(TO_VARCHAR(x)) FROM t")
        == "SELECT CAST(CAST(x AS STRING) AS STRING) FROM t"
    )
    # two-arg datetime form translates to date_format (r06)
    assert (
        tr("SELECT TO_VARCHAR(ts, 'YYYY-MM-DD') FROM t")
        == "SELECT date_format(ts, 'yyyy-MM-dd') FROM t"
    )
    assert (
        tr("SELECT TO_VARCHAR(ts, 'DD Mon YYYY HH24:MI:SS.FF3') FROM t")
        == "SELECT date_format(ts, 'dd MMM yyyy HH:mm:ss.SSS') FROM t"
    )
    # ...but numeric formats and non-literal formats still refuse loudly
    with _pytest.raises(NotImplementedError, match="numeric format"):
        tr("SELECT TO_VARCHAR(x, '9,999.00') FROM t")
    with _pytest.raises(NotImplementedError, match="string-literal"):
        tr("SELECT TO_VARCHAR(x, some_col) FROM t")
    with _pytest.raises(NotImplementedError, match="unknown TO_VARCHAR"):
        tr("SELECT TO_VARCHAR(x, 'QQQ') FROM t")


def test_translate_try_to_number_and_native_passthroughs(spark):
    """r07: TRY_TO_NUMBER translation (bare -> DECIMAL(38,0) try_cast,
    (p,s) -> DECIMAL(p,s), literal format -> native try_to_number) and the
    PIN that NVL/NVL2/ZEROIFNULL/LISTAGG are Spark-4-native passthroughs —
    if a Spark upgrade drops one, this test catches the shim gap."""
    import pytest as _pytest

    from incremental_datapipeline_using_snowflake_spark.functions.sql_script import (
        translate_snowflake_sql as tr,
    )

    assert (
        tr("SELECT TRY_TO_NUMBER(x) FROM t")
        == "SELECT try_cast(x AS DECIMAL(38, 0)) FROM t"
    )
    assert (
        tr("SELECT TRY_TO_NUMBER(substr(x, 1, 2), 10, 2) FROM t")
        == "SELECT try_cast(substr(x, 1, 2) AS DECIMAL(10, 2)) FROM t"
    )
    assert (
        tr("SELECT TRY_TO_NUMBER(x, '999.99') FROM t")
        == "SELECT try_to_number(x, '999.99') FROM t"
    )
    with _pytest.raises(NotImplementedError, match="string-literal format"):
        tr("SELECT TRY_TO_NUMBER(x, some_col) FROM t")
    with _pytest.raises(NotImplementedError, match="integer literals"):
        tr("SELECT TRY_TO_NUMBER(x, p, s) FROM t")

    # native passthroughs: the shim must NOT touch them, and Spark must
    # actually execute them (both asserted)
    for sf in [
        "SELECT NVL(NULL, 3) AS v",
        "SELECT NVL2(1, 'a', 'b') AS v",
        "SELECT ZEROIFNULL(NULL) AS v",
        "SELECT LISTAGG(c, ',') WITHIN GROUP (ORDER BY c DESC) AS v "
        "FROM VALUES ('a'), ('b') t(c)",
        "SELECT LISTAGG(DISTINCT c, ',') WITHIN GROUP (ORDER BY c) AS v "
        "FROM VALUES ('a'), ('a'), ('b') t(c)",
    ]:
        assert tr(sf) == sf
        spark.sql(sf).collect()


def test_translate_bare_listagg_and_array_construct(spark):
    """r08: bare LISTAGG (which Spark 4 refuses outright) gains a
    deterministic WITHIN GROUP (ORDER BY <arg>) default; ordered forms
    pass through untouched; ARRAY_CONSTRUCT[_COMPACT] map to array with
    Snowflake's NULL-element semantics."""
    from incremental_datapipeline_using_snowflake_spark.functions.sql_script import (
        translate_snowflake_sql as tr,
    )

    out = tr("SELECT LISTAGG(c, ',') AS v FROM t GROUP BY g")
    assert "LISTAGG(c, ',') WITHIN GROUP (ORDER BY c)" in out
    out = tr("SELECT LISTAGG(DISTINCT c, ',') AS v FROM t")
    assert "WITHIN GROUP (ORDER BY c)" in out
    # already-ordered form untouched
    sf = "SELECT LISTAGG(c, ',') WITHIN GROUP (ORDER BY c DESC) AS v FROM t"
    assert tr(sf) == sf
    # literal containing 'LISTAGG(' untouched
    lit = "SELECT 'LISTAGG(x)' AS s FROM t"
    assert tr(lit) == lit
    # execution: deterministic result without user-specified order
    rows = spark.sql(tr(
        "SELECT LISTAGG(c, '|') AS v FROM VALUES ('b'), ('a'), ('c') t(c)"
    )).collect()
    assert rows[0]["v"] == "a|b|c"

    out = tr("SELECT ARRAY_CONSTRUCT(1, 2, x) FROM t")
    assert "array(1, 2, x)" in out
    row = spark.sql(tr(
        "SELECT ARRAY_CONSTRUCT(1, NULL, 2) AS keep, "
        "ARRAY_CONSTRUCT_COMPACT(1, NULL, 2) AS dropped"
    )).collect()[0]
    assert row["keep"] == [1, None, 2]
    assert row["dropped"] == [1, 2]


def test_translate_colon_variant_paths(spark):
    """r08: the v:a.b[0] VARIANT path operator rewrites to variant_get
    JSON paths; :: casts, bind markers, and literals stay untouched."""
    from incremental_datapipeline_using_snowflake_spark.functions.sql_script import (
        translate_snowflake_sql as tr,
    )

    assert tr("SELECT v:a FROM t") == "SELECT variant_get(v, '$.a') FROM t"
    assert (
        tr("SELECT d.v:items.name[0] FROM t d")
        == "SELECT variant_get(d.v, '$.items.name[0]') FROM t d"
    )
    # :: casts (tight and spaced) untouched
    for sf in ("SELECT x::int FROM t", "SELECT x :: int FROM t"):
        assert tr(sf) == sf
    # parameter markers (whitespace before colon) untouched
    sf = "EXECUTE IMMEDIATE :stmt"
    assert tr(sf) == sf
    # colons inside string literals untouched
    lit = "SELECT 'a:b' AS s, TIMESTAMP '2020-01-01 12:30:00' AS ts FROM t"
    assert tr(lit) == lit
    # field:TYPE pairs inside complex-type DDL untouched (both cases)
    for ddl in (
        "SELECT CAST(x AS STRUCT<a:INT>) FROM t",
        "SELECT CAST(x AS struct<a:int, b:string>) FROM t",
        "SELECT CAST(x AS MAP<STRING, ARRAY<y:DOUBLE>>) FROM t",
    ):
        assert tr(ddl) == ddl
    # composes with FLATTEN: the input's colon path rewrites first
    out = tr("SELECT f.value FROM t, LATERAL FLATTEN(INPUT => v:items) f")
    assert "variant_get(v, '$.items')" in out and "variant_explode" in out
    # execution end-to-end, including a cast of the extracted value
    rows = spark.sql(tr(
        "SELECT v:a.b[1]::int AS x, v:missing IS NULL AS m "
        "FROM (SELECT parse_json('{\"a\": {\"b\": [5, 6]}}') AS v)"
    )).collect()
    assert rows[0]["x"] == 6 and rows[0]["m"] is True


def test_translate_lateral_flatten(spark):
    """r08: LATERAL FLATTEN / TABLE(FLATTEN(...)) -> LATERAL
    variant_explode[_outer] with (index, key, value) alias columns;
    PATH wraps the input in variant_get; RECURSIVE/non-BOTH MODE refuse;
    bare flatten() (Spark's array scalar) passes through."""
    import pytest as _pytest

    from incremental_datapipeline_using_snowflake_spark.functions.sql_script import (
        translate_snowflake_sql as tr,
    )

    out = tr(
        "SELECT t.id, f.value FROM t, LATERAL FLATTEN(INPUT => parse_json(js)) f"
    )
    assert (
        "LATERAL variant_explode(CAST((parse_json(js)) AS VARIANT)) "
        "f(index, key, value)" in out
    )
    assert "FLATTEN" not in out.upper()

    # TABLE(FLATTEN(...)) form, AS alias, OUTER => TRUE
    out = tr(
        "SELECT f.index FROM t, TABLE(FLATTEN(INPUT => arr, OUTER => TRUE)) AS f"
    )
    assert "variant_explode_outer" in out and "TABLE" not in out.upper()
    assert "f(index, key, value)" in out

    # positional input + PATH
    out = tr("SELECT f.value FROM t, LATERAL FLATTEN(js, PATH => 'a.b') f")
    assert "variant_get(js, '$.a.b')" in out

    # no alias -> default _flat; following WHERE not eaten as an alias
    out = tr("SELECT value FROM t, LATERAL FLATTEN(INPUT => js) WHERE id = 1")
    assert "_flat(index, key, value)" in out and "WHERE id = 1" in out

    with _pytest.raises(NotImplementedError, match="RECURSIVE"):
        tr("SELECT * FROM t, LATERAL FLATTEN(INPUT => js, RECURSIVE => TRUE) f")
    with _pytest.raises(NotImplementedError, match="MODE"):
        tr("SELECT * FROM t, LATERAL FLATTEN(INPUT => js, MODE => 'ARRAY') f")
    # Spark's scalar array flatten is NOT Snowflake table-FLATTEN: untouched
    sf = "SELECT flatten(array(array(1), array(2))) AS v"
    assert tr(sf) == sf
    spark.sql(sf).collect()

    # end-to-end: Snowflake-style flatten over a JSON array executes
    rows = spark.sql(tr(
        "SELECT id, f.index AS i, CAST(f.value AS INT) AS v "
        "FROM (SELECT 1 AS id, '[7, 8]' AS js) t, "
        "LATERAL FLATTEN(INPUT => parse_json(js)) f ORDER BY i"
    )).collect()
    assert [(r["i"], r["v"]) for r in rows] == [(0, 7), (1, 8)]
    # OUTER keeps rows whose input is empty
    rows = spark.sql(tr(
        "SELECT id, f.index AS i FROM (SELECT 1 AS id, '[]' AS js) t, "
        "LATERAL FLATTEN(INPUT => parse_json(js), OUTER => TRUE) f"
    )).collect()
    assert [(r["id"], r["i"]) for r in rows] == [(1, None)]
    # objects yield key/value pairs
    rows = spark.sql(tr(
        "SELECT f.key AS k, CAST(f.value AS INT) AS v "
        "FROM (SELECT '{\"x\": 1, \"y\": 2}' AS js) t, "
        "LATERAL FLATTEN(INPUT => parse_json(js)) f ORDER BY k"
    )).collect()
    assert [(r["k"], r["v"]) for r in rows] == [("x", 1), ("y", 2)]


def test_translate_object_construct_and_get_path(spark):
    """r08: OBJECT_CONSTRUCT drops null-valued pairs (Snowflake contract),
    OBJECT_CONSTRUCT_KEEP_NULL keeps them, GET_PATH maps onto variant_get
    JSON paths; dynamic keys / non-literal paths refuse loudly."""
    import pytest as _pytest

    from incremental_datapipeline_using_snowflake_spark.functions.sql_script import (
        translate_snowflake_sql as tr,
    )

    out = tr("SELECT OBJECT_CONSTRUCT('a', 1, 'b', x) AS o FROM t")
    assert "named_struct('a', 1, 'b', x)" in out and "ignoreNullFields" in out
    out = tr("SELECT OBJECT_CONSTRUCT_KEEP_NULL('a', v) AS o FROM t")
    assert out == "SELECT to_variant_object(named_struct('a', v)) AS o FROM t"
    out = tr("SELECT GET_PATH(v, 'a.b[0]') FROM t")
    assert out == "SELECT variant_get(v, '$.a.b[0]') FROM t"
    assert "'$[1]'" in tr("SELECT GET_PATH(v, '[1]') FROM t")

    with _pytest.raises(NotImplementedError, match="keys must be string"):
        tr("SELECT OBJECT_CONSTRUCT(k, 1) FROM t")
    with _pytest.raises(NotImplementedError, match=r"OBJECT_CONSTRUCT\(\*\)"):
        tr("SELECT OBJECT_CONSTRUCT(*) FROM t")
    with _pytest.raises(NotImplementedError, match="PAIRS"):
        tr("SELECT OBJECT_CONSTRUCT('a', 1, 'b') FROM t")
    with _pytest.raises(NotImplementedError, match="string-literal path"):
        tr("SELECT GET_PATH(v, p) FROM t")

    # execution: null pair dropped vs kept; GET_PATH round-trips through
    # an OBJECT_CONSTRUCT result
    row = spark.sql(tr(
        "SELECT to_json(OBJECT_CONSTRUCT('a', 1, 'b', CAST(NULL AS INT))) AS d, "
        "to_json(OBJECT_CONSTRUCT_KEEP_NULL('a', 1, 'b', CAST(NULL AS INT))) AS k, "
        "CAST(GET_PATH(OBJECT_CONSTRUCT('p', ARRAY(5, 6)), 'p[1]') AS INT) AS g"
    )).collect()[0]
    assert row["d"] == '{"a":1}'
    assert row["k"] == '{"a":1,"b":null}'
    assert row["g"] == 6

    # composition: FLATTEN over an OBJECT_CONSTRUCT result
    rows = spark.sql(tr(
        "SELECT f.key AS k FROM (SELECT 1 AS id) t, "
        "LATERAL FLATTEN(INPUT => OBJECT_CONSTRUCT('m', 1, 'n', 2)) f ORDER BY k"
    )).collect()
    assert [r["k"] for r in rows] == ["m", "n"]


def test_translate_nested_qualify():
    """r06: depth>0 QUALIFY scopes rewrite innermost-first; the DISTINCT
    refusal still raises (now from any scope); unrewritable scopes are left
    for the parser."""
    import pytest as _pytest

    from incremental_datapipeline_using_snowflake_spark.functions.sql_script import (
        translate_snowflake_sql as tr,
    )

    # inner + outer QUALIFY in one statement, both rewritten
    out = tr(
        "SELECT c, n FROM (SELECT c, count(*) AS n FROM "
        "(SELECT c, v FROM t QUALIFY row_number() OVER (PARTITION BY c ORDER BY v DESC) <= 3) x "
        "GROUP BY c) y QUALIFY rank() OVER (ORDER BY n DESC) <= 5 ORDER BY c"
    )
    assert out.count("__qualify") >= 4  # two scopes, each projects + filters
    assert "QUALIFY" not in out.upper().replace("__QUALIFY", "")
    assert out.rstrip().endswith("ORDER BY c")

    # QUALIFY inside a string literal in a subquery still untouched
    lit = "SELECT * FROM (SELECT 'QUALIFY x' AS s FROM t) q"
    assert tr(lit) == lit

    # DISTINCT refusal propagates from an inner scope
    with _pytest.raises(ValueError, match="DISTINCT"):
        tr(
            "SELECT * FROM (SELECT DISTINCT a FROM t "
            "QUALIFY row_number() OVER (ORDER BY a) = 1) s"
        )


def test_translate_to_date_timestamp_formats():
    """r06: TO_DATE/TO_TIMESTAMP translate with Snowflake->Spark format
    conversion; single-arg forms pass through to the Spark builtins."""
    import pytest as _pytest

    from incremental_datapipeline_using_snowflake_spark.functions.sql_script import (
        translate_snowflake_sql as tr,
    )

    assert (
        tr("SELECT TO_DATE(s, 'YYYY-MM-DD') FROM t")
        == "SELECT to_date(s, 'yyyy-MM-dd') FROM t"
    )
    assert tr("SELECT TO_DATE(s) FROM t") == "SELECT to_date(s) FROM t"
    assert (
        tr("SELECT TO_TIMESTAMP(s, 'YYYY-MM-DD HH24:MI:SS') FROM t")
        == "SELECT to_timestamp(s, 'yyyy-MM-dd HH:mm:ss') FROM t"
    )
    assert tr("SELECT TO_TIMESTAMP(s) FROM t") == "SELECT to_timestamp(s) FROM t"
    # literal inside the expression argument does not break the splice
    assert (
        tr("SELECT TO_DATE(coalesce(s, '1970-01-01'), 'YYYY-MM-DD') FROM t")
        == "SELECT to_date(coalesce(s, '1970-01-01'), 'yyyy-MM-dd') FROM t"
    )
    with _pytest.raises(NotImplementedError, match="string-literal"):
        tr("SELECT TO_DATE(s, fmt_col) FROM t")
