"""SQL DML surface: execute_sql routing DELETE/UPDATE/MERGE/INSERT to the
native DML implementations, plus live-view (query-time snapshot) semantics.

Reference behavior: full SQL DML over attached catalogs — sqllogictests under
test/sql/local/catalog_test_config_setup/catalog_agnostic/{delete,merge,
update}; query-time snapshot resolution via
iceberg_table_schema_version.cpp:101-106.
"""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import load


@pytest.fixture()
def nation_table(spark, sf_dir, tmp_path):
    from duckdb_iceberg_spark import write_iceberg

    loc = os.path.join(str(tmp_path), "nation_sqldml")
    write_iceberg(load(spark, sf_dir, "nation"), loc)
    return loc


def _register(spark, loc, name):
    from duckdb_iceberg_spark.sources.sql import register_table

    register_table(spark, name, loc)
    return name


def test_sql_delete(spark, nation_table):
    from duckdb_iceberg_spark.sources.sql import execute_sql

    _register(spark, nation_table, "nat_del")
    res = execute_sql(spark, "DELETE FROM nat_del WHERE n_regionkey = 0")
    row = res.first()
    assert row.operation == "DELETE" and row.snapshot_id is not None
    # view refreshed: deleted rows gone without re-registering
    left = spark.sql("SELECT count(*) c, sum(n_regionkey) s FROM nat_del").first()
    assert left.c == 20 and left.s == 50  # 5 nations per region, regions 1-4


def test_sql_update_with_alias(spark, nation_table):
    from duckdb_iceberg_spark.sources.sql import execute_sql

    _register(spark, nation_table, "nat_upd")
    execute_sql(
        spark,
        "UPDATE nat_upd AS n SET n_name = concat('X-', upper(n.n_name)) "
        "WHERE n.n_regionkey = 2")
    rows = spark.sql(
        "SELECT n_name FROM nat_upd WHERE n_regionkey = 2").collect()
    assert len(rows) == 5
    assert all(r.n_name.startswith("X-") and r.n_name == r.n_name.upper()
               for r in rows)
    untouched = spark.sql(
        "SELECT count(*) c FROM nat_upd WHERE n_regionkey <> 2 "
        "AND n_name LIKE 'X-%'").first()
    assert untouched.c == 0


def test_sql_merge_update_delete_insert(spark, nation_table):
    from duckdb_iceberg_spark.sources.sql import execute_sql

    _register(spark, nation_table, "nat_mrg")
    spark.createDataFrame(
        [(0, "ZERO-NATION", 0), (98, "NEW-NATION", 1), (3, None, -1)],
        "n_nationkey long, new_name string, flag int",
    ).createOrReplaceTempView("nat_src")
    execute_sql(spark, """
        MERGE INTO nat_mrg t USING nat_src s
        ON t.n_nationkey = s.n_nationkey
        WHEN MATCHED THEN UPDATE SET n_name = coalesce(s.new_name, t.n_name),
                                     n_regionkey = t.n_regionkey + 100
        WHEN NOT MATCHED THEN INSERT (n_nationkey, n_name, n_regionkey)
            VALUES (s.n_nationkey, s.new_name, cast(9 as long))
    """)
    got = {r.n_nationkey: (r.n_name, r.n_regionkey)
           for r in spark.sql("SELECT * FROM nat_mrg").collect()}
    assert len(got) == 26
    assert got[0][0] == "ZERO-NATION" and got[0][1] >= 100
    assert got[3][1] >= 100 and got[3][0] is not None  # null new_name keeps old
    assert got[98] == ("NEW-NATION", 9)


def test_sql_merge_delete_clause(spark, nation_table):
    from duckdb_iceberg_spark.sources.sql import execute_sql

    _register(spark, nation_table, "nat_mrgdel")
    execute_sql(spark, """
        MERGE INTO nat_mrgdel t
        USING (SELECT n_nationkey FROM nat_mrgdel WHERE n_regionkey = 1) s
        ON t.n_nationkey = s.n_nationkey
        WHEN MATCHED THEN DELETE
    """)
    assert spark.sql("SELECT count(*) c FROM nat_mrgdel").first().c == 20
    assert spark.sql(
        "SELECT count(*) c FROM nat_mrgdel WHERE n_regionkey = 1").first().c == 0


def test_sql_insert_into(spark, nation_table):
    from duckdb_iceberg_spark.sources.sql import execute_sql

    _register(spark, nation_table, "nat_ins")
    execute_sql(spark, "INSERT INTO nat_ins SELECT n_nationkey + 100, "
                       "n_name, n_regionkey FROM nat_ins")
    assert spark.sql("SELECT count(*) c FROM nat_ins").first().c == 50


def test_live_view_sees_external_commit(spark, nation_table):
    """A SELECT routed through execute_sql sees commits made through the
    Python API after registration (query-time snapshot resolution)."""
    from duckdb_iceberg_spark.sources.dml import delete_from
    from duckdb_iceberg_spark.sources.sql import execute_sql

    _register(spark, nation_table, "nat_live")
    before = execute_sql(spark, "SELECT count(*) AS c FROM nat_live").first().c
    delete_from(spark, nation_table, "n_regionkey = 4")
    after = execute_sql(spark, "SELECT count(*) AS c FROM nat_live").first().c
    assert (before, after) == (25, 20)


def test_sql_passthrough(spark):
    from duckdb_iceberg_spark.sources.sql import execute_sql

    assert execute_sql(spark, "SELECT 1 AS one").first().one == 1


def test_sql_merge_cardinality_still_raises(spark, nation_table):
    from duckdb_iceberg_spark.sources.dml import MergeCardinalityError
    from duckdb_iceberg_spark.sources.sql import execute_sql

    _register(spark, nation_table, "nat_card")
    spark.createDataFrame(
        [(1, "A"), (1, "B")], "n_nationkey long, nm string"
    ).createOrReplaceTempView("dup_src")
    with pytest.raises(MergeCardinalityError):
        execute_sql(spark, """
            MERGE INTO nat_card t USING dup_src s ON t.n_nationkey = s.n_nationkey
            WHEN MATCHED THEN UPDATE SET n_name = s.nm
        """)


def test_sql_delete_merge_passthrough_unregistered(spark):
    """DELETE/MERGE against relations NOT in the registry must fall through
    to spark.sql (like UPDATE/INSERT do), not raise from _location_of."""
    from duckdb_iceberg_spark.sources.sql import execute_sql

    spark.sql("DROP TABLE IF EXISTS plain_sql_tbl")
    spark.sql("CREATE TABLE plain_sql_tbl (k INT, v STRING) USING parquet")
    try:
        spark.sql("INSERT INTO plain_sql_tbl VALUES (1, 'a'), (2, 'b')")
        # plain parquet tables don't support DELETE in Spark; the point is
        # the router hands the statement to spark.sql (whose error mentions
        # the operation), instead of ValueError('not a registered view')
        import pyspark.sql.utils as _u
        try:
            execute_sql(spark, "DELETE FROM plain_sql_tbl WHERE k = 1")
        except Exception as e:
            assert "registered Iceberg view" not in str(e)
    finally:
        spark.sql("DROP TABLE IF EXISTS plain_sql_tbl")


def test_sql_doubled_quote_escape(spark, nation_table):
    """'it''s' inside a WHERE must not swallow following keywords."""
    from duckdb_iceberg_spark.sources.sql import _scan_top, _split_top_commas

    s = "x = 'it''s' AND y = 2 WHERE z = 3"
    hits = _scan_top(s, ("WHERE",))
    assert len(hits) == 1 and s[hits[0][0]:hits[0][0] + 5] == "WHERE"
    parts = _split_top_commas("a = 'x''y, z', b = 2")
    assert parts == ["a = 'x''y, z'", "b = 2"]


def test_sql_alter_table_surface(spark, sf_dir, tmp_path):
    """ALTER TABLE routes to the ddl module: property SET/RESET (incl. the
    'format-version'=3 upgrade, reference
    test_upgrade_format_version_2_to_3.test syntax), ADD/DROP/RENAME
    COLUMN, type widening, NOT NULL toggles."""
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.sources.sql import execute_sql

    loc = os.path.join(str(tmp_path), "alter_sql")
    write_iceberg(load(spark, sf_dir, "region"), loc, format_version=2)
    _register(spark, loc, "reg_alter")

    res = execute_sql(spark, "ALTER TABLE reg_alter SET ('commit.retry.num-retries'='7')")
    assert res.first().operation == "ALTER SET"
    assert load_table_metadata(loc).properties["commit.retry.num-retries"] == "7"
    execute_sql(spark, "ALTER TABLE reg_alter RESET ('commit.retry.num-retries')")
    assert "commit.retry.num-retries" not in load_table_metadata(loc).properties

    # format upgrade through SQL (the reference's upgrade-test syntax)
    execute_sql(spark, "ALTER TABLE reg_alter SET ('format-version'=3)")
    assert load_table_metadata(loc).format_version == 3
    with pytest.raises(ValueError, match="downgrade"):
        execute_sql(spark, "ALTER TABLE reg_alter SET ('format-version'=2)")

    execute_sql(spark, "ALTER TABLE reg_alter ADD COLUMN r_score INT")
    execute_sql(spark, "ALTER TABLE reg_alter ALTER COLUMN r_score SET DATA TYPE BIGINT")
    execute_sql(spark, "ALTER TABLE reg_alter RENAME COLUMN r_score TO score")
    tm = load_table_metadata(loc)
    fields = {f["name"]: f for f in tm.schema_json()["fields"]}
    assert fields["score"]["type"] == "long"
    # live view exposes the evolved schema
    assert "score" in spark.sql("SELECT * FROM reg_alter").columns

    execute_sql(spark, "ALTER TABLE reg_alter ALTER COLUMN r_name SET NOT NULL")
    assert load_table_metadata(loc).schema_json()
    execute_sql(spark, "ALTER TABLE reg_alter DROP COLUMN score")
    assert "score" not in spark.sql("SELECT * FROM reg_alter").columns

    with pytest.raises(ValueError, match="unsupported ALTER"):
        execute_sql(spark, "ALTER TABLE reg_alter FROBNICATE")


def test_sql_time_travel_as_of(spark, sf_dir, tmp_path):
    """SELECT ... FROM view VERSION AS OF <id|'tag'> / TIMESTAMP AS OF '<ts>'
    resolve against the registered table's snapshot history."""
    import datetime as dt

    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.sources.ddl import create_tag
    from duckdb_iceberg_spark.sources.sql import execute_sql

    loc = os.path.join(str(tmp_path), "tt")
    reg = load(spark, sf_dir, "region")
    tm1 = write_iceberg(reg, loc)
    snap1 = tm1.current_snapshot_id
    create_tag(loc, "five-rows")
    write_iceberg(reg, loc)  # second append: 10 rows at head
    _register(spark, loc, "reg_tt")

    assert execute_sql(spark, "SELECT count(*) c FROM reg_tt").first().c == 10
    assert execute_sql(
        spark, f"SELECT count(*) c FROM reg_tt VERSION AS OF {snap1}"
    ).first().c == 5
    assert execute_sql(
        spark, "SELECT count(*) c FROM reg_tt VERSION AS OF 'five-rows'"
    ).first().c == 5
    ts1 = load_table_metadata(loc).snapshot_by_id(snap1).timestamp_ms
    ts = dt.datetime.fromtimestamp(ts1 / 1000, tz=dt.timezone.utc)
    assert execute_sql(
        spark,
        "SELECT count(*) c FROM reg_tt FOR TIMESTAMP AS OF "
        f"'{ts.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
    ).first().c == 5
    # joinable with the live view in one statement
    row = execute_sql(
        spark,
        f"SELECT count(*) c FROM reg_tt a JOIN (SELECT * FROM reg_tt "
        f"VERSION AS OF {snap1}) b ON a.r_regionkey = b.r_regionkey"
    ).first()
    assert row.c == 10  # 2 head rows per key x 5 pinned keys


def test_insert_into_supplied_columns(spark, tmp_path):
    """INSERT INTO t(b, a) VALUES ... reorders to the named targets and
    fills unnamed columns with their write-default / NULL (reference:
    test_insert_into_supplied_columns.test + insert defaults)."""
    import pytest as _pytest

    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.sources.ddl import add_column
    from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

    loc = str(tmp_path / "t")
    write_iceberg(spark.createDataFrame(
        [], "a string, b boolean, c int"), loc)
    add_column(loc, "d", "int", default=9)
    register_table(spark, "sup_t", loc)

    execute_sql(spark, "INSERT INTO sup_t (b, a) VALUES (true, 'test')")
    execute_sql(spark, "INSERT INTO sup_t (a, c) VALUES ('x', 42)")
    rows = sorted(((r.a, r.b, r.c, r.d) for r in
                   spark.sql("SELECT * FROM sup_t").collect()))
    assert rows == [("test", True, None, 9), ("x", None, 42, 9)]

    with _pytest.raises(ValueError, match="not in table schema"):
        execute_sql(spark, "INSERT INTO sup_t (nope) VALUES (1)")
    with _pytest.raises(ValueError, match="column list"):
        execute_sql(spark, "INSERT INTO sup_t (a, b) VALUES ('y')")


def test_update_set_default(spark, tmp_path):
    """UPDATE ... SET col = DEFAULT resolves the column's write-default
    (reference: update/update_with_default.test)."""
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.sources.ddl import add_column
    from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

    loc = str(tmp_path / "t")
    write_iceberg(spark.createDataFrame([(1,), (2,)], "id int"), loc)
    add_column(loc, "balance", "int", default=0)
    register_table(spark, "upd_def", loc)
    execute_sql(spark, "UPDATE upd_def SET balance = 100")
    execute_sql(spark, "UPDATE upd_def SET balance = DEFAULT WHERE id = 1")
    rows = {r.id: r.balance
            for r in spark.sql("SELECT * FROM upd_def").collect()}
    assert rows == {1: 0, 2: 100}


def test_dml_results_report_affected_rows(spark, tmp_path):
    """The result DataFrame's `rows` column carries affected counts —
    the reference's DML statements return them (delete_join.test: 500;
    test_insert_count.test)."""
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

    loc = os.path.join(str(tmp_path), "counts")
    write_iceberg(spark.range(100).selectExpr("CAST(id AS INT) AS id",
                                              "concat('v', id) AS v"), loc)
    register_table(spark, "cnt_t", loc)

    r = execute_sql(spark, "INSERT INTO cnt_t SELECT CAST(id AS INT), "
                           "concat('n', id) FROM range(100, 120)").first()
    assert r.rows == 20
    # merge-on-read delete: counted from the delete files
    execute_sql(spark, "ALTER TABLE cnt_t SET "
                       "('write.delete.mode'='merge-on-read')")
    r = execute_sql(spark, "DELETE FROM cnt_t WHERE id % 2 = 0").first()
    assert r.rows == 60  # 120 rows, half even
    # copy-on-write after MoR deletes: the physical delta would count
    # MoR-dead rows — rows is honestly NULL on such chains
    execute_sql(spark, "ALTER TABLE cnt_t RESET ('write.delete.mode')")
    r = execute_sql(spark, "DELETE FROM cnt_t WHERE id < 10").first()
    assert r.rows is None


def test_cow_delete_reports_rows_on_clean_chain(spark, tmp_path):
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

    loc = os.path.join(str(tmp_path), "cow_counts")
    write_iceberg(spark.range(50).selectExpr("CAST(id AS INT) AS id"), loc)
    register_table(spark, "cowc_t", loc)
    r = execute_sql(spark, "DELETE FROM cowc_t WHERE id < 10").first()
    assert r.rows == 10


def test_sql_update_from_join(spark, tmp_path):
    """UPDATE ... FROM <src> WHERE <join cond> (reference:
    update/update_join_duplicates.test): joined updates apply to matched
    target rows only, and a target row matched by MULTIPLE source rows
    raises the cardinality violation the reference reports as 'The same
    row was updated multiple times'."""
    import pytest as _pytest

    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

    loc = str(tmp_path / "upd_from")
    write_iceberg(spark.sql("SELECT id FROM range(10)"), loc)
    register_table(spark, "upd_from_t", loc)
    spark.sql("SELECT id * 2 AS update_id FROM range(5)") \
        .createOrReplaceTempView("updated_rows")

    execute_sql(
        spark,
        "UPDATE upd_from_t SET id = id + 1000 FROM updated_rows "
        "WHERE id = updated_rows.update_id")
    got = sorted(r.id for r in spark.sql("SELECT id FROM upd_from_t").collect())
    assert got == [1, 3, 5, 7, 9, 1000, 1002, 1004, 1006, 1008]

    # duplicate source matches -> cardinality violation, nothing committed
    spark.sql("SELECT update_id FROM (SELECT 1001 AS update_id) "
              "UNION ALL SELECT 1001").createOrReplaceTempView("dups")
    with _pytest.raises(Exception, match="(?i)multiple|cardinality"):
        execute_sql(
            spark,
            "UPDATE upd_from_t SET id = id + 1 FROM dups "
            "WHERE id = dups.update_id - 1")
    still = sorted(r.id for r in spark.sql("SELECT id FROM upd_from_t").collect())
    assert still == got  # failed joined update committed nothing


def test_sql_dml_dotted_source_last_segment_qualifier(spark, tmp_path):
    """A dotted source relation (FROM/USING db.tbl) may be referenced in
    conditions by its LAST segment alone, as Spark SQL permits — both
    `global_temp.s.c` and `s.c` must resolve. Covers UPDATE ... FROM,
    DELETE ... USING, and MERGE sources."""
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

    loc = str(tmp_path / "dotted_src")
    write_iceberg(spark.sql("SELECT id FROM range(10)"), loc)
    register_table(spark, "dotted_t", loc)
    spark.sql("SELECT id * 2 AS mid FROM range(3)") \
        .createOrReplaceGlobalTempView("dotted_src_v")
    try:
        execute_sql(
            spark,
            "UPDATE dotted_t SET id = id + 100 FROM global_temp.dotted_src_v "
            "WHERE id = dotted_src_v.mid")
        got = sorted(r.id for r in spark.sql("SELECT id FROM dotted_t").collect())
        assert got == [1, 3, 5, 6, 7, 8, 9, 100, 102, 104]

        execute_sql(
            spark,
            "DELETE FROM dotted_t USING global_temp.dotted_src_v "
            "WHERE id = dotted_src_v.mid + 100")
        got = sorted(r.id for r in spark.sql("SELECT id FROM dotted_t").collect())
        assert got == [1, 3, 5, 6, 7, 8, 9]

        execute_sql(
            spark,
            "MERGE INTO dotted_t USING global_temp.dotted_src_v "
            "ON dotted_t.id = dotted_src_v.mid "
            "WHEN MATCHED THEN DELETE "
            "WHEN NOT MATCHED THEN INSERT (id) VALUES (dotted_src_v.mid + 50)")
        got = sorted(r.id for r in spark.sql("SELECT id FROM dotted_t").collect())
        assert got == [1, 3, 5, 6, 7, 8, 9, 50, 52, 54]
    finally:
        spark.catalog.dropGlobalTempView("dotted_src_v")


def test_sql_dml_dotted_source_segment_collision_with_target_column(
        spark, tmp_path):
    """When the dotted source's LAST segment matches a target COLUMN name,
    the segment must NOT become a source qualifier: Spark resolves a bare
    ``items.qty`` column-first, so a target struct column named ``items``
    keeps winning and only the full dotted name addresses the source."""
    from duckdb_iceberg_spark import iceberg_scan, write_iceberg
    from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

    loc = str(tmp_path / "seg_collide")
    write_iceberg(spark.sql(
        "SELECT id, named_struct('qty', CAST(id*10 AS INT)) AS items "
        "FROM range(4)"), loc)
    register_table(spark, "collide_t", loc)
    spark.sql("SELECT id AS sid, 1000 AS qty FROM range(2)") \
        .createOrReplaceGlobalTempView("items")
    try:
        # items.qty here MUST mean the TARGET's struct member (10*id),
        # never the source's qty column (1000)
        execute_sql(
            spark,
            "UPDATE collide_t SET id = id + items.qty "
            "FROM global_temp.items WHERE id = global_temp.items.sid")
        got = sorted(r.id for r in
                     spark.sql("SELECT id FROM collide_t").collect())
        assert got == [0, 2, 3, 11]  # 0+0, 1+10; 2,3 unmatched
    finally:
        spark.catalog.dropGlobalTempView("items")


def test_rewrite_unprefixed_idents_pure():
    """Textual identifier rewrite behind prefixed-view registration:
    bare and backquoted table references rewrite; dot-qualified
    references, string literals (single- and double-quoted), and longer
    identifiers sharing a prefix do not; longest base name wins."""
    from duckdb_iceberg_spark.sources.sql import _rewrite_unprefixed_idents

    rw = lambda s: _rewrite_unprefixed_idents(s, ["nation", "nation_ext"], "p_")
    assert rw("SELECT n_name FROM nation") == "SELECT n_name FROM `p_nation`"
    assert rw("FROM `nation` JOIN nation_ext") == \
        "FROM `p_nation` JOIN `p_nation_ext`"
    # alias-qualified column refs keep their qualifier untouched
    assert rw("SELECT a.nation FROM t a") == "SELECT a.nation FROM t a"
    # string literals never rewrite
    assert rw("SELECT * FROM nation WHERE x = 'nation'") == \
        "SELECT * FROM `p_nation` WHERE x = 'nation'"
    assert rw('SELECT "nation" FROM nation') == \
        'SELECT "nation" FROM `p_nation`'
    # identifiers that merely contain a base name are untouched
    assert rw("SELECT * FROM nations") == "SELECT * FROM nations"
    assert rw("SELECT my_nation FROM t") == "SELECT my_nation FROM t"


def test_call_procedures_surface(spark, sf_dir, tmp_path):
    """r12 CALL surface: maintenance/import procedures run from SQL
    against a registered view or a bare path and return a one-row
    summary; the view refreshes to the post-procedure snapshot."""
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.sources.dml import delete_from
    from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

    from .conftest import load

    src = load(spark, sf_dir, "nation")
    loc = str(tmp_path / "t_call")
    write_iceberg(src, loc)
    for pred in ("n_nationkey < 3", "n_nationkey >= 22"):
        delete_from(spark, loc, pred, mode="merge-on-read")
    register_table(spark, "call_nation", loc)

    out = execute_sql(
        spark, "CALL system.rewrite_position_delete_files("
               "table => 'call_nation')").first()
    assert int(out.rewritten_delete_files_count) >= 2
    got = spark.sql("SELECT count(*) AS n FROM call_nation").first().n
    assert got == src.filter(
        "n_nationkey >= 3 AND n_nationkey < 22").count()

    out = execute_sql(
        spark, "CALL rewrite_data_files('call_nation', "
               "rewrite_all => true)").first()
    assert int(out.added_data_files_count) >= 1
    assert spark.sql("SELECT count(*) FROM call_nation").first()[0] == got

    # add_files against a bare path target
    plain = str(tmp_path / "plain")
    old = spark.conf.get("spark.sql.parquet.fieldId.write.enabled")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    try:
        src.limit(5).coalesce(1).write.mode("overwrite").parquet(plain)
    finally:
        spark.conf.set("spark.sql.parquet.fieldId.write.enabled", old)
    import os

    f = sorted(os.path.join(plain, x) for x in os.listdir(plain)
               if x.endswith(".parquet"))[0]
    loc2 = str(tmp_path / "t_imported_sql")
    out = execute_sql(
        spark, f"CALL add_files('{loc2}', source => '{f}')").first()
    assert int(out.added_files_count) == 1

    import pytest as _pt

    with _pt.raises(ValueError, match="unknown procedure"):
        execute_sql(spark, "CALL no_such_proc('x')")


def test_alter_branch_tag_ddl(spark, sf_dir, tmp_path):
    """r12 branching DDL: CREATE/DROP BRANCH/TAG via ALTER TABLE, composed
    with the CALL fast_forward publish step."""
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

    from .conftest import load

    src = load(spark, sf_dir, "region")
    loc = str(tmp_path / "t_refddl")
    write_iceberg(src, loc)
    register_table(spark, "refddl", loc)

    execute_sql(spark, "ALTER TABLE refddl CREATE BRANCH audit")
    execute_sql(spark, "ALTER TABLE refddl CREATE TAG v1")
    tm = load_table_metadata(loc)
    assert tm.refs["audit"]["type"] == "branch"
    assert tm.refs["v1"]["type"] == "tag"

    write_iceberg(src.limit(2), loc, branch="audit")
    out = execute_sql(
        spark, "CALL fast_forward('refddl', 'main', 'audit')").first()
    assert int(out.current_snapshot_id) == \
        load_table_metadata(loc).refs["audit"]["snapshot-id"]
    assert spark.sql("SELECT count(*) FROM refddl").first()[0] == \
        src.count() + 2

    # ADVICE r12: DROP BRANCH on a tag (or vice versa) is an error, not a
    # silent cross-kind drop
    with pytest.raises(ValueError, match="is a tag, not a branch"):
        execute_sql(spark, "ALTER TABLE refddl DROP BRANCH v1")
    assert "v1" in load_table_metadata(loc).refs

    execute_sql(spark, "ALTER TABLE refddl DROP TAG v1")
    assert "v1" not in load_table_metadata(loc).refs
    execute_sql(spark, "ALTER TABLE refddl DROP TAG IF EXISTS v1")  # no-op
    # ADVICE r12: IF EXISTS read from the regex group — multi-space
    # "IF  EXISTS" must still swallow the missing-ref error
    execute_sql(spark, "ALTER TABLE refddl DROP TAG IF   EXISTS v1")
    with pytest.raises(KeyError):
        execute_sql(spark, "ALTER TABLE refddl DROP BRANCH nosuch")


def test_create_changelog_view_procedure(spark, sf_dir, tmp_path):
    """r13: CALL create_changelog_view registers the row-level CDC
    between snapshots as a queryable temp view (the Spark procedure)."""
    from duckdb_iceberg_spark import write_iceberg
    from duckdb_iceberg_spark.metadata.table_metadata import load_table_metadata
    from duckdb_iceberg_spark.sources.dml import delete_from
    from duckdb_iceberg_spark.sources.sql import execute_sql, register_table

    loc = os.path.join(str(tmp_path), "chlog")
    write_iceberg(load(spark, sf_dir, "nation"), loc)
    snap1 = load_table_metadata(loc).current_snapshot().snapshot_id
    write_iceberg(
        spark.createDataFrame([(90, "NEW-A", 1), (91, "NEW-B", 2)],
                              "n_nationkey long, n_name string, "
                              "n_regionkey long"), loc)
    delete_from(spark, loc, "n_regionkey = 0", mode="merge-on-read")
    register_table(spark, "chlogtab", loc)

    row = execute_sql(spark, f"CALL create_changelog_view("
                             f"table => 'chlogtab', "
                             f"changelog_view => 'chlog_v', "
                             f"start_snapshot_id => {snap1})").first()
    assert row.changelog_view == "chlog_v"
    got = {(r._change_type, r._change_ordinal): r.cnt for r in spark.sql(
        "SELECT _change_type, _change_ordinal, count(*) cnt FROM chlog_v "
        "GROUP BY 1, 2").collect()}
    assert got[("insert", 0)] == 2
    assert got[("delete", 1)] == 5  # 5 nations in region 0
