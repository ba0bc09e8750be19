"""Industry pipeline golden tests over the FIXTURES.md §5 edge cases:
money-string cleaning, zero-fill, div-by-zero guards, strict CASE
boundaries, fte defaults."""

import math

import pytest
from pyspark.sql import functions as F

FROZEN = "2024-06-01T12:00:00"


def _rows(df, key):
    return {r[key]: r.asDict() for r in df.collect()}


@pytest.fixture(scope="module")
def corporate_fct(spark):
    from city_payroll_data_pipeline_spark.plans.corporate import (
        fct_corporate,
        stg_corporate,
    )
    from city_payroll_data_pipeline_spark.schemas import (
        CORPORATE_RAW_COLUMNS,
        all_string_schema,
    )

    rows = [
        # id, year, dept, title, type, base, overtime, bonus, benefit
        ("1", "2013", "Police", "Officer", "FT", "$85,432.10", "$12,001.50", "$1,250.00", "$19,876.22"),
        ("2", "2013", "Fire", "Captain", "FT", "$100,000.00", "$25,000.00", None, None),  # exactly 25% OT
        ("3", "2013", "Fire", "Chief", "FT", "$0.00", "$0.00", "$500.00", ""),  # zero base pay
        ("4", "2013", "Lib", "Clerk", "PT", "$1,234.56", None, None, None),  # nulls → 0.0
        ("5", "2013", "Lib", "Aide", "PT", "bogus", "$1.00", None, None),  # malformed money
    ]
    raw = spark.createDataFrame(rows, schema=all_string_schema(CORPORATE_RAW_COLUMNS))
    return _rows(fct_corporate(stg_corporate(raw, processed_at=FROZEN)), "row_id")


def test_corporate_money_clean(corporate_fct):
    r = corporate_fct["1"]
    assert r["base_pay"] == 85432.10
    assert r["total_amount"] == pytest.approx(85432.10 + 12001.50 + 1250.00 + 19876.22)
    assert r["overtime_status"] == "Regular Overtime"  # 12001.5 < 0.25*85432.1


def test_corporate_overtime_boundary_strict(corporate_fct):
    # overtime == 0.25*base exactly → strict '>' keeps it Regular
    assert corporate_fct["2"]["overtime_status"] == "Regular Overtime"
    # null bonus/benefit zero-filled
    assert corporate_fct["2"]["total_amount"] == 125000.0


def test_corporate_div_by_zero_guard(corporate_fct):
    r = corporate_fct["3"]
    assert r["loyalty_bonus_percentage"] is None  # NULLIF(base_pay,0)
    assert r["overtime_status"] == "No Overtime"


def test_corporate_zero_fill(corporate_fct):
    r = corporate_fct["4"]
    assert r["total_amount"] == 1234.56
    assert r["loyalty_bonus_percentage"] == 0.0


def test_corporate_malformed_money_nulls(corporate_fct):
    # 'bogus' base pay → NULL (try_cast), not a job-killing error
    r = corporate_fct["5"]
    assert r["base_pay"] is None
    assert r["total_amount"] is None  # NULL + ... propagates
    assert r["overtime_status"] == "Regular Overtime"  # 1.0 > NULL is false; 1.0 > 0 true


@pytest.fixture(scope="module")
def education_fct(spark):
    from city_payroll_data_pipeline_spark.plans.education import (
        fct_education,
        stg_education,
    )
    from city_payroll_data_pipeline_spark.schemas import (
        EDUCATION_RAW_COLUMNS,
        all_string_schema,
    )

    rows = [
        # last, first, district, school, job, fte, exp, cert, salary
        ("Smith", "Ana", "Newark", "Lincoln", "Math Teacher", "1.0", "17", "Std", "64250"),
        ("Lee", "Bo", "Newark", "Lincoln", "Sci Teacher", None, "15", "Std", "50000"),  # fte null → 1.0; exp == 15 strict
        ("Kim", "Cy", "Trenton", "Adams", "Art Teacher", "0.99", "0", "Std", "40000"),  # fte < 1; exp 0
        ("Day", "Di", "Trenton", "Adams", "Sub Teacher", "0.5", None, "None", None),  # salary null → 0
    ]
    raw = spark.createDataFrame(rows, schema=all_string_schema(EDUCATION_RAW_COLUMNS))
    return _rows(fct_education(stg_education(raw, processed_at=FROZEN)), "job_title")


def test_education_seniority_bonus(education_fct):
    r = education_fct["Math Teacher"]
    assert r["seniority_bonus"] == pytest.approx(64250 * 0.05)
    assert r["total_amount"] == pytest.approx(64250 * 1.05)
    assert r["employment_status"] == "Full Time"


def test_education_exp15_boundary_strict(education_fct):
    r = education_fct["Sci Teacher"]
    assert r["seniority_bonus"] == 0.0  # strict > 15
    assert r["total_amount"] == 50000.0
    assert r["fte_ratio"] == 1.0  # null fte defaults full-time
    assert r["employment_status"] == "Full Time"


def test_education_part_time_and_div_guard(education_fct):
    r = education_fct["Art Teacher"]
    assert r["employment_status"] == "Part Time / Adjunct"  # 0.99 < 1.0
    assert r["cost_per_experience_year"] is None  # NULLIF(exp,0)


def test_education_salary_default(education_fct):
    assert education_fct["Sub Teacher"]["base_salary"] == 0.0
    assert education_fct["Sub Teacher"]["total_amount"] == 0.0


@pytest.fixture(scope="module")
def hospital_fct(spark, tmp_path_factory):
    """Hospital goes through the CSV reader to exercise messy-header
    normalization (normalize_names=True parity)."""
    import csv

    from city_payroll_data_pipeline_spark.plans.hospital import (
        fct_hospital,
        stg_hospital,
    )
    from city_payroll_data_pipeline_spark.schemas import HOSPITAL_RAW_COLUMNS
    from city_payroll_data_pipeline_spark.sources.readers import read_csv_all_string

    path = str(tmp_path_factory.mktemp("hosp") / "hospital_data.csv")
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HOSPITAL_RAW_COLUMNS)  # incl. ' Total Discharges ' etc.
        w.writerow(["Cedars-Sinai", "Los Angeles", "CA", "470 - JOINT", "142", "14255.76", "12998.10"])
        w.writerow(["St. Mary", "Fresno", "CA", "291 - CARDIAC", "abc", "1000.50", ""])
    raw = read_csv_all_string(spark, path, normalize_names=True)
    assert set(raw.columns) == {
        "provider_name", "provider_city", "provider_state", "drg_definition",
        "total_discharges", "average_total_payments", "average_medicare_payments",
    }
    return _rows(fct_hospital(stg_hospital(raw, processed_at=FROZEN)), "hospital_name")


def test_hospital_contract_and_amount(hospital_fct):
    r = hospital_fct["Cedars-Sinai"]
    assert r["job_title"] == "470 - JOINT"  # service_description AS job_title
    assert r["total_patients"] == 142
    assert r["total_amount"] == pytest.approx(142 * 14255.76)


def test_hospital_malformed_int(hospital_fct):
    r = hospital_fct["St. Mary"]
    assert r["total_patients"] is None
    assert r["total_amount"] is None


def test_fact_contract_validation(spark):
    from city_payroll_data_pipeline_spark.schemas import (
        ContractViolation,
        validate_fact_contract,
    )

    good = spark.createDataFrame(
        [("a", 1.0)], schema="job_title string, total_amount double"
    )
    validate_fact_contract(good)
    bad = spark.createDataFrame([("a",)], schema="job_title string")
    with pytest.raises(ContractViolation):
        validate_fact_contract(bad)


def test_normalize_name_rules():
    from city_payroll_data_pipeline_spark.schemas import normalize_name

    assert normalize_name(" Total Discharges ") == "total_discharges"
    assert normalize_name("DRG Definition") == "drg_definition"
    assert normalize_name("REGION-KEY") == "region_key"
    assert normalize_name("Provider Name") == "provider_name"
    assert normalize_name("123abc") == "_123abc"


def test_normalize_columns_never_emits_duplicates(spark):
    """A collision-renamed column must be re-checked against names
    already taken: headers like [a_1, a, a] used to produce a second
    'a_1', making every later by-name reference ambiguous."""
    from city_payroll_data_pipeline_spark.schemas import normalize_columns

    df = spark.createDataFrame([(1, 2, 3, 4)], ["A 1", "a", "A", "a_1"])
    cols = normalize_columns(df).columns
    assert len(cols) == len(set(cols)), cols
    assert cols[0] == "a_1" and cols[1] == "a"  # common-case names kept


def test_jsonl_roundtrip_documents(spark, tmp_path):
    """documents → compressed JSONL shards → explicit-schema read
    returns identical rows (the corpus interchange contract)."""
    from city_payroll_data_pipeline_spark.sources.readers import read_jsonl
    from city_payroll_data_pipeline_spark.sources.sinks import write_jsonl
    from city_payroll_data_pipeline_spark.suite import table
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, partition_by=["lang"])
    back = read_jsonl(
        spark, out,
        schema="doc_id long, text string, source string, n_chars long, lang string",
    )
    a = sorted(tuple(r) for r in docs.select(*sorted(docs.columns)).collect())
    b = sorted(tuple(r) for r in back.select(*sorted(docs.columns)).collect())
    assert a == b


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """documents → ORC → read back identical; a filtered projection
    reaches the ORC scan as pushed filters + pruned schema."""
    from city_payroll_data_pipeline_spark.sources.readers import read_orc
    from city_payroll_data_pipeline_spark.sources.sinks import write_orc
    from city_payroll_data_pipeline_spark.suite import table
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "docs_orc")
    write_orc(docs, out, partition_by=["lang"])
    back = read_orc(spark, out)
    a = sorted(tuple(r) for r in docs.select(*sorted(docs.columns)).collect())
    b = sorted(tuple(r) for r in back.select(*sorted(docs.columns)).collect())
    assert a == b
    plan = (
        back.filter(F.col("doc_id") > 100)
        .select("doc_id", "source")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)]" in plan
    assert "struct<doc_id:bigint,source:string>" in plan.replace(" ", "")


def test_versioned_merge_upsert_and_time_travel(spark, tmp_path):
    """MERGE replaces matched keys, inserts new ones, keeps the rest;
    old versions stay readable (time travel); delete_where commits a
    row-removal version."""
    from pyspark.sql import functions as F

    from city_payroll_data_pipeline_spark.operators import upsert as U

    root = str(tmp_path / "docs_table")
    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "id long, text string, rev int"
    )
    assert U.write_version(base, root) == 1

    updates = spark.createDataFrame(
        [(2, "b2", 2), (4, "d", 2)], "id long, text string, rev int"
    )
    assert U.merge_upsert(spark, root, updates, key="id") == 2

    live = {(r["id"], r["text"]) for r in U.read_table(spark, root).collect()}
    assert live == {(1, "a"), (2, "b2"), (3, "c"), (4, "d")}
    v1 = {(r["id"], r["text"]) for r in U.read_table(spark, root, 1).collect()}
    assert v1 == {(1, "a"), (2, "b"), (3, "c")}

    assert U.delete_where(spark, root, F.col("id") == 1) == 3
    assert {r["id"] for r in U.read_table(spark, root).collect()} == {2, 3, 4}

    # first write through merge path on an empty table
    root2 = str(tmp_path / "fresh")
    assert U.merge_upsert(spark, root2, base, key="id") == 1
    assert U.read_table(spark, root2).count() == 3


def test_vacuum_keeps_live_and_recent_versions(spark, tmp_path):
    from city_payroll_data_pipeline_spark.operators import upsert as U

    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id long, text string")
    for _ in range(4):
        U.write_version(df, root)
    assert U.current_version(root) == 4
    removed = U.vacuum(root, keep_last=2)
    assert removed == [1, 2]
    assert U.read_table(spark, root).count() == 1       # live intact
    assert U.read_table(spark, root, 3).count() == 1    # kept
    import pytest as _pytest
    with _pytest.raises(Exception):
        U.read_table(spark, root, 1).count()            # vacuumed


def test_observed_metrics_come_with_the_action(spark, tmp_path):
    """Observation metrics materialize from the SAME job as the write —
    counts/null-counts with zero extra scans."""
    from pyspark.sql import functions as F

    from city_payroll_data_pipeline_spark.operators.quality import observed
    from city_payroll_data_pipeline_spark.suite import table
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents")
    out, obs = observed(
        docs,
        "ingest",
        {
            "rows": F.count(F.lit(1)),
            "null_text": F.count_if(F.col("text").isNull()),
            "total_chars": F.sum("n_chars"),
        },
    )
    out.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["rows"] == docs.count()
    assert got["null_text"] == 0
    assert got["total_chars"] == docs.agg(F.sum("n_chars")).first()[0]


def test_merge_schema_evolution_opt_in(spark, tmp_path):
    """An update batch with a NEW column only merges when schema
    evolution is explicitly enabled; old rows read NULL for it."""
    import pytest

    from city_payroll_data_pipeline_spark.operators import upsert as U

    root = str(tmp_path / "t")
    U.write_version(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, text string"), root
    )
    upd = spark.createDataFrame(
        [(2, "b2", "en")], "id long, text string, lang string"
    )
    with pytest.raises(Exception):
        U.merge_upsert(spark, root, upd, key="id")
    U.merge_upsert(spark, root, upd, key="id", schema_evolution=True)
    rows = {r["id"]: (r["text"], r["lang"]) for r in U.read_table(spark, root).collect()}
    assert rows == {1: ("a", None), 2: ("b2", "en")}


def test_zorder_write_shrinks_per_file_ranges(spark, tmp_path):
    """Z-order clustering must leave each parquet file covering a
    small rectangle of (user_id, value) space — parquet footer min/max
    then prunes files for predicates on EITHER column. Baseline: a
    hash-repartitioned write, where every file spans ~the full range."""
    import glob

    import pyarrow.parquet as pq

    from city_payroll_data_pipeline_spark.sources.sinks import (
        write_zorder_parquet,
    )
    from city_payroll_data_pipeline_spark.suite import table
    from tests.conftest import SF_CORRECT

    ev = table(spark, SF_CORRECT, "events").select("user_id", "value")
    zpath, npath = str(tmp_path / "z"), str(tmp_path / "naive")
    write_zorder_parquet(ev, zpath, ["user_id", "value"], n_files=8)
    ev.repartition(8).write.parquet(npath)

    def avg_span(path, col_idx):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = min(md.row_group(i).column(col_idx).statistics.min
                     for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(col_idx).statistics.max
                     for i in range(md.num_row_groups))
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    for idx in (0, 1):  # user_id, value
        assert avg_span(zpath, idx) < 0.7 * avg_span(npath, idx), idx


def test_scd2_merge_lifecycle(spark):
    """Two merge batches over a tiny dimension: change, no-change,
    new-key, value->NULL (null-safe change), and re-change of an
    already-versioned key all produce the right interval chains."""
    from city_payroll_data_pipeline_spark.operators import scd

    t1, t2, t3 = (
        "2024-01-01 00:00:00",
        "2024-02-01 00:00:00",
        "2024-03-01 00:00:00",
    )
    snap = spark.createDataFrame(
        [(1, "A", 10), (2, "B", 20), (3, "C", None)],
        "k int, seg string, attr int",
    )
    hist = scd.scd2_init(snap, t1)

    upd2 = spark.createDataFrame(
        [(1, "A2", 10), (2, "B", 20), (3, "C", 7), (4, "D", 40)],
        "k int, seg string, attr int",
    )
    h2 = scd.scd2_merge(hist, upd2, "k", ["seg", "attr"], t2)
    rows = {(r["k"], str(r["valid_from"])): r.asDict() for r in h2.collect()}
    assert len(rows) == 6  # 3 originals + changed(1), null->7(3), new(4)
    assert rows[(1, "2024-01-01 00:00:00")]["is_current"] is False
    assert str(rows[(1, "2024-01-01 00:00:00")]["valid_to"]) == t2
    assert rows[(1, "2024-02-01 00:00:00")]["seg"] == "A2"
    assert rows[(2, "2024-01-01 00:00:00")]["is_current"] is True
    assert rows[(2, "2024-01-01 00:00:00")]["valid_to"] is None
    assert rows[(3, "2024-01-01 00:00:00")]["is_current"] is False  # NULL->7
    assert rows[(4, "2024-02-01 00:00:00")]["is_current"] is True

    # second merge: key 1 changes AGAIN; key 4 reverts nothing; key 2
    # drops attr to NULL (change); absent key 3 stays current untouched
    upd3 = spark.createDataFrame(
        [(1, "A3", 10), (2, "B", None), (4, "D", 40)],
        "k int, seg string, attr int",
    )
    h3 = scd.scd2_merge(h2, upd3, "k", ["seg", "attr"], t3)
    out = {(r["k"], str(r["valid_from"])): r.asDict() for r in h3.collect()}
    assert len(out) == 8
    chain1 = sorted(str(vf) for (k, vf) in out if k == 1)
    assert chain1 == [t1, t2, t3]
    assert out[(1, t3)]["is_current"] is True
    assert out[(2, t3)]["attr"] is None and out[(2, t3)]["is_current"] is True
    assert out[(3, t2)]["is_current"] is True  # absent from upd3 -> untouched
    # exactly one current row per key, intervals abut exactly
    cur = [k for (k, _), r in out.items() if r["is_current"]]
    assert sorted(cur) == [1, 2, 3, 4]


def test_scd2_as_of_lookup_boundaries(spark):
    """Interval semantics: ts exactly at valid_from hits the NEW
    version (half-open intervals), ts before any version gets NULLs on
    a left join, open-ended current rows match arbitrarily late ts."""
    from city_payroll_data_pipeline_spark.operators import scd

    hist = scd.scd2_init(
        spark.createDataFrame([(1, "OLD")], "k int, seg string"),
        "2024-01-01 00:00:00",
    )
    hist = scd.scd2_merge(
        hist,
        spark.createDataFrame([(1, "NEW")], "k int, seg string"),
        "k",
        ["seg"],
        "2024-02-01 00:00:00",
    )
    facts = spark.createDataFrame(
        [
            (1, 1, "2023-12-31 23:59:59"),  # before history -> NULL
            (2, 1, "2024-01-01 00:00:00"),  # exactly v1 open -> OLD
            (3, 1, "2024-01-31 23:59:59"),  # last second of v1 -> OLD
            (4, 1, "2024-02-01 00:00:00"),  # exactly boundary -> NEW
            (5, 1, "2030-01-01 00:00:00"),  # far future -> NEW (open)
            (6, 9, "2024-03-01 00:00:00"),  # unknown key -> NULL
        ],
        "fid int, k int, ts string",
    )
    out = {
        r["fid"]: r["seg"]
        for r in scd.as_of_lookup(
            facts, hist, key="k", fact_key="k", ts_col="ts"
        ).collect()
    }
    assert out == {1: None, 2: "OLD", 3: "OLD", 4: "NEW", 5: "NEW", 6: None}


def test_quarantine_routing(spark):
    """Pass rows keep an empty reason list; multi-violation rows list
    reasons in rule-declaration order; split sides partition the
    input exactly."""
    from city_payroll_data_pipeline_spark.operators.quality import quarantine

    df = spark.createDataFrame(
        [(1, 5, "x"), (2, -1, "x"), (3, -2, None), (4, 7, None)],
        "id int, qty int, tag string",
    )
    out = quarantine(
        df,
        {"qty_pos": F.col("qty") > 0, "tag_present": F.col("tag").isNotNull()},
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["quarantine_reasons"] == [] and not rows[1]["is_quarantined"]
    assert rows[2]["quarantine_reasons"] == ["qty_pos"]
    assert rows[3]["quarantine_reasons"] == ["qty_pos", "tag_present"]
    assert rows[4]["quarantine_reasons"] == ["tag_present"]
    good = out.filter(~F.col("is_quarantined")).count()
    bad = out.filter(F.col("is_quarantined")).count()
    assert (good, bad) == (1, 3)


def test_quality_gates_treat_null_as_violation(spark):
    """Three-valued-logic hole: a NULL predicate evaluation must count
    as a violation in check_rules AND route to quarantine — NULLs are
    the most common bad value a quality gate exists to catch, and a
    bare NOT(cond) makes them invisible to both operators."""
    from city_payroll_data_pipeline_spark.operators.quality import (
        check_rules,
        quarantine,
    )

    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, -1)], "id int, qty int"
    )
    rules = {"qty_pos": F.col("qty") > 0}
    checked = check_rules(df, rules).collect()[0]
    assert checked["n_violations"] == 2  # NULL and -1
    assert checked["pass_rate"] == pytest.approx(1 / 3, abs=1e-6)
    routed = {r["id"]: r for r in quarantine(df, rules).collect()}
    assert routed[2]["quarantine_reasons"] == ["qty_pos"]
    assert routed[2]["is_quarantined"]


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    """A delete removes only rows that provably match: rows where the
    predicate evaluates NULL (e.g. a NULL in the predicate column)
    must survive, not be silently destroyed alongside the target."""
    from city_payroll_data_pipeline_spark.operators import upsert as U

    root = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "a@b.com"), (2, None), (3, "c@d.com")], "id int, email string"
    )
    U.write_version(df, root)
    U.delete_where(spark, root, F.col("email") == "a@b.com")
    left = {r["id"] for r in U.read_table(spark, root).collect()}
    assert left == {2, 3}  # id=2 (NULL email) kept


def test_bucket_expr_null_in_null_out(spark):
    """width_bucket semantics: NULL values get a NULL bucket, not a
    silent assignment to the lowest bin."""
    from city_payroll_data_pipeline_spark.operators.binning import bucket_expr

    df = spark.createDataFrame(
        [(1.0,), (None,), (9.0,)], "v double"
    ).select("v", bucket_expr(F.col("v"), [2.0, 5.0]).alias("b"))
    out = {r["v"]: r["b"] for r in df.collect()}
    assert out == {1.0: 1, None: None, 9.0: 3}


def test_binary_file_ingest(spark, tmp_path):
    """binaryFile source: glob filter keeps non-matching files closed,
    max_bytes guard drops oversized blobs on the metadata column, and
    content round-trips byte-exact."""
    from city_payroll_data_pipeline_spark.sources.readers import read_binary_files

    d = tmp_path / "media"
    d.mkdir()
    (d / "a.png").write_bytes(b"\x89PNG-fake-a")
    (d / "b.png").write_bytes(b"\x89PNG-fake-bb")
    (d / "big.png").write_bytes(b"x" * 4096)
    (d / "notes.txt").write_bytes(b"not media")

    df = read_binary_files(spark, str(d), glob="*.png", max_bytes=1024)
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.png", "b.png"}
    assert bytes(rows["a.png"]["content"]) == b"\x89PNG-fake-a"
    assert rows["b.png"]["length"] == 12


def test_jsonl_corrupt_record_quarantine(spark, tmp_path):
    """One malformed line in a JSONL shard must neither kill the read
    nor vanish: it surfaces with NULL fields and the raw line in
    _corrupt_record, while good rows parse normally."""
    from city_payroll_data_pipeline_spark.sources.readers import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good row"}\n'
        '{"doc_id": 2, "text": "also good"}\n'
        '{"doc_id": 3, "text": "broken...\n'
    )
    df = read_jsonl(
        spark, str(p), schema="doc_id long, text string", keep_corrupt=True
    )
    good = df.filter("_corrupt_record IS NULL")
    bad = df.filter("_corrupt_record IS NOT NULL")
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert bad_rows[0]["doc_id"] is None
    assert bad_rows[0]["_corrupt_record"].startswith('{"doc_id": 3')

    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_jsonl(spark, str(p), keep_corrupt=True)


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A column added in later files surfaces corpus-wide with NULLs
    for the old files under merge_schema=True; the default read keeps
    one file's schema (no silent column loss assertion — just the
    evolved-read contract)."""
    from city_payroll_data_pipeline_spark.sources.readers import read_parquet

    d = tmp_path / "evolved"
    spark.createDataFrame([(1, "a")], "id long, text string").write.parquet(
        str(d / "batch=1")
    )
    spark.createDataFrame(
        [(2, "b", "en")], "id long, text string, lang string"
    ).write.parquet(str(d / "batch=2"))

    df = read_parquet(spark, str(d), merge_schema=True)
    assert set(df.columns) >= {"id", "text", "lang"}
    rows = {r["id"]: r["lang"] for r in df.collect()}
    assert rows == {1: None, 2: "en"}
