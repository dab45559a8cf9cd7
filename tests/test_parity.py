"""Unit tests pinning the reference's parity-critical semantics (SURVEY §1.3,
§5 strategy #3) on tiny inline fixtures — the subtle behaviors that the
sf-scale oracle queries can't isolate."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_engineering__spark.functions.derive import (
    case_when_contains,
    first_token_before,
    map_lookup,
)
from data_engineering__spark.operators.dedup import dedup_by_key
from data_engineering__spark.operators.merge import dim_upsert, upsert_merge
from data_engineering__spark.operators.quality import (
    audit_diff,
    duplicate_key_audit,
    missing_value_audit,
)


def test_null_doi_dedup_passthrough(spark):
    """ON CONFLICT (doi) DO NOTHING + Postgres NULLs-distinct
    (process_publications_dag.py:67): non-null dois dedup; ALL null-doi rows
    survive."""
    df = spark.createDataFrame([
        Row(arxiv_id="a", doi="10.1/x"),
        Row(arxiv_id="b", doi="10.1/x"),   # dup doi → dropped (a wins: min id)
        Row(arxiv_id="c", doi=None),
        Row(arxiv_id="d", doi=None),       # null doi → BOTH kept
        Row(arxiv_id="e", doi="10.1/y"),
    ])
    out = dedup_by_key(df, ["doi"], [F.asc("arxiv_id")])
    got = sorted(r.arxiv_id for r in out.collect())
    assert got == ["a", "c", "d", "e"]


def test_dedup_deterministic_survivor(spark):
    """Survivor is the explicit-order minimum, not an arbitrary row."""
    df = spark.createDataFrame([Row(k="x", v=i) for i in (3, 1, 2)])
    out = dedup_by_key(df, ["k"], [F.asc("v")], null_passthrough=False)
    assert [r.v for r in out.collect()] == [1]


def test_dedup_idempotent(spark):
    """Property (SURVEY §5 #4): op(op(x)) == op(x)."""
    df = spark.createDataFrame(
        [Row(k=str(i % 7) if i % 3 else None, v=i) for i in range(50)])
    once = dedup_by_key(df, ["k"], [F.asc("v")])
    twice = dedup_by_key(once, ["k"], [F.asc("v")])
    assert set(map(tuple, once.collect())) == set(map(tuple, twice.collect()))


def test_naive_author_split(spark):
    """authors.split(', ') (process_publications_dag.py:73): 'A and B' with
    no comma stays ONE author."""
    df = spark.createDataFrame([
        Row(pub=1, authors="Ileana Streinu and Louis Theran"),
        Row(pub=2, authors="A One, B Two, C Three"),
    ])
    out = df.select("pub", F.explode(F.split("authors", ", ")).alias("name"))
    got = {(r.pub, r.name) for r in out.collect()}
    assert got == {(1, "Ileana Streinu and Louis Theran"),
                   (2, "A One"), (2, "B Two"), (2, "C Three")}


def test_count_col_skips_nulls(spark):
    """COUNT(doi) semantics (process_publications_dag.py:489): NULL group
    can never be flagged as duplicate."""
    df = spark.createDataFrame([Row(doi=None), Row(doi=None), Row(doi="x"),
                                Row(doi="x"), Row(doi="y")])
    flagged = duplicate_key_audit(df, "doi").collect()
    assert [(r.doi, r.dup_count) for r in flagged] == [("x", 2)]


def test_case_when_branch_order(spark):
    """Branch order is semantics (process_publications_dag.py:271-304):
    a row containing BOTH @article and @book takes the FIRST branch; and
    '@thesis' listed before '@phdthesis' shadows it (substring match)."""
    mapping = [("@article", "Journal Article"), ("@book", "Book"),
               ("@thesis", "Thesis"), ("@phdthesis", "PhD Thesis")]
    df = spark.createDataFrame([
        Row(bib="see @article and @book"),
        Row(bib="a @phdthesis entry"),     # contains '@thesis' substring? no:
        Row(bib="plain @thesis"),          # '@phdthesis' does NOT contain '@thesis'
        Row(bib="nothing"),
    ])
    out = df.withColumn("t", case_when_contains("bib", mapping)).collect()
    got = {r.bib: r.t for r in out}
    assert got["see @article and @book"] == "Journal Article"
    # '@phdthesis' string does not contain '@thesis' ('d' != '@'): falls to
    # its own branch — mirrors the reference's actual substring behavior
    assert got["a @phdthesis entry"] == "PhD Thesis"
    assert got["plain @thesis"] == "Thesis"
    assert got["nothing"] == "Unknown"


def test_first_token_fallback(spark):
    """summary.split('-')[0] if '-' present else 'Unknown'
    (process_publications_dag.py:452-453)."""
    df = spark.createDataFrame([Row(s="A Author - Venue, 2019"), Row(s="no dash")])
    out = df.withColumn("a", first_token_before("s", "-")).collect()
    assert {r.s: r.a for r in out} == {"A Author - Venue, 2019": "A Author",
                                       "no dash": "Unknown"}


def test_map_lookup_default(spark):
    """21-code map with 'Other' default (process_publications_dag.py:397-421)."""
    df = spark.createDataFrame([Row(code="cs.AI"), Row(code="zz.ZZ")])
    out = map_lookup(df, "code", {"cs.AI": "Artificial Intelligence"}, "label")
    assert {r.code: r.label for r in out.collect()} == {
        "cs.AI": "Artificial Intelligence", "zz.ZZ": "Other"}


def test_dim_upsert_deterministic_ids(spark):
    """A7: unseen names get max_id + row_number(order by name); existing
    untouched; idempotent on re-run."""
    dim = spark.createDataFrame([Row(id=7, name="alice")])
    incoming = spark.createDataFrame(
        [Row(name="bob"), Row(name="alice"), Row(name="carol"), Row(name="bob")])
    out = dim_upsert(dim, incoming, "name")
    got = {r.name: r.id for r in out.collect()}
    assert got == {"alice": 7, "bob": 8, "carol": 9}
    again = dim_upsert(out, incoming, "name")
    assert {r.name: r.id for r in again.collect()} == got


def test_upsert_merge_semantics(spark):
    """A8 (process_publications_dag.py:224-232): matched rows update with
    COALESCE on doi; unmatched target kept; source-only inserted; key stays
    unique."""
    target = spark.createDataFrame([
        Row(title="t1", journal_ref="old1", doi="d1"),
        Row(title="t2", journal_ref="old2", doi=None),
        Row(title="t3", journal_ref="old3", doi="d3"),
    ])
    source = spark.createDataFrame([
        Row(title="t1", journal_ref="new-link-1", doi=None),   # keep old doi
        Row(title="t2", journal_ref="new-link-2", doi="d2new"),
        Row(title="t4", journal_ref="new-link-4", doi="d4"),   # insert
    ])
    out = upsert_merge(target, source, "title",
                       update_cols=["journal_ref"], coalesce_cols=["doi"])
    got = {r.title: (r.journal_ref, r.doi) for r in out.collect()}
    assert got == {
        "t1": ("new-link-1", "d1"),
        "t2": ("new-link-2", "d2new"),
        "t3": ("old3", "d3"),
        "t4": ("new-link-4", "d4"),
    }
    assert out.count() == out.select("title").distinct().count()


def test_merge_into_managed_table_in_place(spark):
    """A8 managed variant: the same MERGE semantics applied IN PLACE to a
    catalog table (Delta MERGE INTO when available; staged overwrite
    fallback here). Re-merging the same source is idempotent and the
    staging table never survives."""
    from data_engineering__spark.operators.merge import merge_into_managed
    table = "merge_managed_t1"
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    spark.createDataFrame([
        Row(title="t1", journal_ref="old1", doi="d1"),
        Row(title="t2", journal_ref="old2", doi=None),
        Row(title="t3", journal_ref="old3", doi="d3"),
    ]).write.saveAsTable(table)
    source = spark.createDataFrame([
        Row(title="t1", journal_ref="new-link-1", doi=None),
        Row(title="t2", journal_ref="new-link-2", doi="d2new"),
        Row(title="t4", journal_ref="new-link-4", doi="d4"),
    ])
    expect = {
        "t1": ("new-link-1", "d1"),
        "t2": ("new-link-2", "d2new"),
        "t3": ("old3", "d3"),
        "t4": ("new-link-4", "d4"),
    }
    for _ in range(2):  # second pass: idempotence on the merged state
        merge_into_managed(spark, table, source, "title",
                           update_cols=["journal_ref"],
                           coalesce_cols=["doi"])
        got = {r.title: (r.journal_ref, r.doi)
               for r in spark.table(table).collect()}
        assert got == expect
    assert not spark.catalog.tableExists(f"{table}__merge_staging")
    spark.sql(f"DROP TABLE `{table}`")


def test_missing_value_audit(spark):
    df = spark.createDataFrame([Row(doi="x", aff="a"), Row(doi=None, aff=" "),
                                Row(doi="", aff=None)])
    row = missing_value_audit(df, ["doi", "aff"]).collect()[0]
    assert (row.total_rows, row.doi_missing, row.aff_missing) == (3, 2, 2)


def test_audit_diff_update_appears_as_old_new(spark):
    """Q3: an UPDATE logs one OLD + one NEW row, a DELETE logs OLD only
    (trigger parity, database and queries aupostgres.sql:82-97)."""
    before = spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")])
    after = spark.createDataFrame([Row(id=1, v="a2")])
    log = audit_diff(before, after, "pubs").collect()
    ops = sorted((r.operation, r.row_values) for r in log)
    assert [o for o, _ in ops] == ["NEW", "OLD", "OLD"]
    assert any('"v":"a2"' in v for o, v in ops if o == "NEW")


def test_bibtex_labels_pin_reference_mapping(spark):
    """All 15 bibtex branch labels match extract_publication_type
    (process_publications_dag.py:271-305) verbatim — including the three
    easy-to-misquote ones: 'Unpublished Work', 'Masters Thesis',
    'Collection'."""
    from data_engineering__spark.plans.pipeline import BIBTEX_TYPES

    reference = [  # keyword → label, in the reference's elif order
        ("@article", "Journal Article"),
        ("@inproceedings", "Conference Paper"),
        ("@book", "Book"),
        ("@thesis", "Thesis"),
        ("@techreport", "Technical Report"),
        ("@manual", "Manual"),
        ("@proceedings", "Conference Proceedings"),
        ("@unpublished", "Unpublished Work"),
        ("@misc", "Miscellaneous"),
        ("@phdthesis", "PhD Thesis"),
        ("@mastersthesis", "Masters Thesis"),
        ("@inbook", "Book Chapter"),
        ("@incollection", "Collection"),
        ("@patent", "Patent"),
        ("@online", "Online Resource"),
    ]
    assert BIBTEX_TYPES == reference


def test_upsert_merge_insert_only_columns(spark):
    """A8: insert_cols are set on INSERT and never touched by the conflict
    update — the reference's submitter (process_publications_dag.py:
    224-231 sets submitter in VALUES but not in DO UPDATE SET)."""
    target = spark.createDataFrame([
        Row(title="t1", submitter="orig-submitter", doi="d1")])
    source = spark.createDataFrame([
        Row(title="t1", submitter="api-author-1", doi=None),
        Row(title="t2", submitter="api-author-2", doi="d2")])
    out = upsert_merge(target, source, "title",
                       coalesce_cols=["doi"], insert_cols=["submitter"])
    got = {r.title: (r.submitter, r.doi) for r in out.collect()}
    assert got == {"t1": ("orig-submitter", "d1"),
                   "t2": ("api-author-2", "d2")}


def test_scd2_merge_semantics_and_idempotence(spark):
    """SCD2: changed current rows close + re-insert, new keys insert,
    unchanged pass through; re-applying the same batch is a no-op."""
    from pyspark.sql import Row

    from data_engineering__spark.operators.merge import scd2_merge

    hist = spark.createDataFrame(
        [(1, "a", "2020-01-01", None, True),
         (2, "b", "2020-01-01", None, True),
         (2, "old", "2019-01-01", "2020-01-01", False)],
        "k long, attr string, valid_from string, valid_to string, "
        "is_current boolean") \
        .withColumn("valid_from", F.to_date("valid_from")) \
        .withColumn("valid_to", F.to_date("valid_to"))
    changes = spark.createDataFrame(
        [Row(k=1, attr="a"),        # unchanged
         Row(k=2, attr="b2"),       # changed
         Row(k=3, attr="c")])       # new
    out = scd2_merge(hist, changes, "k", ["attr"], "2024-01-15")
    rows = {(r.k, r.attr): (str(r.valid_from), str(r.valid_to), r.is_current)
            for r in out.collect()}
    assert rows[(1, "a")] == ("2020-01-01", "None", True)          # untouched
    assert rows[(2, "b")] == ("2020-01-01", "2024-01-15", False)   # closed
    assert rows[(2, "b2")] == ("2024-01-15", "None", True)         # new version
    assert rows[(2, "old")] == ("2019-01-01", "2020-01-01", False) # history kept
    assert rows[(3, "c")] == ("2024-01-15", "None", True)          # inserted
    # idempotence: same batch again changes nothing
    again = scd2_merge(out, changes, "k", ["attr"], "2024-01-15")
    a = sorted(map(tuple, (map(str, r) for r in out.collect())))
    b = sorted(map(tuple, (map(str, r) for r in again.collect())))
    assert a == b


def test_scd2_merge_carries_untracked_columns(spark):
    """History columns NOT in ``attrs`` pass through unchanged rows and
    closed rows intact; inserted rows take them from changes when present
    there, NULL otherwise — untracked columns never participate in change
    detection."""
    from pyspark.sql import Row

    from data_engineering__spark.operators.merge import scd2_merge

    hist = spark.createDataFrame(
        [(1, "a", "note1", "2020-01-01", None, True),
         (2, "b", "note2", "2020-01-01", None, True)],
        "k long, attr string, note string, valid_from string, "
        "valid_to string, is_current boolean") \
        .withColumn("valid_from", F.to_date("valid_from")) \
        .withColumn("valid_to", F.to_date("valid_to"))
    # changes carry the extra column for k=2; note differs for k=1 but
    # attr does not → k=1 must NOT close (untracked col is not compared)
    changes = spark.createDataFrame(
        [Row(k=1, attr="a", note="CHANGED"),
         Row(k=2, attr="b2", note="fresh"),
         Row(k=3, attr="c", note=None)])
    out = scd2_merge(hist, changes, "k", ["attr"], "2024-01-15")
    rows = {(r.k, r.attr): (r.note, r.is_current) for r in out.collect()}
    assert rows[(1, "a")] == ("note1", True)     # untouched, note preserved
    assert rows[(2, "b")] == ("note2", False)    # closed row keeps its note
    assert rows[(2, "b2")] == ("fresh", True)    # insert takes changes' note
    assert rows[(3, "c")] == (None, True)

    # a changes frame WITHOUT the extra column inserts NULL for it
    changes2 = spark.createDataFrame([Row(k=4, attr="d")])
    out2 = scd2_merge(hist, changes2, "k", ["attr"], "2024-01-15")
    got = {r.k: r.note for r in out2.filter(F.col("k") == 4).collect()}
    assert got == {4: None}
