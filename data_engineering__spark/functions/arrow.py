"""Arrow-NATIVE batch UDFs (U-family, round 8): ``mapInArrow`` /
``applyInArrow``.

The U-family ladder, fastest first: built-in expressions (U1, codegen) →
Arrow-native batch UDFs (this module — ``pyarrow.RecordBatch`` in/out,
ZERO pandas conversion) → pandas UDFs (U2/U3, Arrow transfer + pandas
(de)serialization) → row-at-a-time Python UDFs (banned in this repo;
enforced by ``tests/test_discipline.py``). When Python is unavoidable
and the kernel is expressible in ``pyarrow.compute``, this rung beats
pandas UDFs by skipping the Arrow→pandas→Arrow copy on every batch —
on wide binary/string columns (exactly the multimodal/text payloads)
that copy IS the cost.

These mirrors are deliberately computations the registry already
verifies end-to-end (`token_count`, native group aggregates), so the
API surface is pinned by row-equality against oracle-backed results —
the round-7 "zero new verification debt" device (`tests/test_operators.py`).

Reference basis: the counting semantics mirror
``operators.text.token_count`` / ``bpe_ish_token_count`` (SURVEY §2 L4,
reference `process_publications_dag.py` text handling).
"""
from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

#: non-space runs over the trimmed string == the filtered whitespace-split
#: length the oracle computes; the BPE-ish classes match operators.text.
_WS_TOKEN_RE = "[^ ]+"
_BPE_ISH_RE = "[A-Za-z]+|[0-9]+|[^ A-Za-z0-9]+"


def arrow_token_counts(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """L4 twin of ``token_count`` via ``mapInArrow``: whitespace +
    BPE-ish token counts computed by ``pyarrow.compute`` regex kernels
    directly on the Arrow string column — no pandas materialization.
    Map-only (no shuffle); each batch emits (id, n_tokens, n_bpe_tokens).
    """
    import pyarrow as pa

    def counts(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc
        for b in batches:
            text = b.column(text_col)
            ws = pc.count_substring_regex(
                pc.utf8_trim_whitespace(text), _WS_TOKEN_RE)
            bpe = pc.count_substring_regex(text, _BPE_ISH_RE)
            yield pa.RecordBatch.from_arrays(
                [b.column(id_col), ws, bpe],
                [id_col, "n_tokens", "n_bpe_tokens"])

    out_schema = f"{id_col} long, n_tokens int, n_bpe_tokens int"
    return docs.select(id_col, text_col).mapInArrow(counts, out_schema)


def arrow_group_stats(df: DataFrame, key_col: str,
                      val_col: str) -> DataFrame:
    """U3 twin via ``applyInArrow``: per-group count/sum/min/max through
    a ``pyarrow.compute`` aggregation over each group's Arrow table —
    the grouped-map protocol without pandas. One hash shuffle on the
    key (same exchange the native groupBy pays); group state is a
    4-scalar row. Prefer the native aggregate in production — this is
    the protocol surface for kernels only Arrow/Python can express."""
    import pyarrow as pa

    def stats(table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        v = table.column(val_col)
        return pa.table({
            key_col: [table.column(key_col)[0].as_py()],
            "n": pa.array([len(v)], pa.int64()),
            "total": pa.array([pc.sum(v).as_py()], pa.float64()),
            "vmin": pa.array([pc.min(v).as_py()], pa.float64()),
            "vmax": pa.array([pc.max(v).as_py()], pa.float64()),
        })

    out_schema = (f"{key_col} string, n long, total double, "
                  "vmin double, vmax double")
    return (df.select(key_col, val_col)
            .groupBy(key_col).applyInArrow(stats, schema=out_schema))
