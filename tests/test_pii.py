"""PII redaction: kernel semantics, sequential-order pinning, and
value-exactness vs the DuckDB regexp chain on real testdata."""

import duckdb
import pandas as pd

import ray.data as rd

from lasutility_ray.stages.pii import (
    PiiRedact,
    inject_pii,
    inject_pii_sql,
    pii_redact,
    pii_redact_sql,
)

SF_DIR = "/root/testdata/sf0.001"


def _run(texts):
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    return PiiRedact()(df)


def test_kernel_masks_and_counts():
    out = _run(
        [
            "mail me at a.b+c%d@sub.example.org today",
            "server at 10.0.255.7 port 80",
            "call 555-123-4567 or 555-999-0000",
            "clean text, nothing here",
        ]
    )
    assert out["n_email"].tolist() == [1, 0, 0, 0]
    assert out["n_ipv4"].tolist() == [0, 1, 0, 0]
    assert out["n_phone"].tolist() == [0, 0, 2, 0]
    assert out["text_redacted"].tolist() == [
        "mail me at <EMAIL> today",
        "server at <IP> port 80",
        "call <PHONE> or <PHONE>",
        "clean text, nothing here",
    ]


def test_sequential_order_email_wins_over_ip():
    # the email pattern consumes a dotted-quad inside its domain
    # before the IP pattern ever sees it — sequential order is the
    # pinned semantics (ip-only scan would find 1.2.3.4 twice)
    out = _run(["user@1.2.3.4.example.com logged in from 1.2.3.4"])
    assert out["n_email"].iloc[0] == 1
    assert out["n_ipv4"].iloc[0] == 1
    assert out["text_redacted"].iloc[0] == "<EMAIL> logged in from <IP>"


def test_ascii_only_classes():
    # unicode digits must NOT match (RE2/DuckDB \d is ascii; we spell
    # [0-9] so python agrees)
    out = _run(["call ١٢٣-456-7890 maybe"])  # arabic-indic digits
    assert out["n_phone"].iloc[0] == 0
    assert out["text_redacted"].iloc[0] == "call ١٢٣-456-7890 maybe"


def test_boundary_guards():
    # 5-digit runs around a dotted quad break \b -> no IP match;
    # 10-digit runs are not xxx-xxx-xxxx phones
    out = _run(["version 12345.1.1.12345 build 5551234567"])
    assert out["n_ipv4"].iloc[0] == 0
    assert out["n_phone"].iloc[0] == 0


def test_value_exact_vs_duckdb(ray_session):
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    got = (
        pii_redact(inject_pii(docs))
        .drop_columns(["text"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    ref = (
        con.execute(
            pii_redact_sql(f"SELECT doc_id, {inject_pii_sql()} AS t FROM documents")
        )
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_email"].sum() > 0
    assert got["n_ipv4"].sum() > 0
    assert got["n_phone"].sum() > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], ref[sorted(ref.columns)])


def test_normalize_text_kernel(ray_session):
    import ray.data as rd

    from lasutility_ray.stages.text import normalize_text

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            # decomposed e+U+0301; tabs/newlines; already-clean
            "text": ["  café \t x\n\ny ", "plain", ""],
        }
    )
    out = normalize_text(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert out["text_norm"].tolist() == ["café x y", "plain", ""]
    assert out["n_chars_norm"].tolist() == [8, 5, 0]
