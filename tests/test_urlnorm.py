"""URL canonicalization + URL-keyed dedup (stages/urlnorm.py):
rule-by-rule semantics, injection mirror, and value-exactness vs
DuckDB on testdata."""

import duckdb
import pandas as pd

import ray.data as rd

from lasutility_ray.stages.urlnorm import (
    canonical_urls_sql,
    canonicalize_urls,
    inject_url_variants,
    url_dedup,
    url_dedup_sql,
)

SF_DIR = "/root/testdata/sf0.001"


def _canon(urls, ray_session):
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": range(len(urls)), "url": urls})
    )
    out = canonicalize_urls(ds).to_pandas().sort_values("doc_id")
    return out["canon_url"].tolist()


def test_rules(ray_session):
    cases = {
        # fragment stripped
        "https://a.example/p#frag": "https://a.example/p",
        # tracking-only query vanishes entirely
        "https://a.example/p?utm_source=x": "https://a.example/p",
        # consecutive tracking params collapse
        "https://a.example/p?utm_a=1&utm_b=2": "https://a.example/p",
        # real param survives, leading tracking param cleaned
        "https://a.example/p?utm_a=1&id=7": "https://a.example/p?id=7",
        # real param first, trailing tracking param cleaned
        "https://a.example/p?id=7&gclid=zz": "https://a.example/p?id=7",
        # sandwiched real param
        "https://a.example/p?utm_a=1&id=7&fbclid=q": (
            "https://a.example/p?id=7"
        ),
        # scheme+host lowercased, path case preserved
        "HTTPS://A.Example/PaTh": "https://a.example/PaTh",
        # everything at once
        "HTTPS://A.EXAMPLE/P?utm_x=1&id=2#z": "https://a.example/P?id=2",
    }
    got = _canon(list(cases), ray_session)
    assert got == list(cases.values())


def test_value_exact_vs_duckdb_on_testdata(ray_session):
    docs = rd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id"]
    )
    inj = docs.map_batches(inject_url_variants, batch_format="pyarrow")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    got = (
        canonicalize_urls(inj)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        con.execute(canonical_urls_sql())
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)

    d = (
        url_dedup(inj)
        .to_pandas()
        .sort_values("canon_url")
        .reset_index(drop=True)
    )
    de = (
        con.execute(url_dedup_sql())
        .fetchdf()
        .sort_values("canon_url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        d[sorted(d.columns)], de[sorted(de.columns)]
    )
    # injection must create real alias groups and dedup must keep the
    # lowest doc_id of each
    multi = d[d["n_aliases"] > 1]
    assert len(multi) > 0
    assert (multi["doc_id"] % 4 == 0).all()  # pair (4k, 4k+1) -> keep 4k
