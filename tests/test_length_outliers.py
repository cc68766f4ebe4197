"""Per-source robust length-outlier gate: discrete-median contract vs
DuckDB quantile_disc, flag semantics, broadcast correctness."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd


def _docs(ids, sources, lens, blocks=3):
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(lens, pa.int64()),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def test_matches_duckdb_quantile_disc(ray_session):
    from intertext_ray.ops.curate import length_outliers

    rng = np.random.default_rng(5)
    n = 200
    ids = list(range(n))
    sources = [f"s{i % 4}" for i in ids]
    lens = rng.integers(50, 5000, size=n).tolist()
    # plant extremes
    lens[0], lens[1] = 1, 900_000

    got = (
        length_outliers(_docs(ids, sources, lens), k=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.register(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array(lens, pa.int64()),
            }
        ),
    )
    want = con.execute(
        """
        WITH s AS (
          SELECT source, quantile_disc(n_chars, 0.5) AS med
          FROM documents GROUP BY source
        ),
        d AS (
          SELECT doc_id, documents.source, n_chars, med,
                 abs(n_chars - med) AS dev
          FROM documents JOIN s USING (source)
        ),
        m AS (SELECT source, quantile_disc(dev, 0.5) AS mad FROM d GROUP BY source)
        SELECT doc_id, d.source, n_chars,
               CAST(med AS BIGINT) AS med, CAST(mad AS BIGINT) AS mad,
               (dev > 3 * mad) AS is_outlier
        FROM d JOIN m USING (source) ORDER BY doc_id
        """
    ).fetch_df()
    for col in ("doc_id", "n_chars", "med", "mad"):
        assert got[col].tolist() == want[col].tolist(), col
    assert got["is_outlier"].tolist() == want["is_outlier"].tolist()
    # the 900k blowup is >3 MADs out on any uniform(50,5000) source; the
    # low extreme (1) is NOT — uniform MAD is wide, the robust gate only
    # fires on true blowups (that asymmetry is the point of MAD gating)
    assert bool(got.loc[1, "is_outlier"])
    assert got["is_outlier"].sum() >= 1


def test_single_doc_source_not_outlier(ray_session):
    from intertext_ray.ops.curate import length_outliers

    got = (
        length_outliers(_docs([7], ["only"], [123], blocks=1))
        .to_pandas()
        .iloc[0]
    )
    # med == its own length, mad == 0, dev == 0 -> 0 > 0 is False
    assert got["med"] == 123 and got["mad"] == 0
    assert not bool(got["is_outlier"])


def test_gopher_rules_each_rule_fires(ray_session):
    """One planted violation per rule trips exactly that rule."""
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.curate import gopher_rules

    texts = [
        " ".join(["word"] * 60),                        # clean
        "short doc",                                    # length
        " ".join(["a"] * 60),                           # mean token len
        " ".join(["word"] * 50) + " " + "# " * 15,      # symbol ratio
        "\n".join(["- bullet point here"] * 10),        # bullets
        ("line one...\nline two...\nplain line\n" * 4), # ellipsis lines
        " ".join(["123"] * 60),                         # alpha fraction
        "",                                             # empty
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    got = (
        gopher_rules(ds).to_pandas().sort_values("doc_id").set_index("doc_id")
    )
    assert got["gopher_pass"].tolist() == [True] + [False] * 7
    assert not got.loc[1, "length_ok"]
    assert not got.loc[2, "tok_len_ok"]
    assert not got.loc[3, "symbol_ok"] and got.loc[3, "length_ok"]
    assert not got.loc[4, "bullet_ok"]
    assert not got.loc[5, "ellipsis_ok"]
    assert not got.loc[6, "alpha_ok"] and got.loc[6, "tok_len_ok"]
    # clean doc passes every individual rule
    flags = ["length_ok", "tok_len_ok", "symbol_ok", "bullet_ok",
             "ellipsis_ok", "alpha_ok"]
    assert got.loc[0, flags].all()


def test_strip_markup_order_contract(ray_session):
    """Tags strip first (word boundaries preserved), entities decode in
    table order with &amp; last — double-escaped text does NOT double-
    decode, and &lt; never fabricates a tag."""
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.curate import strip_markup

    texts = [
        'word<br>word <p class="a">para</p>',
        "a &amp;lt; b",           # decodes to 'a &lt; b' — NOT 'a < b'
        "x &lt;b&gt; y",          # decodes to 'x <b> y' — tag survives
        "Tom &amp; Jerry &quot;quoted&quot;",
        "plain",
        "",
    ]
    got = (
        strip_markup(
            rd.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array(range(len(texts)), pa.int64()),
                        "text": pa.array(texts, pa.string()),
                    }
                )
            ).repartition(2)
        )
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert got.loc[0, "text"] == "word word  para "
    assert got.loc[0, "n_tags"] == 3 and got.loc[0, "n_entities"] == 0
    assert got.loc[1, "text"] == "a &lt; b"
    assert got.loc[1, "n_entities"] == 1  # only the &amp;
    assert got.loc[2, "text"] == "x <b> y"
    assert got.loc[2, "n_tags"] == 0 and got.loc[2, "n_entities"] == 2
    assert got.loc[3, "text"] == 'Tom & Jerry "quoted"'
    assert got.loc[3, "n_entities"] == 3
    assert got.loc[4, "text"] == "plain"
    assert got.loc[5, "text"] == ""
