"""Driver-emulation harness: run every ``queries()`` entry and compare
against ``oracle_sql()`` via DuckDB the way the grader does (row count +
order-insensitive value comparison, columns sorted by name).

Usage:
    python tools/check_entry.py [sf_dir] [query ...]
    python tools/check_entry.py [sf_dir] --random N --seed S

``--random N --seed S`` (VERDICT r4 #8) draws a reproducible N-twin
sample from the SQL-twinned queries (sorted name list, seeded
``random.Random(S).sample``) — the per-round out-of-window evidence
sweep recorded in COVERAGE.md, reproducible by the judge with the same
seed."""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(lambda v: tuple(v))
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), ignore_index=True)


def main():
    args = sys.argv[1:]
    rand_n = rand_seed = None
    if "--random" in args:
        i = args.index("--random")
        rand_n = int(args[i + 1])
        del args[i : i + 2]
    if "--seed" in args:
        i = args.index("--seed")
        rand_seed = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    # point the checkpoint-reading oracle twins at THIS tier's work dirs
    # (the driver contract defaults them to sf0.01)
    import os

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    os.environ["ITX_ORACLE_ENTRY_WORK"] = f"/tmp/itx_entry_{tag}"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    from intertext_ray.pipelines.documents import clips_corpus_for_sf

    os.environ["ITX_ORACLE_CLIPS_WORK"] = (
        clips_corpus_for_sf(sf_dir, with_audio=True) + "/dedup_work"
    )
    from intertext_ray.fixtures.gen_audio import audio_dup_corpus_for_sf

    os.environ["ITX_ORACLE_AUDIODUP_CLIPS"] = (
        audio_dup_corpus_for_sf(sf_dir) + "/clips"
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if rand_n is not None:
        import random

        twinned = sorted(n for n in qs if n in oracles)
        only = set(
            random.Random(rand_seed or 0).sample(
                twinned, min(rand_n, len(twinned))
            )
        )
        print(
            f"--random {rand_n} --seed {rand_seed or 0} -> "
            + ", ".join(sorted(only)),
            flush=True,
        )
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            out = to_pandas(fn(sf_dir))
        except Exception as e:
            results[name] = f"QUERY ERROR: {type(e).__name__}: {e}"
            print(name, results[name][:500], flush=True)
            continue
        wall = time.time() - t0
        if name not in oracles:
            results[name] = f"rows-only: {len(out)} rows [{wall:.1f}s]"
            print(name, results[name], flush=True)
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"SQL ERROR: {e}"
            print(name, results[name][:500], flush=True)
            continue
        a, b = normalize(out), normalize(exp)
        status = []
        if len(a) != len(b):
            status.append(f"ROWS {len(a)} vs {len(b)}")
        if list(a.columns) != list(b.columns):
            status.append(f"COLS {list(a.columns)} vs {list(b.columns)}")
        if not status:
            try:
                eq = a.reset_index(drop=True).equals(b.reset_index(drop=True))
                if not eq:
                    # find first differing cell for debugging
                    neq = (a.values != b.values)
                    ij = np.argwhere(neq)
                    i, j = ij[0]
                    status.append(
                        f"VALUES differ at row {i} col {a.columns[j]}: "
                        f"{a.iloc[i, j]!r} vs {b.iloc[i, j]!r} ({len(ij)} cells)"
                    )
            except Exception as e:
                status.append(f"COMPARE ERROR: {e}")
        results[name] = ("OK" if not status else "; ".join(status)) + f" ({len(a)} rows) [{wall:.1f}s]"
        print(name, results[name], flush=True)

    bad = {k: v for k, v in results.items() if not (v.startswith("OK") or v.startswith("rows-only"))}
    print("\n==== SUMMARY:", "ALL OK" if not bad else f"{len(bad)} FAILING: {sorted(bad)}")
    ray.shutdown()


if __name__ == "__main__":
    main()
