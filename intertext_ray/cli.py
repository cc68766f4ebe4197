"""CLI entry point — the reference's ``intertext`` command re-expressed
(``/root/reference/intertext/intertext.py:107-143`` argparse surface), run
as a Ray job: ``python -m intertext_ray --clips <table> --output out/`` or
``ray job submit -- python -m intertext_ray ...``.

Flags mirror the reference's semantic knobs (window/slide/chargram lengths,
band config, min_sim, banish/exclude/only, metadata, strip_diacritics,
xml tags) plus the Ray-side knobs (num-buckets, checkpoint dir).  Output is
the reference's api/ layout (matches, indices, scatterplots, texts,
config.json) plus the columnar stage checkpoints.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="intertext_ray",
        description="Ray-Data-native near-duplicate detection + clustering",
    )
    p.add_argument("--clips", help="clips table (lance dir / parquet file or dir) "
                                   "with (clip_id, bytes, sr_hz, dur_ms, codec, transcript)")
    p.add_argument("--documents", help="alternative: parquet with (doc_id, text)")
    p.add_argument("--output", default="output", help="output directory")
    p.add_argument("--metadata", help="metadata JSON (doc/clip id -> {author,title,year,url})")
    # reference semantic knobs (defaults = reference defaults)
    p.add_argument("--window-length", type=int, default=14)
    p.add_argument("--slide-length", type=int, default=4)
    p.add_argument("--chargram-length", type=int, default=4)
    p.add_argument("--hashband-length", type=int, default=4)
    p.add_argument("--hashband-step", type=int, default=3)
    p.add_argument("--min-sim", type=int, default=50)
    p.add_argument("--max-file-sim", type=float, default=None)
    p.add_argument("--banish-ids", help="comma-separated doc ids to banish (post-match graph pruning)")
    p.add_argument("--banish-distance", type=int, default=4)
    p.add_argument("--exclude-ids", help="comma-separated doc ids to exclude from formatting")
    p.add_argument("--only", type=int, default=None, help="focal doc id filter")
    p.add_argument("--strip-diacritics", action="store_true")
    p.add_argument("--xml-base-tag")
    p.add_argument("--xml-remove-tags", help="comma-separated tags to drop")
    p.add_argument("--compute-probabilities", action="store_true")
    # Ray-side knobs
    p.add_argument(
        "--mode",
        choices=["text", "audio", "spans", "joint", "preprocess", "pack",
                 "chunks", "tiers"],
        default="text",
        help="text: reference transcript dedup (default); audio: "
        "audio-payload fingerprint dedup; joint: both chains + per-clip "
        "dup class (both/text_only/audio_only/unique); spans: shared-audio-"
        "span detect + cut (windowed-BER ExactSubstr rewrite); preprocess: "
        "payload rewrite (peak normalize + resample to --target-hz), all "
        "non-audio columns passed through; pack: fixed-duration training-"
        "window assignment (+ optional payload materialization); chunks: "
        "content-defined chunk dedup over --documents (dup-mass report + "
        "keep-one-copy purge rewrite); tiers: the 4-rung cascade purge "
        "over --documents (exact > fold > MinHash > SimHash keep-one) + "
        "per-doc strongest-tier report, survivors written as parquet",
    )
    p.add_argument("--cdc-k", type=int, default=4,
                   help="chunks mode: cut-rule word-gram size")
    p.add_argument("--cdc-divisor", type=int, default=16,
                   help="chunks mode: cut density (mean chunk ~divisor "
                   "tokens + k - 1)")
    p.add_argument("--pack-budget-ms", type=int, default=30000,
                   help="pack mode: window duration budget")
    p.add_argument("--pack-payloads", action="store_true",
                   help="pack mode: also materialize concatenated windows")
    p.add_argument("--target-hz", type=int, default=16000,
                   help="preprocess: output sample rate")
    p.add_argument("--target-rms", type=int, default=0,
                   help="preprocess: RMS-normalize payloads to this integer "
                   "RMS level (0 = off; applied after --remove-dc, before "
                   "--target-peak)")
    p.add_argument("--remove-dc", action="store_true",
                   help="preprocess: subtract the per-clip floor-mean DC "
                   "offset first")
    p.add_argument("--trim-silence", action="store_true",
                   help="preprocess: trim leading/trailing silence at "
                   "complete-frame granularity (all-silent clips dropped)")
    p.add_argument("--target-peak", type=int, default=0,
                   help="preprocess: peak-normalize to this level first "
                   "(0 = skip normalization)")
    p.add_argument("--resampler", choices=["linear", "sinc"],
                   default="sinc",
                   help="preprocess: integer-exact linear or "
                   "anti-aliasing Kaiser-sinc kernel")
    p.add_argument("--audio-max-ber", type=float, default=0.25,
                   help="audio verify: max bit-error-rate")
    p.add_argument("--audio-shingle", type=int, default=1,
                   help="audio LSH: consecutive subfingerprints per key")
    p.add_argument("--num-buckets", type=int, default=64)
    p.add_argument("--checkpoint-dir", help="stage checkpoint root (default <output>/cache)")
    p.add_argument("--no-audio-validate", action="store_true",
                   help="skip the decode+SNR invariant stage for clips input")
    p.add_argument("--skip-api", action="store_true",
                   help="write only columnar outputs, no api/ JSON export")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not args.clips and not args.documents:
        print("error: one of --clips / --documents is required", file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import pyarrow as pa
    import ray.data as rd

    # per-op resource reservation fragments CPUs across the long map->sort
    # chain (no actor pools left in the hot path to protect); measured
    # 120s -> 86s on the mult=8 clips headline at 32 cpus
    rd.DataContext.get_current().op_resource_reservation_ratio = 0.0

    from intertext_ray.config import IntertextConfig
    from intertext_ray.pipelines.dedup import run_dedup
    from intertext_ray.sources.clips import clips_to_docs, read_clips
    from intertext_ray.stages.audio import audio_validate_stage
    from intertext_ray.stages.exports import (
        format_clusters,
        word_counts_dict,
        write_api_outputs,
    )

    cfg = IntertextConfig(
        window_length=args.window_length,
        slide_length=args.slide_length,
        chargram_length=args.chargram_length,
        hashband_length=args.hashband_length,
        hashband_step=args.hashband_step,
        min_sim=args.min_sim,
        max_file_sim=args.max_file_sim,
        banish_distance=args.banish_distance,
        only_doc_id=args.only,
        strip_diacritics=args.strip_diacritics,
        xml_base_tag=args.xml_base_tag,
        xml_remove_tags=tuple((args.xml_remove_tags or "").split(","))
        if args.xml_remove_tags
        else (),
    )

    if args.mode == "preprocess":
        if not args.clips:
            print("error: --mode preprocess requires --clips", file=sys.stderr)
            return 2
        from intertext_ray.ops.audio_dc import dc_remove_clips
        from intertext_ray.ops.audio_gain import normalize_clips
        from intertext_ray.ops.audio_loudnorm import rms_normalize_clips
        from intertext_ray.ops.audio_resample import resample_clips

        os.makedirs(args.output, exist_ok=True)
        ds = read_clips(args.clips)
        n_in = ds.count()
        if args.remove_dc:
            ds = dc_remove_clips(ds)
        if args.trim_silence:
            from intertext_ray.ops.audio_trim import trim_clips

            ds = trim_clips(ds)
        if args.target_rms:
            ds = rms_normalize_clips(ds, target_rms=args.target_rms)
        if args.target_peak:
            ds = normalize_clips(ds, target_peak=args.target_peak)
        ds = resample_clips(
            ds, target_hz=args.target_hz, quality=args.resampler
        )
        out_dir = os.path.join(args.output, "clips_preprocessed")
        ds = ds.materialize()
        ds.write_parquet(out_dir)
        print(
            json.dumps(
                {
                    "mode": "preprocess",
                    "clips_in": n_in,
                    "clips_out": ds.count(),
                    "target_hz": args.target_hz,
                    "target_peak": args.target_peak or None,
                    "target_rms": args.target_rms or None,
                    "remove_dc": bool(args.remove_dc),
                    "trim_silence": bool(args.trim_silence),
                    "resampler": args.resampler,
                    "output": out_dir,
                }
            )
        )
        return 0

    if args.mode == "pack":
        if not args.clips:
            print("error: --mode pack requires --clips", file=sys.stderr)
            return 2
        from intertext_ray.ops.audio_pack import (
            assign_audio_packs,
            pack_payloads,
        )

        os.makedirs(args.output, exist_ok=True)
        clips = read_clips(args.clips)
        assigned = assign_audio_packs(
            clips, budget_ms=args.pack_budget_ms
        ).materialize()
        assigned.write_parquet(os.path.join(args.output, "pack_assignment"))
        summary = {
            "mode": "pack",
            "clips": assigned.count(),
            "packs": int(assigned.groupby("pack_id").count().count()),
            "budget_ms": args.pack_budget_ms,
            "output": args.output,
        }
        if args.pack_payloads:
            packs = pack_payloads(assigned, clips).materialize()
            packs.write_parquet(os.path.join(args.output, "packs"))
            summary["packs_materialized"] = packs.count()
        print(json.dumps(summary))
        return 0

    if args.mode == "chunks":
        if not args.documents:
            print("error: --mode chunks requires --documents", file=sys.stderr)
            return 2
        from intertext_ray.ops.cdc import cdc_dup_chunks, remove_dup_chunks
        from intertext_ray.sources.clips import read_table

        os.makedirs(args.output, exist_ok=True)
        k, dv, nb = args.cdc_k, args.cdc_divisor, args.num_buckets
        docs = read_table(args.documents, columns=["doc_id", "text"])
        dups = cdc_dup_chunks(
            docs, k=k, divisor=dv, num_buckets=nb
        ).materialize()
        dups.write_parquet(os.path.join(args.output, "dup_chunks"))
        docs2 = read_table(args.documents, columns=["doc_id", "text"])
        cleaned = remove_dup_chunks(
            docs2, k=k, divisor=dv, num_buckets=nb
        ).materialize()
        cleaned.write_parquet(os.path.join(args.output, "docs_dechunked"))
        n_cut = cleaned.filter(expr="n_removed > 0").count()
        from ray.data.aggregate import Sum as _Sum

        removed = int(
            cleaned.aggregate(_Sum("n_removed"))["sum(n_removed)"]
        )
        print(
            json.dumps(
                {
                    "mode": "chunks",
                    "dup_chunk_hashes": dups.count(),
                    "docs": cleaned.count(),
                    "docs_cut": n_cut,
                    "tokens_removed": removed,
                    "output": args.output,
                }
            )
        )
        return 0

    if args.mode == "tiers":
        if not args.documents:
            print("error: --mode tiers requires --documents", file=sys.stderr)
            return 2
        from intertext_ray.ops.tiers import (
            dedup_tier_report,
            tiered_purge_report,
        )
        from intertext_ray.sources.clips import read_table

        os.makedirs(args.output, exist_ok=True)
        nb = args.num_buckets
        docs = read_table(args.documents, columns=["doc_id", "text"])
        report = dedup_tier_report(docs, num_buckets=nb).materialize()
        report.write_parquet(os.path.join(args.output, "tier_report"))
        docs2 = read_table(args.documents, columns=["doc_id", "text"])
        purge = tiered_purge_report(
            docs2,
            num_buckets=nb,
            work_dir=args.checkpoint_dir
            or os.path.join(args.output, "cache", "tiers"),
        ).materialize()
        purge.write_parquet(os.path.join(args.output, "purge_report"))
        # survivors with text: one bucketed anti-join (broadcast-free)
        from intertext_ray.ops.tiers import _anti_join_docs

        dropped = purge.filter(expr="kept == False").select_columns(
            ["doc_id"]
        )
        docs3 = read_table(args.documents, columns=["doc_id", "text"])
        survivors = _anti_join_docs(docs3, dropped, "text", nb).materialize()
        survivors.write_parquet(os.path.join(args.output, "survivors"))

        tiers_hist = {
            str(r["tier"]): int(r["count()"])
            for r in report.groupby("tier").count().take_all()
        }
        drop_hist = {
            str(r["dropped_at"]): int(r["count()"])
            for r in purge.groupby("dropped_at").count().take_all()
        }
        print(
            json.dumps(
                {
                    "mode": "tiers",
                    "docs": purge.count(),
                    "tier_report": tiers_hist,
                    "dropped_at": drop_hist,
                    "survivors": survivors.count(),
                    "output": args.output,
                }
            )
        )
        return 0

    if args.mode == "spans":
        if not args.clips:
            print("error: --mode spans requires --clips", file=sys.stderr)
            return 2
        import pyarrow.parquet as pq

        from intertext_ray.ops.audio_spans import (
            audio_common_spans,
            remove_audio_spans,
        )

        os.makedirs(args.output, exist_ok=True)
        clips = read_clips(args.clips)
        spans = audio_common_spans(
            clips,
            g=args.audio_shingle,
            num_buckets=args.num_buckets,
        ).materialize()
        spans.write_parquet(os.path.join(args.output, "audio_spans"))
        cleaned = remove_audio_spans(clips, spans).materialize()
        cleaned.write_parquet(os.path.join(args.output, "clips_despanned"))
        n_cut = cleaned.filter(expr="n_frames_removed > 0").count()
        print(
            json.dumps(
                {
                    "mode": "spans",
                    "span_rows": spans.count(),
                    "clips": cleaned.count(),
                    "clips_cut": n_cut,
                    "output": args.output,
                }
            )
        )
        return 0

    if args.mode in ("audio", "joint"):
        if not args.clips:
            print("error: --mode audio/joint requires --clips", file=sys.stderr)
            return 2
        import pyarrow.parquet as pq

        os.makedirs(args.output, exist_ok=True)
        clips = read_clips(args.clips)
        if args.mode == "audio":
            from intertext_ray.ops.audio_dedup import (
                audio_dup_clusters,
                audio_dup_pairs,
            )

            pairs = audio_dup_pairs(
                clips,
                g=args.audio_shingle,
                max_ber=args.audio_max_ber,
                num_buckets=args.num_buckets,
            ).materialize()
            pairs.write_parquet(os.path.join(args.output, "audio_dup_pairs"))
            clusters = audio_dup_clusters(pairs)
            pq.write_table(
                clusters,
                os.path.join(args.output, "audio_dup_clusters.parquet"),
            )
            print(
                json.dumps(
                    {
                        "mode": "audio",
                        "dup_pairs": pairs.count(),
                        "clustered_clips": len(clusters),
                        "output": args.output,
                    }
                )
            )
            return 0
        from intertext_ray.ops.joint_dedup import joint_dup_report

        rep = joint_dup_report(
            clips,
            cfg,
            num_buckets=args.num_buckets,
            work_dir=args.checkpoint_dir,
        ).materialize()
        rep.write_parquet(os.path.join(args.output, "joint_dup_report"))
        hist = {
            str(r["dup_class"]): int(r["count()"])
            for r in rep.groupby("dup_class").count().take_all()
        }
        print(
            json.dumps(
                {
                    "mode": "joint",
                    "clips": rep.count(),
                    "classes": hist,
                    "output": args.output,
                }
            )
        )
        return 0

    if args.clips:
        clips = read_clips(args.clips)
        if not args.no_audio_validate:
            clips = audio_validate_stage(clips)
        docs = clips.map_batches(clips_to_docs, batch_format="pyarrow").select_columns(
            ["doc_id", "text"]
        )
    else:
        docs = rd.read_parquet(args.documents, columns=["doc_id", "text"]).map_batches(
            lambda b: pa.table(
                {"doc_id": b["doc_id"].cast(pa.uint64()), "text": b["text"]}
            ),
            batch_format="pyarrow",
        )

    banished = (
        {int(x) for x in args.banish_ids.split(",")} if args.banish_ids else None
    )
    excluded = (
        {int(x) for x in args.exclude_ids.split(",")} if args.exclude_ids else None
    )
    work_dir = args.checkpoint_dir or os.path.join(args.output, "cache")
    res = run_dedup(
        docs,
        cfg,
        work_dir=work_dir,
        banished_doc_ids=banished,
        excluded_doc_ids=excluded,
        num_buckets=args.num_buckets,
        with_pair_clusters=True,
    )

    os.makedirs(args.output, exist_ok=True)
    # columnar outputs (the primary artifacts)
    import pyarrow.parquet as pq

    pq.write_table(res.components, os.path.join(args.output, "components.parquet"))
    pq.write_table(res.doc_clusters, os.path.join(args.output, "doc_clusters.parquet"))
    res.pair_clusters.write_parquet(os.path.join(args.output, "pair_clusters"))

    if not args.skip_api:
        metadata = {}
        if args.metadata:
            with open(args.metadata) as f:
                raw = json.load(f)
            # accept either doc-id or clip-id keyed metadata
            for k, v in raw.items():
                try:
                    metadata[int(k)] = v
                except ValueError:
                    from intertext_ray.sources.clips import doc_ids_for_clip_ids

                    metadata[int(doc_ids_for_clip_ids(pa.array([k]))[0])] = v
        counts = word_counts_dict(docs) if args.compute_probabilities else None
        formatted = format_clusters(
            res.store.load("pair_clusters")
            if res.store.is_complete("pair_clusters")
            else res.pair_clusters,
            docs,
            cfg,
            metadata=metadata,
            counts=counts,
        )
        write_api_outputs(
            os.path.join(args.output, "api"), formatted, docs, cfg, metadata
        )

    n_matches = res.matches.count()
    n_clusters = len(set(res.doc_clusters["dup_cluster_id"].to_pylist()))
    # lineage/metrics tables (north_rule): per-stage and per-partition
    # rollups of the checkpoint manifests, written next to the outputs
    import pyarrow.parquet as _pq

    from intertext_ray.state.report import partition_report, stage_report

    rep_dir = os.path.join(args.output, "lineage")
    os.makedirs(rep_dir, exist_ok=True)
    _pq.write_table(stage_report(res.store), os.path.join(rep_dir, "stages.parquet"))
    _pq.write_table(
        partition_report(res.store), os.path.join(rep_dir, "partitions.parquet")
    )
    print(
        json.dumps(
            {
                "matches": n_matches,
                "doc_clusters": n_clusters,
                "output": args.output,
                "checkpoints": work_dir,
                "lineage": rep_dir,
                "manifests": {
                    k: v["rows"] for k, v in res.store.all_manifests().items()
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
