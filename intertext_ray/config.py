"""Pinned configuration for the dedup engine.

Semantic knobs mirror the reference CLI flag set
(``/root/reference/intertext/intertext.py:47-79``); shingle / signature /
band values MUST be value-identical to the reference defaults for recall
parity (chargram 4, window 14/4, 256-value mirrored signature, bands of
width 4 stride 3).  Ray-side knobs (batch sizes, actor-pool sizes,
checkpoint root) are ours.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass


@dataclass(frozen=True)
class IntertextConfig:
    # --- shingling (reference intertext.py:60-62) ---
    chargram_length: int = 4
    window_length: int = 14
    slide_length: int = 4

    # --- signature (reference intertext.py:104: VectorizedMinHash(256, mirror=True)) ---
    n_perm: int = 256          # total signature values (half real perms + mirror)
    mirror: bool = True
    hash_seed: int = 0x1737E6  # pins the whole permutation family (ours; the
                               # reference's constants live in an unvendored pkg)

    # --- LSH bands (reference intertext.py:63-64) ---
    hashband_length: int = 4
    hashband_step: int = 3

    # --- verification (reference intertext.py:66, 495-509) ---
    min_sim: int = 50
    # junk filter: drop windows with >= 0.75*window_length single-char words
    # (reference intertext.py:497-501)
    junk_single_char_frac: float = 0.75

    # --- graph / formatting (reference intertext.py:67-78) ---
    banish_distance: int = 4
    max_file_sim: float | None = None  # intended semantics of A7 (the
                                       # reference's own path crashes, Q6)
    min_words_quirk: bool = False      # model reference chunking quirks Q1/Q2
                                       # in the oracle only

    # --- text handling ---
    strip_diacritics: bool = False
    encoding: str = "utf-8"
    # focal-doc filter (reference --only, intertext.py:439-445): keep only
    # candidates touching this doc id
    only_doc_id: int | None = None
    # XML front-end knobs (reference S3/N10, intertext.py:1166-1177,
    # 1192-1237); when xml_page_tag is set, build per-doc window->page maps
    # at ingestion (functions.text.window_page_map) and pass them to the
    # export formatter for $PAGE_ID url substitution (N9)
    xml_base_tag: str | None = None
    xml_remove_tags: tuple[str, ...] = ()
    xml_page_tag: str | None = None
    xml_page_attr: str | None = None

    # --- Ray execution knobs (ours) ---
    minhash_batch_size: int = 4096     # windows per minhash batch
    minhash_concurrency: int = 8       # minhash stage parallelism hint (pre-split factor)
    band_docs_cap: int = 2000          # hot-band cap: skip bands whose
                                       # (doc,window) ROW count exceeds this
                                       # (logged as dropped mass; mirrored by
                                       # the single-process oracle for parity)
    pair_emit_chunk: int = 1 << 20     # max pairs emitted per map_groups chunk
    join_strategy: str = "hash"        # "hash" (ds.join) | "broadcast"
    num_shuffle_partitions: int = 0    # 0 = let Ray pick
    checkpoint_root: str | None = None # per-stage parquet checkpoints + manifests
    # run_dedup(components='auto') switches from driver union-find to the
    # distributed label-propagation backend above this many verified pairs
    components_driver_max_pairs: int = 20_000_000

    @property
    def n_half(self) -> int:
        return self.n_perm // 2 if self.mirror else self.n_perm

    @property
    def n_bands(self) -> int:
        # overlapping bands: positions 0, step, 2*step, ... over n_perm values
        return (self.n_perm - self.hashband_length) // self.hashband_step + 1

    def windows_per_doc(self, n_words: int) -> int:
        if n_words < self.window_length:
            return 0
        return (n_words - self.window_length) // self.slide_length + 1

    def semantic_hash(self) -> str:
        """Hash of the semantics-bearing knobs — keys checkpoints/manifests."""
        d = asdict(self)
        for k in (
            "minhash_batch_size",
            "minhash_concurrency",
            "pair_emit_chunk",
            "join_strategy",
            "num_shuffle_partitions",
            "checkpoint_root",
            "components_driver_max_pairs",
        ):
            d.pop(k)
        return hashlib.sha256(json.dumps(d, sort_keys=True).encode()).hexdigest()[:16]


DEFAULT_CONFIG = IntertextConfig()
