"""intertext_ray — a Ray-Data-native near-duplicate detection + clustering engine.

A from-scratch reimplementation of the query/data-processing capabilities of
YaleDHLab/intertext (reference at /root/reference, snapshot 2024-10-08),
re-expressed as idiomatic ``ray.data.Dataset`` pipelines over zero-copy Arrow
batches: word-window shingling, vectorized MinHash in actor pools, overlapping
LSH band hashing, candidate generation through band-key groupby shuffles,
difflib verification, and union-find clustering of duplicate pairs — over
tables of audio-clip + transcript rows.

See SURVEY.md for the operator-by-operator mapping to the reference.
"""

from intertext_ray.config import IntertextConfig

__all__ = ["IntertextConfig"]
__version__ = "0.1.0"
