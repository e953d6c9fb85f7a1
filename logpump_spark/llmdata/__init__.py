"""LLM-training-data pipeline operators (north star, BASELINE.json).

Absent from the reference (a log pump); required here because a 100 TB
data engine's dominant workload is corpus preparation:

- ``dedup``      — exact, MinHash+LSH, SimHash, n-gram Jaccard
- ``similarity`` — brute-force cosine top-k, IVF-bucketed ANN
- ``text``       — language-ID heuristic, quality stats, BPE-ish token
                   counts, fingerprinting
- ``multimodal`` — opaque binary payload columns with typed metadata;
                   decode stubs behind mapInPandas plumbing

Design rule: everything is DataFrame ops that shuffle-scale — candidate
generation by bucketing (LSH bands / coarse quantizer cells), never
all-pairs; no driver-side loops; Pandas UDFs only where per-payload
Python is unavoidable (multimodal decode).
"""
