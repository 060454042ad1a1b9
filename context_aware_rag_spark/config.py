"""Pipeline configuration.

Defaults mirror the reference's performance-defining knobs (BASELINE.md):
batch_size=1 (globals.py:16), chunk_size/overlap 500/10
(graph_ingestion.py:68-69), duplicate merge threshold cosine > 0.9
(constants.py:43), KNN similar-edge threshold 0.8 / top-6
(neo4j_db.py:633-641), dedup OFF by default (graph_ingestion.py:65-66).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional


@dataclass(frozen=True)
class PipelineConfig:
    # chunking
    batch_size: int = 1                 # turns per ingestion batch (doc_i // batch_size)
    chunk_size: int = 500
    chunk_overlap: int = 10
    timestamp_prefix: bool = False      # reference prefixes only file/rtsp docs
    # "chars" = the reference's character-count splitter (parity
    # default); "topic" = TextTiling topic segments as chunks (engine
    # extension — content-aware boundaries, same chunk-id rule)
    chunking: str = "chars"
    texttiling_block_turns: int = 3
    texttiling_depth_window: int = 2
    texttiling_cutoff_ppm: int = 500_000
    # extraction
    extractor: str = "rule_based"       # "rule_based" | "null" (bypass, chunks only)
    allowed_nodes: List[str] = field(
        default_factory=lambda: ["Person", "Vehicle", "Location", "Object"]
    )
    # the reference only honors allowed_nodes when entity descriptions are
    # enabled (base.py:74-80 clears the list otherwise); default off = parity
    enforce_allowed_nodes: bool = False
    # embeddings
    embedding_dim: int = 64
    # entity linking / similarity
    similar_edges: bool = False         # emit chunk-KNN SIMILAR edges (EP2 step f)
    knn_min_score: float = 0.8          # SIMILAR edge threshold (neo4j_db.py:633-641)
    knn_top_k: int = 6
    # skip sources whose SIMILAR degree already reached this cap
    # (neo4j_db.py:633-641 count{(c)-[:SIMILAR]-()} < 5); None disables
    knn_max_degree: Optional[int] = 5
    duplicate_score: float = 0.9        # canonicalization threshold (constants.py:43)
    # canonicalization default OFF to match reference defaults
    deduplicate_nodes: bool = False
    # candidate-pair blocking for canonicalization: "auto" (default)
    # counts distinct surface forms and escalates from the exact
    # blocked GEMM to LSH banding at canonicalize.AUTO_LSH_THRESHOLD
    # (~1e5, the measured crossover — PLANS.md §7), so the quadratic
    # plan cannot survive a 100x scale-up by omission. "type" forces
    # exact GEMM (oracle-parity runs); "lsh" forces sign-random-
    # projection banding — near-linear, the 100 TB path. Canonicalize
    # bands are FINE (8 bands x 16 bits): alias pairs sit at cosine
    # >= 0.98 (per-bit agreement >= 0.982) so recall stays ~0.99998
    # while random vectors spread over 2^16 buckets per band, keeping
    # bucket fan-out ~group-sized. The knn banding (lsh_bands x
    # lsh_bits_per_band below) targets the LOWER 0.8 score floor, so it
    # uses shorter bands and many more of them.
    canonicalize_blocking: str = "auto"
    canon_lsh_bands: int = 8
    canon_lsh_bits: int = 16
    gemm_blocks: int = 8                # triangle-join blocks for exact GEMM
    # enrich nodes with source_tools (camera-list merge analog,
    # neo4j_db.py:1674 camera_id:"combine"); off by default = parity
    # with single-camera reference deployments
    node_source_tools: bool = False
    # scale knobs
    shuffle_partitions: Optional[int] = None   # None = leave session setting
    salted_linking: bool = False        # two-phase prefix-sum for huge convs
    salt_block_turns: int = 8192        # turns per salt block when salted
    lsh_bands: int = 32                 # knn banding: 32 bands x 12 bits
    # keeps recall ~0.88 at the 0.8 score floor (matching the old 4x4)
    # while cutting candidate volume 32x (n^2 x bands / 2^bits) —
    # measured 85 s -> 17.5 s on 12.4k chunks, identical edge set
    lsh_bits_per_band: int = 12
