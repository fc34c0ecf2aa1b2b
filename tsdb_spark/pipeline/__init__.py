"""Large-scale training-data pipeline operators.

The second half of the engine (beyond the prometheus/tsdb surface): the
operations a 100TB training-data pipeline runs over document/embedding
corpora — deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard),
similarity search over embeddings (brute-force + LSH-bucketed ANN), text
analysis (tokenization, stats, language-ID, quality, fingerprinting) and
multimodal binary-column plumbing (image decode/resize, video frame
sampling, audio PCM features), corpus selection (deterministic
stratified sampling, benchmark decontamination) and keyword extraction.

Design rules (same as the tsdb core):
- native `pyspark.sql.functions` expressions only on the hot paths —
  higher-order array functions (transform/aggregate/zip_with) keep
  MinHash/SimHash/cosine inside whole-stage codegen, no Python UDFs;
- candidate generation is always banded/bucketed (groupBy on a band or
  bucket key), never an all-pairs cross join;
- the only pandas path is multimodal payload decoding (mapInPandas over
  Arrow batches), where per-element binary decoding is genuinely outside
  relational algebra.
"""

from tsdb_spark.pipeline.common import hash64
from tsdb_spark.pipeline.text import (
    tokens_expr,
    wordpieces_expr,
    text_stats,
    language_id,
    winnow_fingerprints,
    doc_keywords,
)
from tsdb_spark.pipeline.sampling import stratified_sample, decontaminate
from tsdb_spark.pipeline.multimodal import audio_features
from tsdb_spark.pipeline.vecindex import IvfIndex
from tsdb_spark.pipeline.dedup import (
    exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    jaccard_pairs,
    jaccard_pairs_for_docs,
    simhash_expr,
)
from tsdb_spark.pipeline.embed import cosine_expr, cosine_topk, ann_lsh_topk

__all__ = [
    "hash64",
    "tokens_expr",
    "wordpieces_expr",
    "text_stats",
    "language_id",
    "winnow_fingerprints",
    "exact_dedup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "jaccard_pairs",
    "jaccard_pairs_for_docs",
    "simhash_expr",
    "cosine_expr",
    "cosine_topk",
    "ann_lsh_topk",
    "doc_keywords",
    "stratified_sample",
    "decontaminate",
    "audio_features",
    "IvfIndex",
]
