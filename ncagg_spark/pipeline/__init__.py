from ncagg_spark.pipeline.dedup import (
    exact_dedup,
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard,
    simhash_near_duplicates,
    simhash_signatures,
)
from ncagg_spark.pipeline.similarity import (
    brute_force_topk,
    brute_force_topk_relational,
    ivf_topk,
    srp_lsh_topk,
)
from ncagg_spark.pipeline.text import (
    detect_language,
    fingerprint,
    quality_score,
    token_count,
    tokenize,
    word_ngrams,
)

__all__ = [
    "exact_dedup",
    "exact_duplicates",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "ngram_jaccard",
    "simhash_near_duplicates",
    "simhash_signatures",
    "brute_force_topk",
    "brute_force_topk_relational",
    "ivf_topk",
    "srp_lsh_topk",
    "detect_language",
    "fingerprint",
    "quality_score",
    "token_count",
    "tokenize",
    "word_ngrams",
]
